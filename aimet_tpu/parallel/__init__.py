from .mesh import batch_sharding, make_mesh, replicated, shard_params, spec_for_path
from .sharded_calibration import calibrate_data_parallel, merge_observer_states
from .sharded_matmul import column_parallel_w8, row_parallel_w8, tp_quantized_mlp
from .distributed import (
    all_gather_to_host, global_batch_from_local, merge_calibration_stats,
    multihost_mesh)
