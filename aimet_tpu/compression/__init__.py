from .compressor import CompressedModel, CompressionStats, ModelCompressor
from .cost import Cost, layer_cost, model_cost, rank_for_comp_ratio
from .greedy import GreedyCompRatioSelect, GreedySelectionParameters, monotonic_fit
from .svd import spatial_svd_factor, weight_svd_factor_conv, weight_svd_factor_linear
from .channel_pruning import select_channels_to_keep
from .winnow import winnow_model, propagate_channel_mask
