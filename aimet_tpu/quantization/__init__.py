from .affine import (
    AffineEncoding,
    compute_encoding_from_min_max,
    dequantize,
    gate_min_max,
    num_quant_steps,
    quantize,
    quantize_dequantize_encoding,
    quantize_to_int,
    reduce_min_max,
)
from .encoding_analyzer import (
    EncodingAnalyzer,
    HistogramState,
    MinMaxState,
    RescalingHistogramState,
)
from .grads import quantize_dequantize, round_ste
from .float_sim import (
    fake_cast_fp16,
    fake_cast_to_ieee_float,
    init_fp8_maxval_minmax,
    init_fp8_maxval_mse,
    quantize_to_fp8,
)
from .blockwise import (
    blockwise_encoding,
    blockwise_quantize_dequantize,
    grouped_block_quantize_dequantize,
    lpbq_compress_scales,
)
