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
