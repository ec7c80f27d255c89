from .int_matmul import (
    matmul_w4,
    matmul_w4_xla,
    matmul_w8,
    matmul_w8_xla,
    matmul_w8a8,
    matmul_w8a8_xla,
    quantize_activation_per_row,
    quantize_weight_int4,
    quantize_weight_per_channel,
    unpack_int4,
)
from .kv_cache import (
    QuantizedKVCache,
    append_kv,
    dequantize_kv,
    init_quantized_kv_cache,
    prefill_kv,
)
from .requant import get_scale_factor, requant_scale_and_bias, requantize
from .int_matmul import matmul_w4_grouped, matmul_w4_grouped_xla, quantize_weight_int4_grouped
from .int_conv import (
    conv2d_w4,
    conv2d_w8,
    conv2d_w8a8,
    quantize_conv_weight_int4,
    quantize_conv_weight_per_channel,
)
