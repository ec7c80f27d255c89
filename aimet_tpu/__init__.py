"""aimet_tpu — TPU-native model quantization & compression framework.

A from-scratch JAX/XLA/Pallas re-design of the AIMET capability set
(quantsim, PTQ algorithms, QAT, mixed precision, compression), built for
TPU: pure-functional transforms, jaxpr-level graph interception, pallas
kernels for true-quant execution, and jax.sharding for multi-chip scale.
"""

__version__ = "0.1.0"

from .quantization.affine import (
    AffineEncoding,
    compute_encoding_from_min_max,
    dequantize,
    quantize,
    quantize_dequantize_encoding,
    quantize_to_int,
)
from .quantization.encoding_analyzer import EncodingAnalyzer
from .quantization.grads import quantize_dequantize, round_ste
from .quantsim.config import QuantSimConfig
from .quantsim.qsim import QuantizationSimModel
from .graph.connected_graph import ConnectedGraph
from .quantsim.lowering import LoweredModel, lower_to_int
from .quantsim.legacy import MainQuantizer
from .quantsim.recurrent import RecurrentQuantizer, RecurrentQuantSpec


def __getattr__(name):
    # lazy: importing torch (interop only) at package load would be wasteful
    if name == "from_torch":
        from .interop import from_torch
        return from_torch
    raise AttributeError(f"module 'aimet_tpu' has no attribute {name!r}")
