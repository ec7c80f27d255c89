"""Interop: bring models from the reference's ecosystems into aimet_tpu.

``from_torch`` imports a torch ``nn.Module`` (fx-traced) as a pure JAX
``fn(params, *inputs)`` ready for :class:`QuantizationSimModel`; encodings
round-trip through the AIMET JSON formats (0.6.1 / 1.0.0) handled by
``quantsim.qsim``.
"""
from .torch_import import from_torch

__all__ = ["from_torch"]
