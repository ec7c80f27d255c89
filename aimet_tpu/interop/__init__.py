"""Interop: bring models from the reference's ecosystems into aimet_tpu.

``from_torch`` imports a torch ``nn.Module`` (fx-traced) as a pure JAX
``fn(params, *inputs)`` ready for :class:`QuantizationSimModel`; encodings
round-trip through the AIMET JSON formats (0.6.1 / 1.0.0) handled by
``quantsim.qsim``.
"""
from .torch_import import from_torch


def __getattr__(name):
    # encodings_io needs torch only at name-map build time; keep the
    # package import light (torch import is ~2s).
    if name in ("build_torch_name_map", "export_reference_encodings",
                "load_reference_encodings", "TorchNameMap"):
        from . import encodings_io
        return getattr(encodings_io, name)
    raise AttributeError(name)


__all__ = ["from_torch", "build_torch_name_map",
           "export_reference_encodings", "load_reference_encodings",
           "TorchNameMap"]
