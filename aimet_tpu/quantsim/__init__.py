from .config import QuantSimConfig, OpTypeConfig
from .qsim import QuantizationSimModel, QuantizerSpec
