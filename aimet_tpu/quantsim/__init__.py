from .config import QuantSimConfig, OpTypeConfig
from .qsim import QuantizationSimModel, QuantizerSpec
from .recurrent import RecurrentQuantizer, RecurrentQuantSpec, init_gru_params, init_lstm_params
from .backend_aware import ModelOpDefParser, SupportedKernel, apply_backend_constraints
from .lowering import LoweredModel, lower_to_int
