from .cache import Cache
from .layer_output import LayerOutputUtil
from .logger import AimetLogger, profile
from .pytree import get_leaf, leaf_index_map, set_leaves
from .weight_padding import WeightPaddingParams, weight_pad
