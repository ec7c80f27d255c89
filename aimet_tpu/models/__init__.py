from .cnn import TinyCNN, TinyMLP, ConvBnRelu, ResidualBlockNet, init_model
from .detection import SSDLite, decode_boxes, make_anchors
from .mobilenet_v2 import MobileNetV2
from .resnet import ResNet, ResNet18, ResNet34, ResNet50
from .transformer import Transformer, TransformerConfig, init_kv_caches
