from .cnn import TinyCNN, TinyMLP, ConvBnRelu, ResidualBlockNet, init_model
