from .batcher import ContinuousBatcher, Request
from .quantized_llm import QuantizedLLM, quantize_transformer_weights, quantized_forward
from .multihost import ShardedQuantizedLLM, shard_kv_caches, shard_quantized_weights
