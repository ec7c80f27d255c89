"""Quick session-clock pin: the fixed bf16 XLA matmul from bench.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench

pin, frac = bench.measure_session_clock(retries=0)
print(f"pin {pin:.1f} TF/s = {frac:.3f} of best-known {bench.PIN_BEST_TFLOPS}")
