"""Pickle-based stage cache for resumable pipelines.

Port of aimet_common/cache.py:58-220 (``Cache.mark``): expensive pipeline
stages (calibration sweeps, AdaRound, eval sessions) are memoized to disk
keyed by a mark name + cache key, so an interrupted AutoQuant/AdaRound run
resumes instead of recomputing.  JAX arrays are converted to numpy for
serialization and restored on load.
"""
from __future__ import annotations

import functools
import os
import pickle
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util as jtu


def _to_serializable(obj):
    return jtu.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, obj)


def _to_device(obj):
    return jtu.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, obj)


class Cache:
    """Usage:
        cache = Cache()
        with cache.enable(dir, key):
            @cache.mark("calibration")
            def calibrate(...): ...
    or decorate once and control via enable()."""

    def __init__(self):
        self._dir: Optional[str] = None
        self._key: Optional[str] = None

    class _EnableCtx:
        def __init__(self, cache, directory, key):
            self.cache, self.dir, self.key = cache, directory, key

        def __enter__(self):
            os.makedirs(self.dir, exist_ok=True)
            self.cache._dir = self.dir
            self.cache._key = self.key
            return self.cache

        def __exit__(self, *exc):
            self.cache._dir = None
            self.cache._key = None

    def enable(self, directory: str, key: str):
        return self._EnableCtx(self, directory, key)

    def mark(self, name: str):
        def decorator(fn: Callable):
            @functools.wraps(fn)
            def wrapper(*args, **kwargs):
                if self._dir is None:
                    return fn(*args, **kwargs)
                path = os.path.join(self._dir, f"{self._key}.{name}.pkl")
                if os.path.exists(path):
                    with open(path, "rb") as f:
                        return _to_device(pickle.load(f))
                out = fn(*args, **kwargs)
                with open(path, "wb") as f:
                    pickle.dump(_to_serializable(out), f)
                return out
            return wrapper
        return decorator
