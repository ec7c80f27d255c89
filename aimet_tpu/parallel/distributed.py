"""Multi-process (multi-host) orchestration over ICI + DCN.

The reference has no distributed runtime at all (SURVEY §2.5 — DDP/DeepSpeed
appear only in examples); this is the TPU-native layer that replaces it:
`jax.distributed` is the single comm substrate, and meshes are laid out so
**tp rides ICI** (within a slice/host, where per-decode-step all-reduces are
cheap) and **dp rides DCN** (across hosts, where only batch scatter and
calibration-stat reduction cross the wire).

All functions are single-controller-style SPMD: every process runs the same
program; arrays are assembled from per-process shards with
``jax.make_array_from_process_local_data``.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Bring up the jax.distributed runtime (idempotent).

    On Cloud TPU all arguments auto-detect from the metadata server; for
    manual launches (or the CPU-based multi-process tests) pass them or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    # do NOT touch jax.devices()/process_count() here — that would
    # initialize the XLA backend and make distributed init impossible
    if (getattr(initialize, "_done", False)
            or jax._src.distributed.global_state.client is not None):
        return
    kwargs = {}
    ca = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if ca:
        kwargs["coordinator_address"] = ca
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as err:
        # swallow ONLY the two "this is a single-process context" signals
        # (no coordinator anywhere / backend already up in library use);
        # real multi-host init failures on a pod must surface, or hosts
        # would silently fork into independent single-process jobs
        msg = str(err)
        benign = ("coordinator_address should be defined" in msg
                  or "must be called before" in msg)
        if ca or not benign:
            raise
        return
    initialize._done = True


def multihost_mesh(tp: Optional[int] = None,
                   dp: Optional[int] = None) -> Mesh:
    """(dp, tp) mesh with tp contiguous within each process.

    Device order from ``jax.devices()`` groups each process's local devices
    together, so making tp the fastest-varying axis keeps every tp ring on
    ICI; the dp axis then crosses processes (DCN) only. Defaults:
    tp = local device count (whole-host tensor parallel), dp = #processes.
    """
    devs = jax.devices()
    n = len(devs)
    tp = tp or max(1, jax.local_device_count())
    if n % tp:
        raise ValueError(f"tp={tp} does not divide device count {n}")
    dp = dp or n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp={dp*tp} != {n} devices")
    if jax.process_count() > 1 and tp == jax.local_device_count():
        # topology-aware layout: mesh_utils knows the ICI wiring (twisted
        # tori, multi-slice), the raw jax.devices() order may not
        try:
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_hybrid_device_mesh(
                (1, tp), (dp, 1), devices=devs)
            return Mesh(arr, ("dp", "tp"))
        except Exception:
            pass    # CPU multiprocess test runtimes lack topology info
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def global_batch_from_local(mesh: Mesh, local_batch: np.ndarray,
                            batch_axis: str = "dp") -> jax.Array:
    """Assemble a dp-sharded global array from each process's local batch
    (the serving front-end: each host feeds its own requests)."""
    spec = P(batch_axis, *([None] * (local_batch.ndim - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local_batch)


def all_gather_to_host(x: jax.Array) -> np.ndarray:
    """Fetch a (possibly cross-process sharded) array fully to every host —
    for returning generated tokens to the serving front-end."""
    from jax.experimental import multihost_utils
    if jax.process_count() == 1:
        return np.asarray(x)
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def merge_calibration_stats(obs_tree):
    """Merge per-process observer states so every host computes identical
    encodings: gather each process's stats over DCN, then reuse
    parallel/sharded_calibration.merge_observer_states (min-of-mins,
    max-of-maxes, count-weighted histogram means)."""
    from jax.experimental import multihost_utils
    if jax.process_count() == 1:
        return obs_tree
    # gather every process's stats, then merge with the existing
    # single-process logic host-side
    from . import sharded_calibration as sc
    gathered = multihost_utils.process_allgather(obs_tree)
    n = jax.process_count()
    per_proc = [jax.tree_util.tree_map(lambda l, i=i: l[i], gathered)
                for i in range(n)]
    return sc.merge_observer_states(per_proc)
