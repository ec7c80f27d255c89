"""Multi-process DCN orchestration (parallel/distributed.py).

Validates the real `jax.distributed` path that the reference lacks
entirely (SURVEY §2.5): two OS processes, each with 4 virtual CPU
devices, form one 8-device runtime; a (dp=2, tp=4) mesh puts tp within
each process (the ICI analogue) and dp across processes (DCN).

The worker runs in subprocesses because jax.distributed can only be
initialized once per process.
"""
import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, %(repo)r)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from aimet_tpu.parallel import distributed as D

    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    D.initialize(coordinator_address="127.0.0.1:" + port,
                 num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc

    mesh = D.multihost_mesh()          # defaults: tp=local(4), dp=nproc
    assert mesh.shape == {"dp": nproc, "tp": 4}, mesh.shape
    # tp rows must be process-local (the ICI axis)
    devs = np.array(mesh.devices)
    for row in devs:                   # rows index dp -> one process each
        assert len({d.process_index for d in row}) == 1

    # dp-sharded global batch assembled from per-process local data
    local = np.full((2, 3), float(pid), np.float32)
    g = D.global_batch_from_local(mesh, local)
    assert g.shape == (2 * nproc, 3)

    # cross-DCN reduction through jit (GSPMD inserts the collective)
    s = jax.jit(lambda x: x.sum(),
                out_shardings=NamedSharding(mesh, P()))(g)
    expect = 6.0 * sum(range(nproc))
    np.testing.assert_allclose(D.all_gather_to_host(s), expect)

    # distributed calibration-stat merge: every process ends identical
    from aimet_tpu.quantization.encoding_analyzer import MinMaxState
    obs = {"act": MinMaxState(min=jax.numpy.asarray(-1.0 - pid),
                              max=jax.numpy.asarray(2.0 + pid),
                              updated=jax.numpy.asarray(True))}
    merged = D.merge_calibration_stats(obs)
    assert float(merged["act"].min) == -float(nproc), merged
    assert float(merged["act"].max) == 1.0 + nproc
    print("WORKER_OK", pid)
""")


def test_two_process_dcn_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": repo})
    import socket
    with socket.socket() as sk:
        sk.bind(("127.0.0.1", 0))
        port = str(sk.getsockname()[1])
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()   # exact PIDs we spawned
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out
