"""True multi-process distributed sync (driver config 4; SURVEY.md §4.3).

Spawns 2 separate Python processes, each with 4 CPU devices, connected by
jax.distributed over localhost — the same code path a TPU pod would run
over ICI/DCN — and checks the synchronized poses against GT and against
the single-process result.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sync(tmp_path):
    out = str(tmp_path / "result.npz")
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never claim the TPU relay
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(pid), "2", str(port), out],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        o, _ = p.communicate(timeout=600)
        outputs.append(o)
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, o[-3000:]

    data = np.load(out)
    R, t, R_gt, t_gt = data["R"], data["t"], data["R_gt"], data["t_gt"]

    # gauge-invariant accuracy vs GT (exact graph -> near-exact recovery)
    import jax.numpy as jnp

    from mvreg.core import transforms as tf
    from mvreg.core.metrics import rotation_error_deg, translation_error

    N = R.shape[0]
    pairs = np.array(
        [(i, j) for i in range(N) for j in range(i + 1, N)], np.int32
    )
    i, j = pairs[:, 0], pairs[:, 1]
    Re, te = tf.relative(
        jnp.asarray(R)[i], jnp.asarray(t)[i],
        jnp.asarray(R)[j], jnp.asarray(t)[j],
    )
    Rg, tg = tf.relative(
        jnp.asarray(R_gt)[i], jnp.asarray(t_gt)[i],
        jnp.asarray(R_gt)[j], jnp.asarray(t_gt)[j],
    )
    assert float(np.max(np.asarray(rotation_error_deg(Re, Rg)))) < 0.1
    assert float(np.max(np.asarray(translation_error(te, tg)))) < 1e-3


@pytest.mark.slow
def test_distributed_multiview_benchmark_cli(tmp_path):
    """The config-4 benchmark CLI: 2 processes, edge-sharded full pipeline."""
    import json

    out = str(tmp_path / "mv.json")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, os.path.join(REPO, "scripts",
                                     "benchmark_multiview_dist.py"),
        "--processes", "2", "--fragments", "5", "--points", "1024",
        "--json-out", out,
        "--set", "voxel.capacities=(512,256,128,64)",
        "--set", "voxel.voxel_size=0.08",
        "--set", "model.channels=(4,8,8,16)",
        "--set", "model.descriptor_dim=8",
        "--set", "match.num_corr=128",
        "--set", "filter.channels=16", "--set", "filter.num_clusters=8",
        "--set", "filter.blocks_before=1",
        "--set", "filter.blocks_cluster=1",
        "--set", "filter.blocks_after=1",
    ]
    p = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                       text=True, timeout=900)
    assert p.returncode == 0, (p.stdout + p.stderr)[-3000:]
    with open(out) as fh:
        rep = json.load(fh)
    assert rep["processes"] == 2 and rep["devices"] == 8
    assert "rot_ecdf" in rep and "3.0" in rep["rot_ecdf"]
