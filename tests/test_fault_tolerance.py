"""Failure detection / elastic recovery (SURVEY.md §5.3).

The reference's crash story is "lose everything since the last
torch.save". Here: orbax checkpoints every K steps; this test kills a
training process mid-run (SIGKILL, as a preemption would) and asserts the
restarted process resumes from the last checkpoint and finishes.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_ARGS = [
    "--stage", "descriptor", "--points", "384", "--pool-pairs", "4",
    "--log-every", "1",
    "--set", "voxel.capacities=(256,128,64,32)",
    "--set", "voxel.voxel_size=0.08",
    "--set", "model.channels=(4,8,8,16)",
    "--set", "model.descriptor_dim=8",
    "--set", "match.num_corr=64",
    "--set", "filter.channels=16",
    "--set", "filter.num_clusters=8",
    "--set", "filter.blocks_before=1",
    "--set", "filter.blocks_cluster=1",
    "--set", "filter.blocks_after=1",
    "--set", "train.batch_pairs=2",
    "--set", "train.checkpoint_every=2",
]


def _child_env():
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never claim the TPU relay
    # Do NOT inherit the suite's 8-virtual-device XLA_FLAGS (conftest):
    # on a 2-core box, 8 virtual CPU devices multiply the child's compile
    # and dispatch cost for nothing — the round-1 flake of this test.
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    return env


def _run(ckpt_dir, steps, resume=False, kill_after=None):
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "train.py"),
        "--steps", str(steps), "--ckpt-dir", str(ckpt_dir), *TINY_ARGS,
    ]
    if resume:
        cmd.append("--resume")
    out_path = os.path.join(str(ckpt_dir) + "_child.log")
    out_fh = open(out_path, "wb")
    proc = subprocess.Popen(
        cmd, env=_child_env(), cwd=REPO,
        stdout=out_fh, stderr=subprocess.STDOUT,
    )
    if kill_after is None:
        proc.wait(timeout=900)
        out_fh.close()
        with open(out_path, errors="replace") as fh:
            return proc.returncode, fh.read()
    # Wait until at least one checkpoint exists, then SIGKILL (preemption).
    # Progress-keyed deadline: as long as the child accumulates CPU time
    # (compiling or stepping), keep waiting; only 300 s of a fully idle
    # child (or 1800 s total) fails the test.

    def _cpu_jiffies():
        try:
            with open(f"/proc/{proc.pid}/stat") as fh:
                f = fh.read().rsplit(")", 1)[1].split()
            return int(f[11]) + int(f[12])  # utime + stime
        except OSError:
            return -1

    hard_deadline = time.time() + 1800
    last_progress = time.time()
    last_cpu = _cpu_jiffies()
    while time.time() < hard_deadline:
        cpu = _cpu_jiffies()
        if cpu != last_cpu:
            last_cpu = cpu
            last_progress = time.time()
        steps_done = [
            d for d in (os.listdir(ckpt_dir) if os.path.isdir(ckpt_dir) else [])
            if d.isdigit()
        ]
        if steps_done and int(max(steps_done, key=int)) >= kill_after:
            break
        if proc.poll() is not None:
            raise AssertionError("process exited early before checkpoint")
        if time.time() - last_progress > 300:
            proc.kill()
            raise AssertionError("no training progress for 300 s")
        time.sleep(1.0)
    else:
        proc.kill()
        raise AssertionError("no checkpoint appeared before hard deadline")
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait(timeout=60)
    out_fh.close()
    return -9, ""


@pytest.mark.slow
def test_kill_and_resume(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    rc, _ = _run(ckpt, steps=4, kill_after=2)
    assert rc == -9
    saved = sorted(int(d) for d in os.listdir(ckpt) if d.isdigit())
    assert saved and saved[-1] >= 2

    rc, out = _run(ckpt, steps=6, resume=True)
    assert rc == 0, out[-2000:]
    assert "resumed from step" in out
    saved = sorted(int(d) for d in os.listdir(ckpt) if d.isdigit())
    assert saved[-1] == 6, saved
