#!/usr/bin/env python
"""Convert a 27-tap FCGF checkpoint to a sparse-support (19/7-tap) one.

The conv is followed by masked BatchNorm everywhere, so dropping taps
changes each layer's function but not its scale class — a short
fine-tune recovers the statistics. This keeps the round-3 v7 training
investment instead of retraining sparse-support models from scratch.

Usage:
  python scripts/slice_taps.py --src runs/synth_v7_presync \
      --dst runs/synth_v8_19 --taps 19
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--taps", type=int, default=19, choices=(7, 19))
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platform_name", "cpu")
    import jax.numpy as jnp

    from mvreg.config.schema import override, resolve_config, save_yaml
    from mvreg.ops.voxel import sparse_offset_indices
    from mvreg.train.checkpoints import CheckpointManager
    from mvreg.train.state import create_train_state

    cfg_src = resolve_config(None, args.src, [])
    assert tuple(cfg_src.model.kernel_taps) == (27, 27, 27, 27), (
        "source must be a full-3³ checkpoint"
    )
    state = create_train_state(jax.random.PRNGKey(0), cfg_src)
    state = CheckpointManager(args.src).restore(state)
    print(f"restored {args.src} at step {int(state.step)}")

    cfg_dst = override(
        cfg_src, **{"model.kernel_taps": (args.taps,) * 4}
    )
    fresh = create_train_state(jax.random.PRNGKey(0), cfg_dst)

    idx = jnp.asarray(sparse_offset_indices(args.taps))
    sliced = [0]

    def slice_leaf(p):
        if hasattr(p, "ndim") and p.ndim == 3 and p.shape[0] == 27:
            sliced[0] += 1
            return p[idx]
        return p

    new_fcgf = jax.tree_util.tree_map(slice_leaf, state.params["fcgf"])
    print(f"sliced {sliced[0]} conv kernels 27 -> {args.taps}")
    new_params = dict(state.params)
    new_params["fcgf"] = new_fcgf
    # shape check against a freshly-initialized tree
    jax.tree_util.tree_map(
        lambda a, b: None if a.shape == b.shape else (_ for _ in ()).throw(
            ValueError(f"shape mismatch {a.shape} vs {b.shape}")
        ),
        new_params, fresh.params,
    )
    new_state = fresh._replace(
        step=state.step,
        params=new_params,
        batch_stats=state.batch_stats,  # per-channel; tap-independent
    )
    os.makedirs(args.dst, exist_ok=True)
    CheckpointManager(args.dst).save(new_state)
    save_yaml(cfg_dst, os.path.join(args.dst, "config.yaml"))
    print(f"wrote {args.dst} (kernel_taps={cfg_dst.model.kernel_taps})")


if __name__ == "__main__":
    main()
