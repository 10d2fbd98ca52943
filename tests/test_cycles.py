"""Cycle-consistency gate: alias edges drop, honest edges survive."""

import jax
import jax.numpy as jnp
import numpy as np

from mvreg.core.transforms import random_rigid, relative
from mvreg.pipeline import all_pairs
from mvreg.sync.cycles import cycle_consistency_scores


def _graph(n, seed=0):
    """Consistent pairwise poses from random absolute poses."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, n)
    Rs, ts = jax.vmap(random_rigid)(ks)
    e = np.asarray(all_pairs(n))
    R_e, t_e = jax.vmap(
        lambda i, j: relative(Rs[i], ts[i], Rs[j], ts[j])
    )(jnp.asarray(e[:, 0]), jnp.asarray(e[:, 1]))
    return e, R_e, t_e


def test_consistent_graph_scores_one():
    e, R_e, t_e = _graph(8)
    w = jnp.ones(len(e))
    s = cycle_consistency_scores(R_e, t_e, w, 8)
    assert float(jnp.min(s)) > 0.95


def test_alias_edge_drops_others_survive():
    n = 8
    e, R_e, t_e = _graph(n, seed=1)
    # lattice-slide two edges: correct rotation, translation off by a
    # "period" — the alias signature (high overlap, consistent locally)
    bad = [3, 11]
    t_e = t_e.at[jnp.asarray(bad)].add(jnp.asarray([0.7, 0.0, 0.0]))
    w = jnp.ones(len(e))
    s = np.asarray(
        jax.jit(cycle_consistency_scores, static_argnums=3)(
            R_e, t_e, w, n
        )
    )
    good = np.setdiff1d(np.arange(len(e)), bad)
    assert s[bad].max() < 0.3, s[bad]
    assert np.median(s[good]) > 0.85, np.median(s[good])


def test_no_evidence_is_neutral():
    # 3 nodes, one triplet; kill the reliability of two edges -> the
    # third must stay neutral instead of being condemned without a jury
    e, R_e, t_e = _graph(3, seed=2)
    t_e = t_e.at[0].add(jnp.asarray([1.0, 0.0, 0.0]))  # broken edge
    w = jnp.asarray([1.0, 0.01, 0.01])
    s = np.asarray(cycle_consistency_scores(R_e, t_e, w, 3))
    assert s[1] == 1.0 and s[2] == 1.0


def test_sync_with_cycle_gate_recovers_poisoned_graph():
    """End-to-end: IRLS sync with the gate beats sync without it on a
    graph where several alias edges share a consistent lattice shift
    (the failure that defeats per-edge gates)."""
    from mvreg.sync.irls import synchronize

    n = 8
    e, R_e, t_e = _graph(n, seed=3)
    # a clique of alias edges, all slid by the SAME period (collectively
    # consistent — exactly the hard scene_0 signature)
    bad = [0, 1, 2, 7, 13]
    t_bad = t_e.at[jnp.asarray(bad)].add(jnp.asarray([0.8, 0.0, 0.0]))
    w = jnp.ones(len(e))

    cyc = cycle_consistency_scores(R_e, t_bad, w, n)
    gated = w * cyc**2

    def max_node_err(weights):
        sync = synchronize(
            jnp.asarray(e), R_e, t_bad, weights, n_nodes=n, num_iters=4
        )
        # compare pairwise relative translations vs the clean ones on
        # GOOD edges (gauge-free metric)
        i, j = jnp.asarray(e[:, 0]), jnp.asarray(e[:, 1])
        R_s, t_s = jax.vmap(
            lambda a, b: relative(sync.R[a], sync.t[a], sync.R[b], sync.t[b])
        )(i, j)
        errs = jnp.linalg.norm(t_s - t_e, axis=-1)
        good = np.setdiff1d(np.arange(len(e)), bad)
        return float(jnp.max(errs[jnp.asarray(good)]))

    err_plain = max_node_err(w)
    err_gated = max_node_err(gated)
    assert err_gated < 0.05, (err_plain, err_gated)
    assert err_gated < err_plain
