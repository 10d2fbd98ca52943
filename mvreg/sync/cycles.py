"""Triplet cycle-consistency scoring of pairwise pose estimates.

Round-4 recall lever (VERDICT r3 item 4): the periodic-alias failure
mode produces lattice-slid pairwise poses that are individually
plausible — they score HIGH on cloud overlap by construction (the
repeated structure genuinely aligns) and saturate the learned
confidence, so neither existing gate rejects them. What aliasing
cannot fake is *composition*: around a fragment triplet (i, j, k) the
cycle T_ik⁻¹ ∘ T_jk ∘ T_ij of correct poses is the identity, while a
lattice-slid edge leaves a residual of one lattice period (~0.5-1 m)
against every consistent triplet through it.

Score: per edge, the reliability-weighted fraction of its triplets
whose cycle closes within (tau_rot, tau_trans); triplet reliability is
the min of the other two edges' current weights, so junk edges don't
vote. Edges with no reliable triplet evidence stay NEUTRAL (score 1) —
spanning-tree edges of sparse graphs must not be punished for
loneliness. All static-shaped: triplet/edge index tables are
compile-time constants (C(N,3) = 4060 at the 30-fragment eval scale;
three row gathers + one segment-sum on device).

No reference counterpart — the reference's sync trusts its confidence
net (SURVEY.md C7); this is an extra robustness stage for structured
outliers.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.cache
def _triplet_tables(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(T, 3) edge indices per triplet + (T, 3) sign info.

    Edge order per triplet (i<j<k): [e_ij, e_jk, e_ik] in the all-pairs
    upper-triangle edge layout of pipeline.all_pairs.
    """
    eid = {}
    c = 0
    for i in range(n):
        for j in range(i + 1, n):
            eid[(i, j)] = c
            c += 1
    rows = []
    for i in range(n):
        for j in range(i + 1, n):
            for k in range(j + 1, n):
                rows.append((eid[(i, j)], eid[(j, k)], eid[(i, k)]))
    return np.asarray(rows, np.int32), np.asarray([], np.int32)


def cycle_consistency_scores(
    R: Array,
    t: Array,
    weights: Array,
    n_nodes: int,
    tau_rot_deg: float = 10.0,
    tau_trans: float = 0.25,
    min_evidence: float = 0.3,
    num_iters: int = 2,
) -> Array:
    """Per-edge cycle-consistency score in [0, 1] (neutral 1.0).

    R (E, 3, 3), t (E, 3): pairwise T_ij estimates on the all-pairs
    upper-triangle edge list; weights (E,): current edge reliabilities
    (confidence x overlap gate). Returns (E,) scores.

    `num_iters` IRLS-style passes: each pass re-scores with triplet
    reliabilities taken from the previous pass's (weight x score), so
    identified alias edges lose their vote against honest edges.
    """
    trip, _ = _triplet_tables(int(n_nodes))
    e_ij, e_jk, e_ik = (
        jnp.asarray(trip[:, 0]),
        jnp.asarray(trip[:, 1]),
        jnp.asarray(trip[:, 2]),
    )
    R_ij, t_ij = R[e_ij], t[e_ij]
    R_jk, t_jk = R[e_jk], t[e_jk]
    R_ik, t_ik = R[e_ik], t[e_ik]

    # cycle transform: T_ik^-1 (T_jk (T_ij (x)))
    R_cyc = jnp.einsum("tba,tbc,tcd->tad", R_ik, R_jk, R_ij)
    t_cyc = jnp.einsum(
        "tba,tb->ta",
        R_ik,
        jnp.einsum("tab,tb->ta", R_jk, t_ij) + t_jk - t_ik,
    )
    cos = jnp.clip(
        (jnp.trace(R_cyc, axis1=-2, axis2=-1) - 1.0) * 0.5, -1.0, 1.0
    )
    rot_err = jnp.degrees(jnp.arccos(cos))
    trans_err = jnp.linalg.norm(t_cyc, axis=-1)
    # soft close-score: 1 well inside the gates, ->0 beyond them
    closed = jnp.exp(
        -((rot_err / tau_rot_deg) ** 2) - (trans_err / tau_trans) ** 2
    )

    E = R.shape[0]

    def one_pass(w):
        def accum(out_num, out_den, e_self, e_a, e_b):
            rel = jnp.minimum(w[e_a], w[e_b])
            num = jax.ops.segment_sum(
                rel * closed, e_self, num_segments=E
            )
            den = jax.ops.segment_sum(rel, e_self, num_segments=E)
            return out_num + num, out_den + den

        num = den = jnp.zeros((E,), jnp.float32)
        num, den = accum(num, den, e_ij, e_jk, e_ik)
        num, den = accum(num, den, e_jk, e_ij, e_ik)
        num, den = accum(num, den, e_ik, e_ij, e_jk)
        score = num / jnp.maximum(den, 1e-9)
        # neutral where there is no reliable triplet evidence
        return jnp.where(den >= min_evidence, score, 1.0)

    score = one_pass(weights)
    for _ in range(max(num_iters - 1, 0)):
        score = one_pass(weights * score)
    return score
