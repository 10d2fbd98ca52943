"""Static open-addressing voxel hash table, built with scatter rounds.

TPU-native alternative to binary search for the kernel-map neighbor
lookup (SURVEY.md C1/C2: MinkowskiEngine's GPU coordinate hash map).
XLA has no atomics, so insertion conflicts are resolved with a fixed
number of *scatter-min rounds*: in round r every still-unplaced key
scatters into slot h(key)+r (linear probing); winners are detected by
reading back. At load factor <= 0.5 almost all keys place within a few
rounds; correctness does not depend on that (unplaced keys are reported
and lookups for them simply miss — callers keep the searchsorted path as
the exact fallback; in practice placement is complete, see tests).

Lookup probes the same R slots with vectorized gathers — R (~8) gather
rounds instead of log2(V) (~13) for binary search, each perfectly
data-parallel. The table build is 3 scatters + 1 gather per round.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

EMPTY = jnp.iinfo(jnp.int32).max  # empty slot marker == voxel SENTINEL
DEFAULT_ROUNDS = 6


def _hash(key: Array, table_bits: int) -> Array:
    """Murmur-style int32 finalizer, masked to the table size."""
    h = key.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return (h & jnp.uint32((1 << table_bits) - 1)).astype(jnp.int32)


class HashTable(NamedTuple):
    keys: Array  # (T,) int32, EMPTY-padded
    vals: Array  # (T,) int32 payload (index of the key), garbage at EMPTY
    bits: int
    rounds: int

    @property
    def size(self) -> int:
        return self.keys.shape[0]


def table_bits_for(capacity: int, load: float = 0.125) -> int:
    bits = 1
    while (1 << bits) * load < capacity:
        bits += 1
    return bits


def build(
    keys: Array,
    mask: Array,
    rounds: int = DEFAULT_ROUNDS,
    bits: int | None = None,
) -> tuple[HashTable, Array]:
    """Insert keys[mask] (distinct) with payload = their index.

    Returns (table, placed_mask). Unplaced valid keys (rare) are reported
    in ~placed_mask so callers can fall back.
    """
    V = keys.shape[0]
    if bits is None:
        bits = table_bits_for(V)
    T = 1 << bits
    k = jnp.where(mask, keys, EMPTY)
    base = _hash(k, bits)
    idx = jnp.arange(V, dtype=jnp.int32)

    table_keys = jnp.full((T,), EMPTY, jnp.int32)
    table_vals = jnp.zeros((T,), jnp.int32)
    placed = ~mask.astype(bool)  # invalid keys count as done

    for r in range(rounds):
        slot = (base + r) & (T - 1)
        want = ~placed
        # Contend for empty slots: min over (key) at each slot; EMPTY for
        # non-contenders. A slot already holding a key keeps it (min with
        # the incumbent, which always wins because losers re-probe).
        bid = jnp.where(want, k, EMPTY)
        contested = jnp.full((T,), EMPTY, jnp.int32).at[slot].min(bid)
        # claim only previously-empty slots
        new_keys = jnp.where(table_keys == EMPTY, contested, table_keys)
        won = want & (new_keys[slot] == k)
        table_vals = table_vals.at[jnp.where(won, slot, T)].set(
            jnp.where(won, idx, 0), mode="drop"
        )
        table_keys = new_keys
        placed = placed | won | (table_keys[slot] == k)

    table = HashTable(keys=table_keys, vals=table_vals, bits=bits,
                      rounds=rounds)
    return table, placed


def lookup(table: HashTable, queries: Array) -> Array:
    """Index payload of each query key, or -1 if absent/unplaced."""
    T = table.size
    base = _hash(queries, table.bits)
    found = jnp.full(queries.shape, -1, jnp.int32)
    done = queries == EMPTY
    for r in range(table.rounds):
        slot = (base + r) & (T - 1)
        tk = table.keys[slot]
        hit = ~done & (tk == queries)
        found = jnp.where(hit, table.vals[slot], found)
        # stop probing where we hit OR the chain ends (empty slot)
        done = done | hit | (tk == EMPTY)
    return found


def kernel_map_hashed(
    grid_keys: Array, grid_mask: Array, offsets: Array,
    rounds: int = DEFAULT_ROUNDS,
) -> Array:
    """Drop-in alternative to ops.voxel.kernel_map using the hash table."""
    from mvreg.ops.voxel import GRID_SIZE, SENTINEL, pack_coords, unpack_coords

    table, placed = build(grid_keys, grid_mask, rounds=rounds)
    coords = unpack_coords(grid_keys)
    ncoords = coords[None, :, :] + offsets[:, None, :]
    in_grid = jnp.all((ncoords >= 0) & (ncoords < GRID_SIZE), axis=-1)
    ok = in_grid & grid_mask[None, :]
    nkeys = jnp.where(
        ok, pack_coords(jnp.clip(ncoords, 0, GRID_SIZE - 1)), SENTINEL
    )
    return lookup(table, nkeys)
