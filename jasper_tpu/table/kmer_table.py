"""HBM-resident open-addressing k-mer count table (device side).

TPU-native replacement for the reference's lock-free CAS hash
(jellyfish large_hash_array.hpp / hash_counter.hpp): instead of per-thread
compare-and-swap probe chains, whole batches of keys are inserted with
vectorized gather/scatter rounds, and lookups are batched gathers.

Layout: one uint32 array ``tab[n_slots + 1, W + 1]``:
  * columns 0..W-1 : key words (word 0 = least significant),
  * column  W      : count; count == 0 marks an empty slot,
  * row n_slots    : scratch "dummy" row targeted by masked-out scatters.

Probing is linear from ``pos = mix32(key) & (n_slots - 1)``; n_slots is a
power of two. Duplicate keys inside one insert batch are legal: the claim
round lets exactly one contender fill an empty slot (scatter-min of the
contender index into a claim array), and everyone else accumulates into it
via scatter-add in a later round — the vectorized analog of jellyfish's
``claim_key``/``add_val`` CAS loops (large_hash_array.hpp:509-597,741-752).

All functions are pure; callers jit them (donating ``tab``).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from jasper_tpu.ops.hashing import mix32
from jasper_tpu.ops.kmer import words_per_kmer

_EMPTY_CLAIM = np.uint32(0xFFFFFFFF)


def empty_table(k: int, n_slots: int) -> jax.Array:
    """Allocate an empty table. n_slots must be a power of two."""
    assert n_slots & (n_slots - 1) == 0, "n_slots must be a power of 2"
    W = words_per_kmer(k)
    return jnp.zeros((n_slots + 1, W + 1), dtype=jnp.uint32)


def slots_for(n_keys: int, load_factor: float = 0.6) -> int:
    """Smallest power-of-two slot count holding n_keys at the load factor."""
    need = max(16, int(math.ceil(n_keys / load_factor)))
    return 1 << (need - 1).bit_length()


def insert_kmers(tab, keys, counts, active, max_rounds: int = 512):
    """Insert-or-add a batch of k-mers.

    tab:    uint32 [n_slots+1, W+1]
    keys:   uint32 [B, W]
    counts: uint32 [B]   (amount to add)
    active: bool   [B]   (False entries are ignored)

    Returns (tab, n_pending, n_placed): n_pending > 0 means the table filled
    up before all keys were placed (callers that pre-guarantee capacity — see
    jasper_tpu.count.counter — never hit this); n_placed counts newly
    occupied slots so callers can track occupancy without rescanning.

    The loop aborts early once no lane has resolved for 32 consecutive
    rounds (an overfull table would otherwise cycle every lane through every
    slot), so a full table fails fast instead of spinning max_rounds.
    """
    n_slots = tab.shape[0] - 1
    W = tab.shape[1] - 1
    mask = jnp.uint32(n_slots - 1)
    B = keys.shape[0]
    ids = jnp.arange(B, dtype=jnp.uint32)
    # derive a zero from `active` so every while-loop carry is device-varying
    # under shard_map even when keys/tab are replicated (shard-map scan-vma)
    vzero = active[0].astype(jnp.uint32) * jnp.uint32(0)
    tab = tab | vzero
    pos = (mix32(jnp, keys) & mask) | vzero
    pending = active | (vzero != 0)
    claim = jnp.full((n_slots + 1,), _EMPTY_CLAIM, dtype=jnp.uint32) | vzero
    counts = counts.astype(jnp.uint32)

    def cond(state):
        tab, claim, pos, pending, r, stall, placed = state
        return jnp.any(pending) & (r < max_rounds) & (stall < 32)

    def body(state):
        tab, claim, pos, pending, r, stall, placed = state
        n_before = jnp.sum(pending)
        rows = jnp.take(tab, pos, axis=0, mode="clip")  # [B, W+1]
        occupied = rows[:, W] != 0
        key_match = jnp.all(rows[:, :W] == keys, axis=-1)
        is_match = pending & occupied & key_match
        is_empty = pending & ~occupied
        is_coll = pending & occupied & ~key_match

        # accumulate matches (scatter-add; masked lanes add 0 at dummy row)
        add_pos = jnp.where(is_match, pos, n_slots)
        tab = tab.at[add_pos, W].add(jnp.where(is_match, counts, 0), mode="drop")

        # claim empty slots: min contender id wins
        empty_pos = jnp.where(is_empty, pos, n_slots)
        claim = claim.at[empty_pos].min(ids, mode="drop")
        won = is_empty & (jnp.take(claim, pos, axis=0, mode="clip") == ids)
        win_pos = jnp.where(won, pos, n_slots)
        new_rows = jnp.concatenate([keys, counts[:, None]], axis=-1)
        tab = tab.at[win_pos, :].set(jnp.where(won[:, None], new_rows, rows), mode="drop")
        # reset claim cells we touched so later rounds start clean
        claim = claim.at[empty_pos].set(_EMPTY_CLAIM, mode="drop")

        pending = pending & ~is_match & ~won
        pos = jnp.where(is_coll, (pos + 1) & mask, pos)
        progressed = jnp.sum(pending) < n_before
        stall = jnp.where(progressed, jnp.uint32(0), stall + 1)
        placed = placed + jnp.sum(won.astype(jnp.uint32))
        return tab, claim, pos, pending, r + 1, stall, placed

    tab, claim, pos, pending, r, stall, placed = jax.lax.while_loop(
        cond, body,
        (tab, claim, pos, pending, vzero, vzero, vzero),
    )
    # clear any scratch accumulated in the dummy row
    tab = tab.at[n_slots, :].set(0)
    return tab, jnp.sum(pending.astype(jnp.uint32)), placed


def lookup_kmers(tab, keys, valid, max_probes: int = 512):
    """Batched count lookup.

    keys: uint32 [B, W]; valid: bool [B]. Returns uint32 [B] counts
    (0 for absent keys and for valid=False lanes — the contract JASPER's
    scan relies on, reference src/jasper.py:70-73).
    """
    n_slots = tab.shape[0] - 1
    W = tab.shape[1] - 1
    mask = jnp.uint32(n_slots - 1)
    vzero = valid[0].astype(jnp.uint32) * jnp.uint32(0)
    pos = (mix32(jnp, keys) & mask) | vzero
    res = jnp.zeros(keys.shape[0], dtype=jnp.uint32) | vzero
    pending = valid

    def cond(state):
        pos, res, pending, r, stall = state
        return jnp.any(pending) & (r < max_probes) & (stall < 32)

    def body(state):
        pos, res, pending, r, stall = state
        n_before = jnp.sum(pending)
        rows = jnp.take(tab, pos, axis=0, mode="clip")
        occupied = rows[:, W] != 0
        key_match = jnp.all(rows[:, :W] == keys, axis=-1)
        hit = pending & occupied & key_match
        res = jnp.where(hit, rows[:, W], res)
        pending = pending & occupied & ~key_match
        pos = jnp.where(pending, (pos + 1) & mask, pos)
        progressed = jnp.sum(pending) < n_before
        stall = jnp.where(progressed, jnp.uint32(0), stall + 1)
        return pos, res, pending, r + 1, stall

    pos, res, pending, r, stall = jax.lax.while_loop(
        cond, body, (pos, res, pending, vzero, vzero)
    )
    return res


def table_histogram(tab, max_count: int):
    """count-frequency histogram over occupied slots: hist[c] = #keys with
    count c (c in 1..max_count; counts > max_count clamp into the last bin,
    mirroring jellyfish histo's `high` bucket, sub_commands/histo_main.cc)."""
    n_slots = tab.shape[0] - 1
    W = tab.shape[1] - 1
    counts = tab[:n_slots, W]
    occupied = counts != 0
    clipped = jnp.clip(counts, 0, max_count)
    return jnp.bincount(
        jnp.where(occupied, clipped, 0), length=max_count + 1
    ).at[0].set(0)


def table_stats(tab):
    """(unique, distinct, total, max) as in `jellyfish stats`
    (sub_commands/stats_main.cc:32-46). Host-side numpy: totals overflow
    uint32 at genome scale and jax x64 is off by default."""
    arr = np.asarray(tab)
    n_slots = arr.shape[0] - 1
    W = arr.shape[1] - 1
    counts = arr[:n_slots, W].astype(np.uint64)
    occupied = counts != 0
    return (
        int((counts == 1).sum()),
        int(occupied.sum()),
        int(counts.sum()),
        int(counts.max() if len(counts) else 0),
    )


@dataclasses.dataclass
class DeviceKmerTable:
    """Convenience wrapper owning a device table + jitted entry points."""

    k: int
    tab: jax.Array  # uint32 [n_slots+1, W+1]

    @classmethod
    def create(cls, k: int, n_keys_estimate: int, load_factor: float = 0.6):
        return cls(k=k, tab=empty_table(k, slots_for(n_keys_estimate, load_factor)))

    @property
    def n_slots(self) -> int:
        return self.tab.shape[0] - 1

    @property
    def W(self) -> int:
        return self.tab.shape[1] - 1

    def insert(self, keys, counts, active):
        self.tab, n_pending, _ = _insert_jit(self.tab, keys, counts, active)
        return n_pending

    def lookup(self, keys, valid):
        return _lookup_jit(self.tab, keys, valid)

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.tab)


_insert_jit = jax.jit(insert_kmers, donate_argnums=0)
_lookup_jit = jax.jit(lookup_kmers)
