"""Multi-chip count table: hash-prefix sharding + all-to-all query routing.

The reference scales by processes sharing one mmapped file through the OS
page cache (reference src/jasper.sh:209-212) — single node only. The TPU
design (SURVEY §2.F P5, BASELINE north star):

  * mesh axis "table": the count table is sharded by the TOP bits of the
    table hash (owner = mix32(key) >> (32 - log2 D)); each device holds an
    independent open-addressing sub-table addressed by the LOW hash bits,
    so routing and local probing use independent bits of one hash.
  * mesh axis "data": query batches (contig windows, read chunks) are
    data-parallel; table shards are replicated across the data axis.
  * lookup: each device buckets its queries by owner with a static capacity
    (2x the uniform share — overflow is counted and returned, not silent),
    exchanges buckets with jax.lax.all_to_all over ICI, probes locally, and
    routes results back.
  * when the table fits one chip's HBM, use replicated mode instead
    (replicated_lookup_fn): no collectives on the lookup path at all.

Everything is shard_map over a jax.sharding.Mesh, so the same code runs on
a v5e pod slice or on the 8-device virtual CPU mesh used in tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from jasper_tpu.ops.hashing import mix32
from jasper_tpu.table.kmer_table import insert_kmers, lookup_kmers

CAPACITY_FACTOR = 2  # bucket capacity = factor * B/D


def make_mesh(n_table: int, n_data: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_table * n_data, (
        f"need {n_table * n_data} devices, have {devices.size}"
    )
    grid = devices[: n_table * n_data].reshape(n_data, n_table)
    return Mesh(grid, ("data", "table"))


def _owner_shift(n_table: int) -> int:
    return 32 - int(math.log2(n_table)) if n_table > 1 else 32


def _owner_bits(n_table: int) -> int:
    return int(math.log2(n_table)) if n_table > 1 else 0


# -- sharded build -----------------------------------------------------------


def build_sharded(mesh: Mesh, keys, counts, local_slots: int):
    """Build per-device sub-tables from replicated (keys, counts) streams.

    Every device scans the full stream and inserts only its owned keys —
    collective-free, duplicated scan work (fine for build-once/query-many
    polishing). Returns uint32 [D_total, local_slots+1, W+1] sharded along
    axis 0 over ("data","table"); shards are identical across "data".
    """
    from jasper_tpu.table.kmer_table import PAD_BUCKETS, ROW_U32, slot_words_for

    D = mesh.shape["table"]
    shift = _owner_shift(D)
    W = keys.shape[1]
    sw = slot_words_for(W)
    n_buckets = max(1, local_slots // (ROW_U32 // sw))
    local_shape = (n_buckets + PAD_BUCKETS, ROW_U32)
    keys = jnp.asarray(keys)
    counts = jnp.asarray(counts, dtype=jnp.uint32)

    def per_shard(keys, counts):
        me = jax.lax.axis_index("table").astype(jnp.uint32)
        h = mix32(jnp, keys)
        owner = (h >> jnp.uint32(shift)) if D > 1 else jnp.zeros_like(h)
        mine = owner == me
        tab = jnp.zeros(local_shape, dtype=jnp.uint32)
        tab, n_pending, _ = insert_kmers(tab, keys, counts, mine,
                                         owner_bits=_owner_bits(D))
        return tab[None], n_pending[None]

    fn = jax.jit(
        jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(("data", "table")), P(("data", "table"))),
        )
    )
    tabs, pend = fn(keys, counts)
    if int(jnp.sum(pend)) > 0:
        raise RuntimeError("sharded sub-table overflow; raise local_slots")
    return tabs


# -- query/insert routing ----------------------------------------------------


class _Router:
    """Owner-bucketing + all_to_all exchange along the "table" axis with a
    static per-bucket capacity. Shared by lookup, scan, and insert paths."""

    def __init__(self, D: int, W: int, batch_per_device: int):
        self.D = D
        self.W = W
        self.shift = _owner_shift(D)
        self.cap = CAPACITY_FACTOR * max(batch_per_device // max(D, 1), 1)

    def bucketize(self, keys, valid):
        D, W, cap = self.D, self.W, self.cap
        B = keys.shape[0]
        h = mix32(jnp, keys)
        owner = (
            (h >> jnp.uint32(self.shift)).astype(jnp.uint32)
            if D > 1
            else jnp.zeros_like(h)
        )
        order = jnp.argsort(owner, stable=True)
        sowner = owner[order]
        first_of_run = jnp.searchsorted(sowner, sowner, side="left")
        rank = jnp.arange(B, dtype=jnp.int32) - first_of_run.astype(jnp.int32)
        overflow = rank >= cap
        slot = jnp.where(overflow, D * cap, sowner.astype(jnp.int32) * cap + rank)
        n_overflow = jnp.sum((overflow & valid[order]).astype(jnp.uint32))
        return order, slot, n_overflow

    def exchange(self, x):
        """[D*cap, ...] -> [D*cap, ...] all_to_all along "table"."""
        D, cap = self.D, self.cap
        if D == 1:
            return x
        return jax.lax.all_to_all(
            x.reshape((D, cap) + x.shape[1:]), "table", 0, 0
        ).reshape((D * cap,) + x.shape[1:])

    def scatter_to_buckets(self, slot, values, fill=0):
        """values [B, ...] ordered -> [D*cap+1, ...] (+1 = overflow dummy)."""
        out = jnp.full((self.D * self.cap + 1,) + values.shape[1:], fill,
                       dtype=values.dtype)
        return out.at[slot].set(values, mode="drop")

    def route_keys(self, keys, valid):
        order, slot, n_overflow = self.bucketize(keys, valid)
        sk = self.scatter_to_buckets(slot, keys[order])
        sv = self.scatter_to_buckets(
            slot, valid[order] & (slot < self.D * self.cap), fill=False
        )
        rk = self.exchange(sk[: self.D * self.cap])
        rv = self.exchange(sv[: self.D * self.cap])
        return order, slot, n_overflow, rk, rv

    def route_back(self, order, slot, local_results, B):
        back = self.exchange(local_results)
        back = jnp.concatenate([back, jnp.zeros((1,), back.dtype)])
        return jnp.zeros(B, dtype=local_results.dtype).at[order].set(back[slot])


def sharded_lookup_fn(mesh: Mesh, W: int, batch_per_device: int):
    """Returns jitted fn(tabs, keys, valid) -> (counts [N], n_overflow).

    tabs: [D_total, S, W+1] sharded over ("data","table") on axis 0.
    keys: [N, W], valid: [N], with N = D_total * batch_per_device, sharded
    by rows. Routing is all_to_all along the "table" axis only.
    """
    router = _Router(mesh.shape["table"], W, batch_per_device)

    def per_device(tab, keys, valid):
        order, slot, n_overflow, rk, rv = router.route_keys(keys, valid)
        local_counts = lookup_kmers(tab[0], rk, rv,
                                    owner_bits=_owner_bits(router.D))
        res = router.route_back(order, slot, local_counts, keys.shape[0])
        return res, n_overflow[None]

    @jax.jit
    def lookup(tabs, keys, valid):
        res, ovf = jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(
                P(("data", "table")),
                P(("data", "table")),
                P(("data", "table")),
            ),
            out_specs=(P(("data", "table")), P(("data", "table"))),
        )(tabs, keys, valid)
        return res, jnp.sum(ovf)

    return lookup


def sharded_insert_fn(mesh: Mesh, W: int, batch_per_device: int):
    """Multi-chip counting step: route (keys, counts) to owners, insert into
    the local sub-table. Inserts along the "table" axis are exact; the same
    key arriving at its owner from several "data" rows accumulates into each
    data-row's replica... so counting uses a data-axis size of 1 (pure table
    sharding) or requires a final cross-data reduction — the dryrun uses
    n_data=1 for the counting step. Returns jitted
    fn(tabs, keys, counts, valid) -> (tabs, n_pending, n_overflow)."""
    router = _Router(mesh.shape["table"], W, batch_per_device)

    def per_device(tab, keys, counts, valid):
        order, slot, n_overflow, rk, rv = router.route_keys(keys, valid)
        sc = router.scatter_to_buckets(slot, counts[order])
        rc = router.exchange(sc[: router.D * router.cap])
        new_tab, n_pending, _ = insert_kmers(tab[0], rk, rc, rv,
                                             owner_bits=_owner_bits(router.D))
        return new_tab[None], n_pending[None], n_overflow[None]

    @functools.partial(jax.jit, donate_argnums=0)
    def insert(tabs, keys, counts, valid):
        tabs, pend, ovf = jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(
                P(("data", "table")),
                P(("data", "table")),
                P(("data", "table")),
                P(("data", "table")),
            ),
            out_specs=(
                P(("data", "table")),
                P(("data", "table")),
                P(("data", "table")),
            ),
        )(tabs, keys, counts, valid)
        return tabs, jnp.sum(pend), jnp.sum(ovf)

    return insert


def sharded_scan_fn(mesh: Mesh, k: int, codes_per_device: int, divisor: int = 50):
    """The full multi-chip polishing scan step: per-device window extraction
    (data-parallel over contig chunks) + sharded table lookup (all-to-all
    over the table axis) + classification flags. This is the composition the
    production multi-chip polish path runs every window batch."""
    from jasper_tpu.ops.kmer import canonical_windows

    n_windows = codes_per_device - k + 1
    W = (2 * k + 31) // 32
    router = _Router(mesh.shape["table"], W, n_windows)

    def per_device(tab, codes, thre):
        keys, valid = canonical_windows(jnp, codes[0], k)
        order, slot, n_overflow, rk, rv = router.route_keys(keys, valid)
        local_counts = lookup_kmers(tab[0], rk, rv,
                                    owner_bits=_owner_bits(router.D))
        counts = router.route_back(order, slot, local_counts, keys.shape[0])
        t = thre[0]
        below = valid & (counts < t)
        idx = jnp.maximum(jnp.arange(n_windows) - k, 0)
        prev = counts[idx]
        d = jnp.uint32(divisor)
        ceil_prev = prev // d + (prev % d != 0).astype(jnp.uint32)
        rel = valid & ~below & (jnp.arange(n_windows) > 0) & (counts < ceil_prev)
        return counts[None], below[None], rel[None], n_overflow[None]

    @jax.jit
    def scan(tabs, codes, thre):
        counts, below, rel, ovf = jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(
                P(("data", "table")),
                P(("data", "table")),
                P(("data", "table")),
            ),
            out_specs=(
                P(("data", "table")),
                P(("data", "table")),
                P(("data", "table")),
                P(("data", "table")),
            ),
        )(tabs, codes, thre)
        return counts, below, rel, jnp.sum(ovf)

    return scan


def replicated_lookup_fn(mesh: Mesh):
    """Data-parallel lookup against a replicated table: queries sharded over
    all devices, table everywhere. The default when the DB fits HBM."""

    def per_device(tab, keys, valid):
        return lookup_kmers(tab, keys, valid)

    @jax.jit
    def lookup(tab, keys, valid):
        return jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), P(("data", "table")), P(("data", "table"))),
            out_specs=P(("data", "table")),
        )(tab, keys, valid)

    return lookup
