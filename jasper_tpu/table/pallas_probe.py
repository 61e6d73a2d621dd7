"""Pallas fused probe for the bucketed k-mer count table.

The XLA lookup path (table/kmer_table.py:lookup_kmers) gathers one 256-byte
bucket row per lane with ``jnp.take`` and then compares on the materialized
[B, 64] array: the gather writes 256 B/lane to HBM and the compare reads
them back, so the probe costs ~3x the raw-gather floor measured by
tools/layout_sweep.py. This kernel fuses the compare into the row fetch:
per grid step it DMAs G scattered bucket rows HBM->VMEM (their indices come
from a scalar-prefetched ``home`` vector, so Mosaic's pipeline machinery
double-buffers the fetches across steps), runs the 16-way slot compare in
VMEM, and writes only 8 bytes/lane (count + hit/has-empty flags) back.

This is the experiment BASELINE.md's probe-design note calls for: the fused
probe replaces the first (and almost always only) probe round; rare
full-bucket-no-match lanes still resolve through lookup_kmers' compacted
XLA rounds. Equivalence vs the XLA probe is pinned by
tests/test_pallas_probe.py; tools/layout_sweep.py measures it on chip.

Reference being replaced: the binary-search query path of
jellyfish (include/jellyfish/binary_dumper.hpp:112-213) — here a one-fetch
hash probe whose fetch+compare never leaves the chip's VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jasper_tpu.ops.hashing import home_of, mix32
from jasper_tpu.table.kmer_table import PAD_BUCKETS, ROW_U32, slot_words_for

HIT_BIT = 1
EMPTY_BIT = 2


def _probe_kernel(G: int, W: int, sw: int, slots: int):
    def kernel(home_smem, keys_ref, *refs):
        rows_refs = refs[:G]
        cnt_ref, flag_ref = refs[G], refs[G + 1]
        # per-aliased-row compare (no concatenate: Mosaic-friendlier), each
        # row ref is a (1, 1, 64) VMEM block fetched by the pipeline
        for j in range(G):
            row = rows_refs[j][0]  # [1, 64]
            key = keys_ref[j : j + 1, :]  # [1, W]
            cnt = jnp.zeros((1, 1), jnp.uint32)
            hit = jnp.zeros((1, 1), jnp.uint32)
            empty = jnp.zeros((1, 1), jnp.uint32)
            for s in range(slots):
                # word-major rows: slot s's word j at column j*slots + s
                c = row[:, W * slots + s : W * slots + s + 1]  # [1, 1]
                occ = c != 0
                eq = occ
                for w in range(W):
                    eq = eq & (row[:, w * slots + s : w * slots + s + 1]
                               == key[:, w : w + 1])
                cnt = cnt + jnp.where(eq, c, 0)
                hit = hit | eq.astype(jnp.uint32)
                empty = empty | (~occ).astype(jnp.uint32)
            cnt_ref[j : j + 1, :] = cnt
            flag_ref[j : j + 1, :] = (hit * jnp.uint32(HIT_BIT)
                                      + empty * jnp.uint32(EMPTY_BIT))

    return kernel


@functools.partial(
    jax.jit, static_argnames=("W", "G", "interpret"), inline=True
)
def _probe_call(tab, home, keys, *, W: int, G: int, interpret: bool = False):
    B = keys.shape[0]
    assert B % G == 0, (B, G)
    sw = slot_words_for(W)
    slots = ROW_U32 // sw

    def key_map(i, home_ref):
        return (i, 0)

    def row_map_for(j):
        def row_map(i, home_ref):
            return (home_ref[i * G + j], 0, 0)

        return row_map

    def out_map(i, home_ref):
        return (i, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, W), key_map, memory_space=pltpu.VMEM),
            *[
                # Mosaic wants the last two block dims (8,128)-divisible or
                # equal to the array dims, so scattered single rows travel
                # as (1, 1, 64) blocks of the [R, 1, 64] table view
                pl.BlockSpec((1, 1, ROW_U32), row_map_for(j),
                             memory_space=pltpu.VMEM)
                for j in range(G)
            ],
        ],
        out_specs=[
            pl.BlockSpec((G, 1), out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1), out_map, memory_space=pltpu.VMEM),
        ],
    )
    tab3 = tab.reshape(tab.shape[0], 1, ROW_U32)
    cnt, flags = pl.pallas_call(
        _probe_kernel(G, W, sw, slots),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1), jnp.uint32),
        ],
        interpret=interpret,
    )(home.astype(jnp.int32), keys, *([tab3] * G))
    return cnt[:, 0], flags[:, 0]


def probe_rows(tab, home, keys, *, G: int = 16, interpret: bool = False):
    """Fused probe of one bucket row per lane.

    tab uint32 [n_buckets+PAD, 64]; home uint32 [B] (bucket index per lane,
    already offset for probe round); keys uint32 [B, W]. Returns
    (cnt uint32 [B], hit bool [B], has_empty bool [B]) — exactly the XLA
    probe's outputs (kmer_table.lookup_kmers' inner ``probe``).
    B is padded to a multiple of G internally.
    """
    B, W = keys.shape
    Bp = -(-B // G) * G
    if Bp != B:
        home = jnp.pad(home, (0, Bp - B))
        keys = jnp.pad(keys, ((0, Bp - B), (0, 0)))
    cnt, flags = _probe_call(tab, home, keys, W=W, G=G, interpret=interpret)
    cnt, flags = cnt[:B], flags[:B]
    return cnt, (flags & HIT_BIT) != 0, (flags & EMPTY_BIT) != 0


def lookup_kmers_pallas(tab, keys, valid, *, G: int = 16, owner_bits: int = 0,
                        interpret: bool = False):
    """lookup_kmers with the first probe round through the Pallas kernel.

    Semantics identical to kmer_table.lookup_kmers: uint32 counts, 0 for
    absent keys and invalid lanes. Pending lanes (full home bucket, no
    match) continue through the same compacted XLA rounds.
    """
    from jasper_tpu.table.kmer_table import _layout, lookup_kmers

    n_buckets, W, sw, slots = _layout(tab, keys)
    home = home_of(jnp, mix32(jnp, keys), n_buckets, owner_bits)
    cnt, hit, has_empty = probe_rows(tab, home, keys, G=G, interpret=interpret)
    res = jnp.where(valid & hit, cnt, 0)
    pending = valid & ~hit & ~has_empty
    return jax.lax.cond(
        jnp.any(pending),
        lambda: jnp.where(
            pending,
            lookup_kmers(tab, keys, pending, owner_bits=owner_bits),
            res,
        ),
        lambda: res,
    )
