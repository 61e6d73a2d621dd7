"""Pallas fused probe == XLA probe, exactly (interpret mode on CPU).

The kernel itself is measured on chip by tools/layout_sweep.py; here we pin
that its outputs (count, hit, has_empty per lane) match the XLA gather
probe bit-for-bit on a real table built by insert_kmers, including misses,
invalid lanes, overflow chains into PAD buckets, and non-multiple-of-G
batch sizes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from jasper_tpu.ops.hashing import home_of, mix32
from jasper_tpu.table.kmer_table import (
    empty_table,
    insert_kmers,
    lookup_kmers,
)
from jasper_tpu.table import pallas_probe


def _build_table(rng, W, n_keys, n_slots):
    tab = empty_table(k=W * 16, n_slots=n_slots)  # k only sets slot width
    keys = rng.integers(0, 2**32, size=(n_keys, W), dtype=np.uint64).astype(
        np.uint32
    )
    counts = rng.integers(1, 1000, size=n_keys).astype(np.uint32)
    tab, n_pending, _ = insert_kmers(
        tab, jnp.asarray(keys), jnp.asarray(counts), jnp.ones(n_keys, bool)
    )
    assert int(n_pending) == 0
    return tab, keys, counts


@pytest.mark.parametrize("W", [2, 3])
@pytest.mark.parametrize("B", [256, 250])  # multiple of G and not
def test_probe_rows_matches_xla(W, B):
    rng = np.random.default_rng(42 + W + B)
    # small dense table => real overflow chains into PAD buckets
    tab, keys, counts = _build_table(rng, W, n_keys=900, n_slots=1024)
    from jasper_tpu.table.kmer_table import PAD_BUCKETS

    n_buckets = tab.shape[0] - PAD_BUCKETS

    # half present keys, half random (mostly absent)
    q = np.concatenate(
        [keys[rng.integers(0, len(keys), size=B // 2)],
         rng.integers(0, 2**32, size=(B - B // 2, W), dtype=np.uint64).astype(np.uint32)]
    )
    qj = jnp.asarray(q)
    home = home_of(jnp, mix32(jnp, qj), n_buckets)

    # XLA single-round probe, replicated from lookup_kmers' inner probe
    from jasper_tpu.table.kmer_table import _layout, _slot_view

    _, _, sw, slots = _layout(tab, qj)
    rows = jnp.take(tab, home, axis=0, mode="clip")
    skeys, scnt = _slot_view(rows, W, sw, slots)
    occ = scnt != 0
    key_eq = jnp.all(skeys == qj[:, None, :], axis=-1) & occ
    want_hit = np.asarray(jnp.any(key_eq, axis=1))
    want_cnt = np.asarray(
        jnp.sum(jnp.where(key_eq, scnt, 0), axis=1).astype(jnp.uint32)
    )
    want_empty = np.asarray(jnp.any(~occ, axis=1))

    cnt, hit, has_empty = pallas_probe.probe_rows(
        tab, home, qj, G=16, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(cnt), want_cnt)
    np.testing.assert_array_equal(np.asarray(hit), want_hit)
    np.testing.assert_array_equal(np.asarray(has_empty), want_empty)


def test_lookup_kmers_pallas_matches_lookup_kmers():
    rng = np.random.default_rng(7)
    W = 2
    tab, keys, counts = _build_table(rng, W, n_keys=900, n_slots=1024)
    B = 512
    q = np.concatenate(
        [keys[rng.integers(0, len(keys), size=B // 2)],
         rng.integers(0, 2**32, size=(B - B // 2, W), dtype=np.uint64).astype(np.uint32)]
    )
    valid = rng.random(B) < 0.9
    got = pallas_probe.lookup_kmers_pallas(
        tab, jnp.asarray(q), jnp.asarray(valid), interpret=True
    )
    want = lookup_kmers(tab, jnp.asarray(q), jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
