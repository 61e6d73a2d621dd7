"""Multi-chip sharded/replicated table on the virtual 8-device CPU mesh:
results must equal the single-device table exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jasper_tpu.ops.kmer import words_per_kmer
from jasper_tpu.parallel.sharded_table import (
    build_sharded,
    make_mesh,
    replicated_lookup_fn,
    sharded_lookup_fn,
)
from jasper_tpu.table import HostKmerTable
from jasper_tpu.table.kmer_table import empty_table, insert_kmers


def _make_keys(rng, n, k):
    W = words_per_kmer(k)
    keys = rng.integers(0, 2**32, size=(n, W), dtype=np.uint32)
    top = 2 * k - 32 * (W - 1)
    if top < 32:
        keys[:, W - 1] &= (1 << top) - 1
    return np.unique(keys, axis=0)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (8, 1)])
def test_sharded_lookup_matches_single(mesh_shape):
    k = 25
    rng = np.random.default_rng(1)
    keys = _make_keys(rng, 5000, k)
    counts = rng.integers(1, 100, size=len(keys)).astype(np.uint32)
    W = keys.shape[1]

    n_data, n_table = mesh_shape
    mesh = make_mesh(n_table, n_data)
    tabs = build_sharded(mesh, keys, counts,
                         local_slots=max(2048, 16384 // n_table))

    D_total = n_data * n_table
    bpd = 1024
    N = D_total * bpd
    qidx = rng.integers(0, len(keys), size=N)
    queries = keys[qidx]
    absent = _make_keys(np.random.default_rng(9), 500, k)
    queries[:500] = absent[:500]
    valid = rng.random(N) < 0.95

    fn = sharded_lookup_fn(mesh, W, bpd)
    res, ovf = fn(tabs, jnp.asarray(queries), jnp.asarray(valid))
    assert int(ovf) == 0, "bucket overflow on uniform queries"

    # ground truth from a single table
    tab = empty_table(k, 16384)
    tab, pend, _ = insert_kmers(
        tab, jnp.asarray(keys), jnp.asarray(counts), jnp.ones(len(keys), bool)
    )
    assert int(pend) == 0
    host = HostKmerTable(k, np.asarray(tab))
    expect = host.lookup_words(queries)
    expect[~valid] = 0
    np.testing.assert_array_equal(np.asarray(res), expect)


def test_replicated_lookup_matches_single():
    k = 17
    rng = np.random.default_rng(2)
    keys = _make_keys(rng, 3000, k)
    counts = rng.integers(1, 50, size=len(keys)).astype(np.uint32)
    tab = empty_table(k, 8192)
    tab, pend, _ = insert_kmers(
        tab, jnp.asarray(keys), jnp.asarray(counts), jnp.ones(len(keys), bool)
    )
    assert int(pend) == 0

    mesh = make_mesh(4, 2)
    N = 8 * 512
    queries = keys[rng.integers(0, len(keys), size=N)]
    valid = np.ones(N, bool)
    fn = replicated_lookup_fn(mesh)
    res = fn(tab, jnp.asarray(queries), jnp.asarray(valid))

    host = HostKmerTable(k, np.asarray(tab))
    np.testing.assert_array_equal(np.asarray(res), host.lookup_words(queries))


def test_skewed_queries_overflow_reported():
    """All queries to one shard: overflow must be counted, and reported
    results for non-overflowed lanes still correct."""
    k = 17
    rng = np.random.default_rng(3)
    keys = _make_keys(rng, 4000, k)
    counts = np.ones(len(keys), np.uint32)
    mesh = make_mesh(8, 1)
    tabs = build_sharded(mesh, keys, counts, local_slots=1024)

    # find keys all owned by shard 0
    from jasper_tpu.ops.hashing import hash_words_np

    owner = hash_words_np(keys) >> np.uint32(29)
    shard0 = keys[owner == 0]
    bpd = 256
    N = 8 * bpd
    queries = np.tile(shard0[:1], (N, 1))
    fn = sharded_lookup_fn(mesh, keys.shape[1], bpd)
    res, ovf = fn(tabs, jnp.asarray(queries), jnp.asarray(np.ones(N, bool)))
    # capacity = 2*bpd/8 = 64 per bucket; per device 256 queries to one
    # bucket -> 192 overflow each
    assert int(ovf) == 8 * (bpd - 64)
    r = np.asarray(res)
    assert (r[r != 0] == 1).all()
    assert (r != 0).sum() == 8 * 64
