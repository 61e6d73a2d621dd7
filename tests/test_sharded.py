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
    res, ovf, unresolved = fn(tabs, jnp.asarray(queries), jnp.asarray(valid))
    assert int(ovf) == 0, "bucket overflow on uniform queries"
    assert not bool(jnp.any(unresolved))

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


def test_duplicate_skew_resolves_in_one_round():
    """All lanes query the SAME key (the poly-A repeat case): the router's
    dedupe collapses them to one representative per device, so there is no
    overflow and every lane gets the count."""
    k = 17
    rng = np.random.default_rng(3)
    keys = _make_keys(rng, 4000, k)
    counts = np.ones(len(keys), np.uint32)
    mesh = make_mesh(8, 1)
    tabs = build_sharded(mesh, keys, counts, local_slots=1024)

    from jasper_tpu.ops.hashing import hash_words_np

    owner = hash_words_np(keys) >> np.uint32(29)
    shard0 = keys[owner == 0]
    bpd = 256
    N = 8 * bpd
    queries = np.tile(shard0[:1], (N, 1))
    fn = sharded_lookup_fn(mesh, keys.shape[1], bpd)
    res, ovf, unresolved = fn(
        tabs, jnp.asarray(queries), jnp.asarray(np.ones(N, bool))
    )
    assert int(ovf) == 0
    assert not bool(jnp.any(unresolved))
    np.testing.assert_array_equal(np.asarray(res), np.ones(N, np.uint32))


def test_distinct_key_skew_retries_to_exact():
    """More DISTINCT keys to one owner than the bucket capacity: overflow is
    reported per lane (never silent zeros for resolved lanes), and the retry
    wrapper converges to exact counts (VERDICT r1 weak #4)."""
    from jasper_tpu.parallel.sharded_table import sharded_lookup_all_fn

    k = 17
    rng = np.random.default_rng(3)
    keys = _make_keys(rng, 4000, k)
    counts = rng.integers(1, 9, size=len(keys)).astype(np.uint32)
    mesh = make_mesh(8, 1)
    tabs = build_sharded(mesh, keys, counts, local_slots=1024)

    from jasper_tpu.ops.hashing import hash_words_np

    owner = hash_words_np(keys) >> np.uint32(29)
    shard0 = keys[owner == 0]
    assert len(shard0) > 64  # > cap = 2*bpd/8
    bpd = 256
    N = 8 * bpd
    idx = np.random.default_rng(5).integers(0, len(shard0), size=N)
    queries = shard0[idx]
    fn = sharded_lookup_fn(mesh, keys.shape[1], bpd)
    res, ovf, unresolved = fn(
        tabs, jnp.asarray(queries), jnp.asarray(np.ones(N, bool))
    )
    oracle = {tuple(kk): int(c) for kk, c in zip(keys, counts)}
    want = np.array([oracle[tuple(q)] for q in queries], np.uint32)
    if int(ovf) > 0:
        r, u = np.asarray(res), np.asarray(unresolved)
        np.testing.assert_array_equal(r[~u], want[~u])  # resolved lanes exact
        assert (r[u] == 0).all()
    fn_all = sharded_lookup_all_fn(mesh, keys.shape[1], bpd)
    res_all = fn_all(tabs, jnp.asarray(queries), jnp.asarray(np.ones(N, bool)))
    np.testing.assert_array_equal(np.asarray(res_all), want)
