"""scan_window_tiled correctness at tile boundaries.

The device scan computes the relative-drop flag against counts[max(i-k, 0)]
(reference src/jasper.py:80); inside a tile that prev index clamps at the
tile start, so the host fixes up the first k positions of every non-first
tile. This suite pins the tiled output (tiny tiles, many boundaries) to an
oracle computed from host lookups over the whole contig at once.
"""

import numpy as np
import pytest

from tests import golden_util as G

from jasper_tpu.count.counter import count_sequences
from jasper_tpu.ops.codes import encode
from jasper_tpu.polish.window import scan_window_tiled
from jasper_tpu.table.host_table import HostKmerTable

K = 25
DIVISOR = 50


def _oracle(host, draft, thre):
    codes = encode(draft)
    n = len(codes) - K + 1
    counts = np.zeros(n, np.uint32)
    bad = (codes > 3).astype(np.int32)
    cs = np.concatenate([[0], np.cumsum(bad)])
    valid = (cs[K : n + K] - cs[:n]) == 0
    for i in range(n):
        if valid[i]:
            from jasper_tpu.ops.kmer import canonical_windows

            keys, v = canonical_windows(np, codes[i : i + K], K)
            counts[i] = host.lookup_words(keys[:1])[0]
    below = valid & (counts < thre)
    idx = np.maximum(np.arange(n) - K, 0)
    prev = counts[idx].astype(np.uint64)
    ceil_prev = prev // DIVISOR + (prev % DIVISOR != 0)
    rel = valid & ~below & (np.arange(n) > 0) & (counts < ceil_prev)
    return counts, below, rel


@pytest.mark.parametrize("tile", [64, 100, 1 << 12])
def test_tiled_matches_oracle_with_reldrop_at_boundaries(tile):
    rng = np.random.default_rng(11)
    genome = G.random_genome(rng, 1200)
    # skewed coverage: the first 600 bases are read 60x deep, the rest 2x —
    # the coverage cliff produces genuine relative drops, and with tiny
    # tiles some land within k of a tile boundary
    reads = list(G.tiled_reads(genome[:620], read_len=100, stride=2)) * 30
    reads += list(G.tiled_reads(genome, read_len=100, stride=50)) * 2
    tab = count_sequences(reads, K)
    host = HostKmerTable(K, np.asarray(tab))

    draft = genome[:300] + "N" + genome[300:900] + "R" + genome[900:]
    thre = 3
    counts, below, rel = scan_window_tiled(
        tab, encode(draft), np.uint32(thre), K, tile=tile
    )
    oc, ob, orel = _oracle(host, draft, thre)
    np.testing.assert_array_equal(counts, oc)
    np.testing.assert_array_equal(below, ob)
    np.testing.assert_array_equal(rel, orel)
    assert orel.any(), "fixture must actually exercise the reldrop flag"


def test_mesh_scan_cache_keys_on_devices_not_mesh_identity():
    """Two meshes over different device sets must not alias one cached
    jitted scan (the r3 `id(mesh)` key could: a GC'd Mesh's id is reusable).
    Both runs must match the single-device scan bit-for-bit."""
    import jax
    from jax.sharding import Mesh

    from jasper_tpu.polish.window import _DP_SCAN_CACHE

    rng = np.random.default_rng(5)
    genome = G.random_genome(rng, 800)
    reads = list(G.tiled_reads(genome, read_len=100, stride=3)) * 4
    tab = count_sequences(reads, K)
    codes = encode(genome)
    ref = scan_window_tiled(tab, codes, np.uint32(2), K, tile=256)

    devs = jax.devices()
    assert len(devs) >= 4, "conftest forces an 8-device CPU platform"
    _DP_SCAN_CACHE.clear()
    mesh_a = Mesh(np.array(devs[:2]), ("data",))
    got_a = scan_window_tiled(tab, codes, np.uint32(2), K, tile=256, mesh=mesh_a)
    key_a = next(iter(_DP_SCAN_CACHE))
    mesh_b = Mesh(np.array(devs[2:4]), ("data",))
    got_b = scan_window_tiled(tab, codes, np.uint32(2), K, tile=256, mesh=mesh_b)
    assert len(_DP_SCAN_CACHE) == 2, "distinct device sets must cache separately"
    assert key_a[0] == (devs[0].id, devs[1].id)
    for got in (got_a, got_b):
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(g, r)
