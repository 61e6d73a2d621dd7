"""Round-trip tests for .jf binary/sorted interchange."""

import numpy as np

from jasper_tpu.io.jf import dump_table_to_jf, load_jf_into_host_table, read_jf, write_jf
from jasper_tpu.ops.gf2 import GF2Matrix
from jasper_tpu.ops.kmer import int_to_words, kmer_to_int, words_per_kmer
from jasper_tpu.table import HostKmerTable


def test_jf_roundtrip_k25():
    k = 25
    rng = np.random.default_rng(0)
    W = words_per_kmer(k)
    n = 500
    keys = rng.integers(0, 2**32, size=(n, W), dtype=np.uint32)
    keys[:, W - 1] &= (1 << (2 * k - 32 * (W - 1))) - 1
    # dedupe
    keys = np.unique(keys, axis=0)
    counts = rng.integers(1, 1000, size=len(keys)).astype(np.uint64)

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.jf")
        write_jf(p, k, keys, counts)
        k2, keys2, counts2, header = read_jf(p)
        assert k2 == k
        assert header["format"] == "binary/sorted"
        assert header["canonical"] is True
        # same multiset of (key, count)
        a = {tuple(x) for x in np.concatenate([keys, counts[:, None].astype(np.uint32)], axis=1)}
        b = {tuple(x) for x in np.concatenate([keys2, counts2[:, None].astype(np.uint32)], axis=1)}
        assert a == b
        # sorted by identity-matrix pos then key
        m = GF2Matrix.from_header_json(header["matrix1"])
        pos = m.times_words(keys2) & np.uint64(header["size"] - 1)
        assert (np.diff(pos.astype(np.int64)) >= 0).all()

        # file alignment: 9+hlen multiple of 8
        with open(p, "rb") as f:
            hlen = int(f.read(9))
        assert (9 + hlen) % 8 == 0


def test_counter_len_saturation(tmp_path):
    k = 9
    keys = np.stack([int_to_words(kmer_to_int("ACGTACGTA"), k)])
    counts = np.array([300], dtype=np.uint64)
    p = str(tmp_path / "s.jf")
    write_jf(p, k, keys, counts, counter_len=1)
    _, _, counts2, header = read_jf(p)
    assert header["counter_len"] == 1
    assert counts2[0] == 255  # saturates like binary_writer (binary_dumper.hpp:36-40)


def test_host_table_jf_cycle(tmp_path):
    k = 15
    host = HostKmerTable.empty(k, 1 << 12)
    rng = np.random.default_rng(3)
    W = words_per_kmer(k)
    keys = np.unique(
        rng.integers(0, 1 << (2 * k), size=800).astype(np.uint64)
    )
    words = np.stack([int_to_words(int(v), k) for v in keys])
    counts = rng.integers(1, 50, size=len(keys)).astype(np.uint32)
    host.insert_np(words, counts)

    p = str(tmp_path / "c.jf")
    dump_table_to_jf(p, host)
    host2, header = load_jf_into_host_table(p)
    assert host2.k == k
    np.testing.assert_array_equal(host2.lookup_words(words), host.lookup_words(words))
