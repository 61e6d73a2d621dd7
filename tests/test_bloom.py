"""Bloom filter/counter tests (mirrors jf:unit_tests/test_mer_dna_bloom_counter.cc
behavior: values {0,1,2}, min-over-hashes, double hashing; plus bloomcounter
file round-trip used by QueryMerFile)."""

import numpy as np
import pytest

from jasper_tpu.bloom import (
    BloomCounter2,
    BloomFilter1,
    BloomHashPair,
    load_bloom_counter,
    opt_k,
    opt_m,
    write_bloom_counter,
)
from jasper_tpu.bloom.io import pack_base3, unpack_base3
from jasper_tpu.ops.kmer import words_per_kmer

K = 21


def rand_keys(rng, n, k=K):
    W = words_per_kmer(k)
    keys = rng.integers(0, 2**32, size=(n, W), dtype=np.uint32)
    rem = 2 * k - 32 * (W - 1)
    keys[:, W - 1] &= (1 << rem) - 1
    return keys


@pytest.fixture
def pair():
    return BloomHashPair.random(K, np.random.default_rng(11))


def test_opt_formulas():
    # bloom_common.hpp:62-67: m = n*round(-ln(fp)/ln2^2), k = round(-ln(fp)/ln2)
    assert opt_m(0.01, 1000) == 1000 * 10
    assert opt_k(0.01) == 7
    assert opt_k(0.001) == 10


def test_counter_values_saturate(pair):
    rng = np.random.default_rng(1)
    keys = rand_keys(rng, 50)
    bc = BloomCounter2(opt_m(0.001, 5000), opt_k(0.001), pair)
    assert (bc.check_words(keys) == 0).all()
    prev = bc.insert_words(keys)
    assert (prev == 0).all()
    assert (bc.check_words(keys) == 1).all()
    prev = bc.insert_words(keys)
    assert (prev == 1).all()
    assert (bc.check_words(keys) == 2).all()
    prev = bc.insert_words(keys)
    assert (prev == 2).all()
    assert (bc.check_words(keys) == 2).all()


def test_counter_multiplicity_equals_sequential(pair):
    rng = np.random.default_rng(2)
    keys = rand_keys(rng, 100)
    times = rng.integers(1, 4, size=100).astype(np.uint32)
    a = BloomCounter2(1 << 16, 4, pair)
    b = BloomCounter2(1 << 16, 4, pair)
    a.insert_words(keys, times)
    for i in range(100):
        for _ in range(int(times[i])):
            b.insert_words(keys[i : i + 1])
    assert (a.data == b.data).all()


def test_absent_keys_mostly_zero(pair):
    rng = np.random.default_rng(3)
    bc = BloomCounter2(opt_m(0.001, 10000), opt_k(0.001), pair)
    bc.insert_words(rand_keys(rng, 1000))
    absent = rand_keys(np.random.default_rng(99), 1000)
    fp = (bc.check_words(absent) > 0).mean()
    assert fp < 0.01


def test_filter1(pair):
    rng = np.random.default_rng(4)
    keys = rand_keys(rng, 200)
    bf = BloomFilter1(1 << 16, 4, pair)
    assert (bf.check_words(keys) == 0).all()
    prev = bf.insert_words(keys)
    assert (prev == 0).all()
    assert (bf.check_words(keys) == 1).all()
    assert (bf.insert_words(keys) == 1).all()


def test_pack_base3_roundtrip():
    rng = np.random.default_rng(5)
    for m in (1, 4, 5, 6, 12345):
        digits = rng.integers(0, 3, size=m).astype(np.uint8)
        assert (unpack_base3(pack_base3(digits), m) == digits).all()
    # counter p lives at byte p//5, digit p%5 (bloom_counter2.hpp:56-105)
    d = np.zeros(10, dtype=np.uint8)
    d[7] = 2
    packed = pack_base3(d)
    assert packed[1] == 2 * 9 and packed[0] == 0


def test_file_roundtrip(tmp_path, pair):
    rng = np.random.default_rng(6)
    keys = rand_keys(rng, 300)
    bc = BloomCounter2(opt_m(0.01, 3000), opt_k(0.01), pair)
    bc.insert_words(keys)
    bc.insert_words(keys[:100])
    path = str(tmp_path / "test.bc")
    write_bloom_counter(path, bc, canonical=True, fpr=0.01)
    bc2, header = load_bloom_counter(path)
    assert header["format"] == "bloomcounter"
    assert header["key_len"] == 2 * K
    assert header["nb_hashes"] == bc.nb_hashes
    assert int(header["size"]) == bc.m
    assert (bc2.data == bc.data).all()
    assert (bc2.check_words(keys) == bc.check_words(keys)).all()


def test_query_mer_file_bloomcounter(tmp_path):
    import jasper_tpu.bindings  # noqa: F401
    import dna_jellyfish as jf

    jf.MerDNA.k(K)
    pair = BloomHashPair.random(K, np.random.default_rng(12))
    bc = BloomCounter2(opt_m(0.001, 1000), opt_k(0.001), pair)
    m1 = jf.MerDNA("ACGTACGTACGTACGTACGTA")
    m2 = jf.MerDNA("TTGGCCAATTGGCCAATTGGC")
    from jasper_tpu.ops.kmer import int_to_words

    bc.insert_words(np.stack([int_to_words(m1.v, K)]))
    bc.insert_words(np.stack([int_to_words(m2.v, K)]))
    bc.insert_words(np.stack([int_to_words(m2.v, K)]))
    path = str(tmp_path / "q.bc")
    write_bloom_counter(path, bc)
    qf = jf.QueryMerFile(path)
    assert qf[m1] == 1
    assert qf[m2] == 2
    assert qf[jf.MerDNA("A" * K)] == 0
