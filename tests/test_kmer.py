"""Core k-mer ops vs string-level oracles (mirrors the coverage of the
reference's test_mer_dna.cc: codes, revcomp, canonical, round-trip)."""

import numpy as np
import jax.numpy as jnp
import pytest

from jasper_tpu.ops import codes
from jasper_tpu.ops.kmer import (
    canonical_windows,
    int_to_kmer,
    int_to_words,
    key_bytes,
    kmer_to_int,
    pack_codes,
    window_stack,
    words_le,
    words_per_kmer,
    words_to_int,
)


def rand_seq(rng, n, alphabet="ACGT"):
    return "".join(rng.choice(list(alphabet)) for _ in range(n))


def test_encode_decode_roundtrip():
    s = "ACGTacgtNnXx-"
    c = codes.encode(s)
    assert list(c) == [0, 1, 2, 3, 0, 1, 2, 3, 4, 4, 5, 5, 5]
    assert codes.decode(c[:8]) == "ACGTACGT"


def test_canonical_str():
    assert codes.canonical_str("ACGT") == "ACGT"  # palindrome
    assert codes.canonical_str("TTTT") == "AAAA"
    assert codes.canonical_str("gggg") == "CCCC"
    assert codes.revcomp_str("ACCGT") == "ACGGT"


@pytest.mark.parametrize("k", [5, 16, 17, 25, 31, 32, 33, 37, 47])
def test_pack_matches_int(k):
    rng = np.random.default_rng(k)
    W = words_per_kmer(k)
    assert W == (2 * k + 31) // 32
    for _ in range(20):
        s = "".join(rng.choice(list("ACGT")) for _ in range(k))
        v = kmer_to_int(s)
        assert int_to_kmer(v, k) == s
        words = int_to_words(v, k)
        assert words_to_int(words) == v
        packed = pack_codes(np, codes.encode(s)[None, :], k)[0]
        np.testing.assert_array_equal(packed, words)
        assert key_bytes(k) == (2 * k + 7) // 8


@pytest.mark.parametrize("k", [7, 25, 37])
def test_canonical_windows_vs_strings(k):
    rng = np.random.default_rng(k * 7)
    s = "".join(rng.choice(list("ACGTN"), p=[0.24, 0.24, 0.24, 0.24, 0.04]) for _ in range(400))
    c = codes.encode(s)
    keys, valid = canonical_windows(np, c, k)
    assert keys.shape == (400 - k + 1, words_per_kmer(k))
    for i in range(400 - k + 1):
        mer = s[i : i + k]
        if "N" in mer:
            assert not valid[i]
        else:
            assert valid[i]
            expect = kmer_to_int(codes.canonical_str(mer))
            assert words_to_int(keys[i]) == expect, f"window {i} {mer}"


@pytest.mark.parametrize("k", [25, 37])
def test_jax_numpy_agree(k):
    import functools
    import jax

    rng = np.random.default_rng(1)
    s = "".join(rng.choice(list("ACGT")) for _ in range(1000))
    c = codes.encode(s)
    kn, vn = canonical_windows(np, c, k)
    jitted = jax.jit(functools.partial(canonical_windows, jnp, k=k))
    kj, vj = jitted(jnp.asarray(c))
    np.testing.assert_array_equal(kn, np.asarray(kj))
    np.testing.assert_array_equal(vn, np.asarray(vj))


def test_words_le():
    a = np.array([[1, 2], [3, 4], [5, 5], [0, 7]], dtype=np.uint32)
    b = np.array([[1, 2], [9, 3], [6, 5], [1, 6]], dtype=np.uint32)
    # compare as (hi=last word, lo=first word)
    np.testing.assert_array_equal(
        words_le(np, a, b), np.array([True, False, True, False])
    )


def test_window_stack():
    c = np.arange(10, dtype=np.uint8)
    w = window_stack(np, c, 4)
    assert w.shape == (7, 4)
    np.testing.assert_array_equal(w[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(w[6], [6, 7, 8, 9])


def test_canonical_windows_fast_positional_matches():
    """Funnel-shift extraction == reference extraction, positional order,
    for several k straddling word boundaries and invalid bases."""
    from jasper_tpu.ops.kmer import canonical_windows, canonical_windows_fast

    rng = np.random.default_rng(41)
    for k in (5, 16, 17, 25, 31, 32, 33, 37, 48, 49):
        for L in (k, k + 1, k + 15, k + 16, 1000, 1037):
            codes = rng.integers(0, 5, size=L).astype(np.uint8)
            ref_k, ref_v = canonical_windows(np, codes, k)
            got_k, got_v = canonical_windows_fast(np, codes, k)
            np.testing.assert_array_equal(got_v, ref_v, err_msg=f"k={k} L={L}")
            np.testing.assert_array_equal(
                got_k[ref_v], ref_k[ref_v], err_msg=f"k={k} L={L}"
            )


def test_canonical_windows_fast_grouped_set_equal():
    from jasper_tpu.ops.kmer import canonical_windows, canonical_windows_fast

    rng = np.random.default_rng(43)
    k = 25
    codes = rng.integers(0, 5, size=2000).astype(np.uint8)
    ref_k, ref_v = canonical_windows(np, codes, k)
    got_k, got_v = canonical_windows_fast(np, codes, k, grouped=True)
    ref_set = {}
    for kk in map(tuple, ref_k[ref_v]):
        ref_set[kk] = ref_set.get(kk, 0) + 1
    got_set = {}
    for kk in map(tuple, got_k[got_v]):
        got_set[kk] = got_set.get(kk, 0) + 1
    assert got_set == ref_set


def test_canonical_windows_fast_jax_matches_numpy():
    import jax.numpy as jnp

    from jasper_tpu.ops.kmer import canonical_windows_fast

    rng = np.random.default_rng(47)
    codes = rng.integers(0, 5, size=3000).astype(np.uint8)
    for k in (21, 37):
        nk, nv = canonical_windows_fast(np, codes, k)
        jk, jv = canonical_windows_fast(jnp, jnp.asarray(codes), k)
        np.testing.assert_array_equal(np.asarray(jk), nk)
        np.testing.assert_array_equal(np.asarray(jv), nv)
