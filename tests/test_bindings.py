"""dna_jellyfish binding parity tests.

Mirrors the reference's SWIG Python binding tests
(jf:swig/python/test_{hash_counter,string_mers,mer_file}.py) against
jasper_tpu.bindings.dna_jellyfish, plus MerDNA surface checks from
jf:swig/mer_dna.i semantics.
"""

import random
from collections import Counter

import numpy as np
import pytest

import jasper_tpu.bindings  # noqa: F401 — registers dna_jellyfish
import dna_jellyfish as jf

from jasper_tpu.io.jf import write_jf, write_text_jf
from jasper_tpu.ops.codes import canonical_str, revcomp_str
from jasper_tpu.ops.kmer import int_to_words


def random_mers(rng, k, n):
    """n distinct random k-mers as strings."""
    out = set()
    while len(out) < n:
        out.add("".join(rng.choice("ACGT") for _ in range(k)))
    return sorted(out)


# -- MerDNA -------------------------------------------------------------------


class TestMerDNA:
    def test_str_roundtrip_and_canonical(self):
        rng = random.Random(1)
        for k in (5, 16, 17, 37, 63):
            jf.MerDNA.k(k)
            for s in random_mers(rng, k, 20):
                m = jf.MerDNA(s)
                assert str(m) == s
                assert str(m.get_reverse_complement()) == revcomp_str(s)
                assert str(m.get_canonical()) == canonical_str(s)
                assert (m.get_canonical() == m) or (m.get_canonical() == m.get_reverse_complement())

    def test_shifts(self):
        jf.MerDNA.k(4)
        m = jf.MerDNA("ACGT")
        assert m.shift_left("A") == "A" and str(m) == "CGTA"
        m = jf.MerDNA("ACGT")
        assert m.shift_right("A") == "T" and str(m) == "AACG"
        m = jf.MerDNA("ACGT")
        m << "C"
        assert str(m) == "CGTC"
        m >> "G"
        assert str(m) == "GCGT"

    def test_base_indexing(self):
        jf.MerDNA.k(6)
        m = jf.MerDNA("ACGTCA")
        # base(0) is the rightmost base
        assert m[0] == "A" and m[1] == "C" and m[5] == "A"
        m[0] = "G"
        assert str(m) == "ACGTCG"
        with pytest.raises(IndexError):
            m[6]

    def test_poly_homopolymer_set(self):
        jf.MerDNA.k(8)
        m = jf.MerDNA()
        m.polyT()
        assert str(m) == "T" * 8 and m.is_homopolymer()
        m.polyA()
        assert str(m) == "A" * 8
        m.set("ACGTACGT")
        assert str(m) == "ACGTACGT" and not m.is_homopolymer()
        with pytest.raises(ValueError):
            m.set("ACG")

    def test_partial_fill_ctor(self):
        # from-string ctor pads with A after the first invalid char
        jf.MerDNA.k(6)
        assert str(jf.MerDNA("ACNGTC")) == "ACAAAA"
        assert str(jf.MerDNA("GG")) == "GGAAAA"
        assert str(jf.MerDNA("")) == "AAAAAA"

    def test_comparisons_are_lexicographic(self):
        jf.MerDNA.k(37)
        rng = random.Random(2)
        mers = random_mers(rng, 37, 30)
        for a, b in zip(mers, mers[1:]):
            assert jf.MerDNA(a) < jf.MerDNA(b)
            assert jf.MerDNA(b) > jf.MerDNA(a)
        assert jf.MerDNA(mers[0]) == jf.MerDNA(mers[0])


# -- HashCounter / HashSet (mirrors jf:swig/python/test_hash_counter.py) ------


class TestHashCounter:
    def setup_method(self, _):
        jf.MerDNA.k(100)
        self.hash = jf.HashCounter(1024, 5)

    def test_info(self):
        assert jf.MerDNA.k() == 100
        assert self.hash.size() == 1024
        assert self.hash.val_len() == 5

    def test_add(self):
        random.seed(3)
        mer = jf.MerDNA()
        for i in range(1000):
            mer.randomize()
            val = random.randrange(1000)
            assert self.hash.add(mer, val)
            if i % 3 > 0:
                nval = random.randrange(1000)
                val += nval
                if i % 3 == 1:
                    assert not self.hash.add(mer, nval)
                else:
                    assert self.hash.update_add(mer, nval)
            assert val == self.hash.get(mer)
            assert val == self.hash[mer]

    def test_absent_returns_none(self):
        m = jf.MerDNA("A" * 100)
        assert self.hash.get(m) is None
        assert self.hash[m] is None

    def test_hash_set(self):
        jf.MerDNA.k(24)
        hs = jf.HashSet(256)
        m = jf.MerDNA("ACGT" * 6)
        assert not hs[m]
        assert hs.add(m)
        assert not hs.add(m)
        assert hs[m] and hs.get(m)


# -- StringMers (mirrors jf:swig/python/test_string_mers.py) -------------------


class TestStringMers:
    def setup_method(self, _):
        random.seed(4)
        self.str = "".join(random.choice("ACGTacgt") for _ in range(1000))
        self.k = random.randint(10, 110)
        jf.MerDNA.k(self.k)

    def test_all_mers(self):
        count = 0
        for m in jf.string_mers(self.str):
            m2 = jf.MerDNA(self.str[count : count + self.k])
            assert m == m2
            assert self.str[count : count + self.k].upper() == str(m2)
            count += 1
        assert count == len(self.str) - self.k + 1

    def test_canonical_mers(self):
        count = -1
        for count, m in enumerate(jf.string_canonicals(self.str)):
            m2 = jf.MerDNA(self.str[count : count + self.k])
            rm2 = m2.get_reverse_complement()
            assert m == m2 or m == rm2
            assert not (m > m2) and not (m > rm2)
        assert count == len(self.str) - self.k

    def test_invalid_resets_window(self):
        jf.MerDNA.k(4)
        mers = [str(m) for m in jf.string_mers("ACGTNACGTA")]
        assert mers == ["ACGT", "ACGT", "CGTA"]


# -- ReadMerFile / QueryMerFile (mirrors jf:swig/python/test_mer_file.py) -----


@pytest.fixture(scope="module")
def jf_file(tmp_path_factory):
    k = 21
    rng = random.Random(5)
    jf.MerDNA.k(k)
    mers = random_mers(rng, k, 400)
    # canonical keys with counts
    table = {}
    for s in mers:
        table[canonical_str(s)] = table.get(canonical_str(s), 0) + rng.randrange(1, 30)
    keys = np.stack(
        [int_to_words(jf.MerDNA(s).v, k) for s in sorted(table)]
    ).astype(np.uint32)
    counts = np.array([table[s] for s in sorted(table)], dtype=np.uint64)
    path = tmp_path_factory.mktemp("jf") / "binding_test.jf"
    write_jf(str(path), k, keys, counts)
    tpath = tmp_path_factory.mktemp("jf") / "binding_test.txt.jf"
    write_text_jf(str(tpath), k, keys, counts)
    return str(path), str(tpath), k, table


class TestMerFile:
    def test_histo(self, jf_file):
        path, _, k, table = jf_file
        mf = jf.ReadMerFile(path)
        histo = Counter()
        while mf.next_mer():
            histo[mf.count()] += 1
        expect = Counter(table.values())
        assert histo == expect

    def test_iter_matches_table(self, jf_file):
        path, _, k, table = jf_file
        seen = {}
        for mer, count in jf.ReadMerFile(path):
            seen[str(mer)] = count
        assert seen == table

    def test_text_format_matches_binary(self, jf_file):
        path, tpath, k, _ = jf_file
        bin_items = [(str(m), c) for m, c in jf.ReadMerFile(path)]
        txt_items = [(str(m), c) for m, c in jf.ReadMerFile(tpath)]
        assert bin_items == txt_items

    def test_query(self, jf_file):
        path, _, k, _ = jf_file
        qf = jf.QueryMerFile(path)
        assert jf.MerDNA.k() == k
        for mer, count in jf.ReadMerFile(path):
            assert qf[mer] == count

    def test_query_noncanonical_misses(self, jf_file):
        path, _, k, table = jf_file
        qf = jf.QueryMerFile(path)
        # a mer whose canonical form differs misses when queried raw
        for s in table:
            rc = revcomp_str(s)
            if rc != s:
                m = jf.MerDNA(rc)
                assert qf[m] == 0
                assert qf[m.get_canonical()] == table[s]
                break
