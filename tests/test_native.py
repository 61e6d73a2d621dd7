"""Native C++ parser parity: jt_fastx must produce the same k-mer stream as
the pure-Python parser for FASTA/FASTQ/gzip/quality-masked inputs (mirrors
the format edge cases of jf:unit_tests/test_mer_overlap_sequence_parser.cc)."""

import gzip
from collections import Counter

import numpy as np
import pytest

from jasper_tpu.io import native
from jasper_tpu.io.fastx import stream_codes
from jasper_tpu.ops.codes import CODE_N, decode
from jasper_tpu.ops.kmer import canonical_windows

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")

K = 11


def kmer_counter(paths, k, min_qual_char=None, use_native=False):
    """k-mer multiset via stream_codes (the counting-relevant content)."""
    c = Counter()
    for codes, _ in stream_codes(paths, k, 1 << 14, min_qual_char, use_native=use_native):
        keys, valid = canonical_windows(np, codes, k)
        for i in np.flatnonzero(valid):
            c[tuple(keys[i])] += 1
    return c


def write_fasta(path, seqs, width=17):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">seq{i} extra header words\n")
            for j in range(0, len(s), width):
                f.write(s[j : j + width] + "\n")


def write_fastq(path, seqs, quals=None, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for i, s in enumerate(seqs):
            q = quals[i] if quals else "I" * len(s)
            f.write(f"@read{i} comment\n{s}\n+\n{q}\n")


@pytest.fixture
def seqs():
    rng = np.random.default_rng(31)
    out = []
    for n in (60, 11, 10, 200, 35):
        out.append("".join("ACGTNacgtn"[x] for x in rng.integers(0, 10, n)))
    return out


def test_fasta_parity(tmp_path, seqs):
    p = str(tmp_path / "a.fa")
    write_fasta(p, seqs)
    assert kmer_counter([p], K, use_native=True) == kmer_counter([p], K, use_native=False)


def test_fastq_parity(tmp_path, seqs):
    p = str(tmp_path / "a.fq")
    write_fastq(p, seqs)
    assert kmer_counter([p], K, use_native=True) == kmer_counter([p], K, use_native=False)


def test_fastq_gz_parity(tmp_path, seqs):
    p = str(tmp_path / "a.fq.gz")
    write_fastq(p, seqs, gz=True)
    got = kmer_counter([p], K, use_native=True)
    assert got == kmer_counter([p], K, use_native=False)
    assert len(got) > 0


def test_multi_file_parity(tmp_path, seqs):
    p1, p2 = str(tmp_path / "a.fa"), str(tmp_path / "b.fq")
    write_fasta(p1, seqs[:2])
    write_fastq(p2, seqs[2:])
    assert kmer_counter([p1, p2], K, use_native=True) == kmer_counter(
        [p1, p2], K, use_native=False
    )


def test_quality_masking_parity(tmp_path, seqs):
    rng = np.random.default_rng(7)
    quals = ["".join(chr(rng.integers(33, 74)) for _ in s) for s in seqs]
    p = str(tmp_path / "q.fq")
    write_fastq(p, seqs, quals)
    a = kmer_counter([p], K, "5", use_native=True)
    b = kmer_counter([p], K, "5", use_native=False)
    assert a == b
    # masking must actually remove something vs unmasked
    assert sum(a.values()) < sum(kmer_counter([p], K, use_native=True).values())


def test_small_block_boundaries(tmp_path, seqs):
    """Mid-record/mid-line block splits must not change output."""
    p = str(tmp_path / "a.fq")
    write_fastq(p, seqs)
    parser_small = native.NativeParser()
    out_small = []
    with open(p, "rb") as f:
        while True:
            b = f.read(7)  # pathological block size
            if not b:
                break
            out_small.append(parser_small.feed(b))
    parser_big = native.NativeParser()
    out_big = [parser_big.feed(open(p, "rb").read())]
    a = np.concatenate(out_small)
    b = np.concatenate(out_big)
    assert (a == b).all()
    # record separators present between reads
    assert (a == CODE_N).sum() >= len(seqs) - 1 + sum(s.upper().count("N") for s in seqs)


def test_dos_line_endings(tmp_path):
    """\\r\\n handling (reference parser strips DOS endings,
    jf:tests/parallel_hashing.sh exercises this)."""
    p = str(tmp_path / "dos.fa")
    with open(p, "wb") as f:
        f.write(b">s1\r\nACGTACGTACGTACGT\r\nACGT\r\n>s2\r\nTTTTTTTTTTTT\r\n")
    parser = native.NativeParser()
    codes = parser.feed(open(p, "rb").read())
    assert decode(codes) == "ACGTACGTACGTACGTACGT" + "N" + "TTTTTTTTTTTT"


def test_fastq_stream_is_clean(tmp_path):
    """No header bytes may leak into the code stream between records
    (regression: the post-qual state must skip the next header line)."""
    p = str(tmp_path / "c.fq")
    write_fastq(p, ["ACGTACGTAC", "GGGGCCCCAA", "TTTTAAAACC"])
    parser = native.NativeParser()
    codes = parser.feed(open(p, "rb").read())
    assert decode(codes) == "ACGTACGTAC" + "N" + "GGGGCCCCAA" + "N" + "TTTTAAAACC"


def test_truncated_fastq_record_dropped(tmp_path):
    p = str(tmp_path / "t.fq")
    with open(p, "w") as f:
        f.write("@r0\nACGTACGT\n+\nIIIIIIII\n@r1\nACGTACGTACGT\n+\nIII")
    parser = native.NativeParser()
    codes = parser.feed(open(p, "rb").read())
    # only the complete record's codes appear
    assert decode(codes) == "ACGTACGT"


def test_native_table_query_equivalence():
    """jt_query_str / jt_query_substr_batch / jt_effective_key must agree
    with the pure-Python chain (effective_canonical_words + lookup_one) on
    edge cases: empty, short, N-containing, lowercase, non-ASCII strings."""
    import numpy as np
    import pytest

    from jasper_tpu.polish.semantics import effective_canonical_words
    from jasper_tpu.table.host_table import HostKmerTable
    from jasper_tpu.table import native_table

    if not native_table.available():
        pytest.skip("native table library unavailable")

    k = 21
    rng = np.random.default_rng(17)
    genome = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 4000)])
    host = HostKmerTable.empty(k, 1 << 13)
    from jasper_tpu.ops.codes import encode
    from jasper_tpu.ops.kmer import canonical_windows

    keys, valid = canonical_windows(np, encode(genome), k)
    host.insert_np(keys[valid], rng.integers(1, 50, int(valid.sum())).astype(np.uint32))

    nq = native_table.NativeTableQuery(host)
    cases = [
        genome[100 : 100 + k],            # exact hit
        genome[101 : 101 + k].lower(),    # lowercase
        "T" * k,                          # absent
        "",                               # empty -> all-A key
        "ACG",                            # short
        genome[50 : 50 + 10] + "N" + genome[60 : 60 + 10],  # N run stop
        "ACGTé" + genome[: k - 5],  # non-ascii char terminates
        genome[200 : 200 + k - 1],        # k-1 length
    ]
    for s in cases:
        key = effective_canonical_words(s, k)
        assert nq.query_str(s) == host.lookup_one(key), repr(s)
        np.testing.assert_array_equal(nq.effective_key(s), key, err_msg=repr(s))

    # batch vs scalar over every window of a mixed string
    s = genome[:300] + "NN" + genome[300:500].lower() + "x" + genome[500:700]
    starts = np.arange(len(s) - k + 1, dtype=np.int64)
    got = nq.query_substrings(s, starts)
    want = np.array(
        [host.lookup_one(effective_canonical_words(s[i : i + k], k)) for i in starts],
        dtype=np.uint32,
    )
    np.testing.assert_array_equal(got, want)

    # fail-closed on out-of-range k (W > MAX_W)
    assert native_table._load().jt_query_str(
        nq._ptr, nq.n_buckets, nq.pad, 300, 19, 20, b"A" * 300, 300
    ) == 0
