"""SAM text input + generator-command fan-in (-g/-G) tests."""

from collections import Counter

import numpy as np
import pytest

from jasper_tpu.io.fastx import iter_reads, stream_codes
from jasper_tpu.io.generators import GeneratorManager
from jasper_tpu.ops.kmer import canonical_windows

K = 11


def kmers_of(paths, k):
    c = Counter()
    for codes, _ in stream_codes(paths, k, 1 << 14):
        keys, valid = canonical_windows(np, codes, k)
        for i in np.flatnonzero(valid):
            c[tuple(keys[i])] += 1
    return c


def test_sam_input(tmp_path):
    seqs = ["ACGTACGTACGTACGTAC", "GGGGCCCCAAAATTTTGG"]
    sam = tmp_path / "r.sam"
    with open(sam, "w") as f:
        f.write("@HD\tVN:1.6\n@SQ\tSN:c\tLN:100\n")
        for i, s in enumerate(seqs):
            f.write(f"r{i}\t0\tc\t1\t60\t{len(s)}M\t*\t0\t0\t{s}\t{'I' * len(s)}\n")
        f.write("unmapped\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\n")
    assert list(iter_reads(str(sam))) == seqs
    fa = tmp_path / "r.fa"
    with open(fa, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")
    assert kmers_of([str(sam)], K) == kmers_of([str(fa)], K)


def test_sam_quality_masking(tmp_path):
    sam = tmp_path / "q.sam"
    seq = "ACGTACGTACGTACGT"
    qual = "I" * 8 + "!" + "I" * 7
    with open(sam, "w") as f:
        f.write(f"r0\t0\tc\t1\t60\t16M\t*\t0\t0\t{seq}\t{qual}\n")
    masked = list(iter_reads(str(sam), min_qual_char="5"))[0]
    assert masked == seq[:8] + "x" + seq[9:]


def test_generator_manager(tmp_path):
    fa1, fa2 = tmp_path / "a.fa", tmp_path / "b.fa"
    fa1.write_text(">x\nACGTACGTACGTACGT\n")
    fa2.write_text(">y\nTTTTGGGGCCCCAAAA\n")
    cmds = tmp_path / "cmds"
    cmds.write_text(f"cat {fa1}\ncat {fa2}\n")
    mgr = GeneratorManager(str(cmds), n_concurrent=2)
    got = kmers_of(mgr.streams(), K)
    want = kmers_of([str(fa1), str(fa2)], K)
    assert got == want


def test_generator_failure_raises(tmp_path):
    cmds = tmp_path / "cmds"
    cmds.write_text("false\n")
    mgr = GeneratorManager(str(cmds), 1)
    with pytest.raises(RuntimeError, match="exited with"):
        kmers_of(mgr.streams(), K)


def test_generator_gzip_stream(tmp_path):
    import gzip

    fa = tmp_path / "a.fa.gz"
    with gzip.open(fa, "wt") as f:
        f.write(">x\nACGTACGTACGTACGT\n")
    cmds = tmp_path / "cmds"
    cmds.write_text(f"cat {fa}\n")  # generator emits gzip bytes
    mgr = GeneratorManager(str(cmds), 1)
    plain = tmp_path / "p.fa"
    plain.write_text(">x\nACGTACGTACGTACGT\n")
    assert kmers_of(mgr.streams(), K) == kmers_of([str(plain)], K)


def _write_bam(path, reads, quals=None):
    """Minimal spec-conforming BAM writer (BGZF = gzip members)."""
    import gzip
    import struct

    SEQ16 = "=ACMGRSVTWYHKDBN"
    code = {c: i for i, c in enumerate(SEQ16)}
    body = bytearray()
    body += b"BAM\x01"
    text = b"@HD\tVN:1.6\n"
    body += struct.pack("<i", len(text)) + text
    body += struct.pack("<i", 1)  # one reference
    name = b"chr1\x00"
    body += struct.pack("<i", len(name)) + name + struct.pack("<i", 1000)
    for ri, seq in enumerate(reads):
        qual = (quals[ri] if quals else None)
        rn = f"r{ri}\x00".encode()
        packed = bytearray()
        for i in range(0, len(seq), 2):
            hi = code[seq[i]] << 4
            lo = code[seq[i + 1]] if i + 1 < len(seq) else 0
            packed.append(hi | lo)
        q = bytes((ord(c) - 33) for c in qual) if qual else b"\xff" * len(seq)
        rec = struct.pack("<iiBBHHHiiii", -1, -1, len(rn), 0, 4680, 0,
                          4, len(seq), -1, -1, 0)
        rec += rn + b"" + bytes(packed) + q
        body += struct.pack("<i", len(rec)) + rec
    with open(path, "wb") as f:
        f.write(gzip.compress(bytes(body)))


def test_bam_reader_roundtrip(tmp_path):
    """Pure-Python BAM ingestion (reference sam_format.hpp's htslib role)."""
    from jasper_tpu.io.bam import iter_bam_reads
    from jasper_tpu.io.fastx import iter_reads

    reads = ["ACGTACGTACGT", "GGGTTTCCCAAA", "ACGTN"]
    p = tmp_path / "r.bam"
    _write_bam(str(p), reads)
    assert list(iter_bam_reads(str(p))) == reads
    assert list(iter_reads(str(p))) == reads

    # -Q masking: low-quality bases become 'x'
    quals = ["I" * 12, "I" * 11 + "!", "IIIII"]
    p2 = tmp_path / "q.bam"
    _write_bam(str(p2), reads, quals)
    got = list(iter_bam_reads(str(p2), min_qual_char="5"))
    assert got[0] == reads[0]
    assert got[1] == reads[1][:-1] + "x"

    # counting from BAM == counting from FASTA of the same reads
    import gzip as _g

    fa = tmp_path / "r.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    from jasper_tpu.count.counter import count_reads
    from jasper_tpu.table.kmer_table import table_stats

    t1 = count_reads([str(p)], 5, chunk_len=2048)
    t2 = count_reads([str(fa)], 5, chunk_len=2048)
    assert table_stats(t1, 5) == table_stats(t2, 5)
