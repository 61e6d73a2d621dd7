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
