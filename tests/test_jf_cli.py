"""jellyfish-tpu subcommand CLI tests.

Modeled on the reference's golden-output integration strategy
(jf:tests/parallel_hashing.sh, merge.sh: derived outputs — histos, dumps,
stats — must agree across paths), with a pure-python k-mer count as oracle.
"""

import subprocess
import sys
from collections import Counter

import numpy as np
import pytest

from jasper_tpu.count.merge import jaccard, merge_jf_files
from jasper_tpu.io.jf import read_any_jf, write_jf
from jasper_tpu.ops.codes import canonical_str
from jasper_tpu.ops.kmer import int_to_words, kmer_to_int

K = 15


def run_cli(*args, cwd=None):
    r = subprocess.run(
        [sys.executable, "/root/repo/bin/jellyfish-tpu", *args],
        capture_output=True, text=True, cwd=cwd,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert r.returncode == 0, r.stderr
    return r.stdout


def oracle_counts(seqs, k, canonical=True):
    c = Counter()
    for s in seqs:
        for i in range(len(s) - k + 1):
            mer = s[i : i + k].upper()
            if any(ch not in "ACGT" for ch in mer):
                continue
            c[canonical_str(mer) if canonical else mer] += 1
    return c


@pytest.fixture(scope="module")
def reads_fa(tmp_path_factory):
    rng = np.random.default_rng(21)
    seqs = ["".join("ACGT"[x] for x in rng.integers(0, 4, 500)) for _ in range(40)]
    # make some repeated content for count diversity
    seqs += seqs[:10]
    path = tmp_path_factory.mktemp("d") / "reads.fa"
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")
    return str(path), seqs


@pytest.fixture(scope="module")
def counted_jf(reads_fa, tmp_path_factory):
    path, seqs = reads_fa
    out = str(tmp_path_factory.mktemp("d") / "counts.jf")
    run_cli("count", "-m", str(K), "-s", "100k", "-C", "-o", out, path)
    return out, oracle_counts(seqs, K)


def test_count_matches_oracle(counted_jf):
    out, oracle = counted_jf
    k, keys, counts, header = read_any_jf(out)
    assert k == K and header["canonical"] is True
    got = {}
    from jasper_tpu.ops.kmer import int_to_kmer, words_to_int

    for i in range(len(keys)):
        got[int_to_kmer(words_to_int(keys[i]), k)] = int(counts[i])
    assert got == dict(oracle)


def test_count_noncanonical(reads_fa, tmp_path):
    path, seqs = reads_fa
    out = str(tmp_path / "nc.jf")
    run_cli("count", "-m", str(K), "-s", "100k", "-o", out, path)
    _, keys, counts, header = read_any_jf(out)
    assert header["canonical"] is False
    oracle = oracle_counts(seqs, K, canonical=False)
    assert len(keys) == len(oracle)
    assert int(counts.sum()) == sum(oracle.values())


def test_histo_stats_dump_agree(counted_jf, tmp_path):
    out, oracle = counted_jf
    histo = run_cli("histo", out)
    hist_oracle = Counter(oracle.values())
    got = {int(l.split()[0]): int(l.split()[1]) for l in histo.splitlines()}
    assert got == dict(hist_oracle)

    stats = run_cli("stats", out)
    vals = {l.split(":")[0]: int(l.split()[-1]) for l in stats.splitlines()}
    assert vals["Unique"] == sum(1 for v in oracle.values() if v == 1)
    assert vals["Distinct"] == len(oracle)
    assert vals["Total"] == sum(oracle.values())
    assert vals["Max_count"] == max(oracle.values())

    dump = run_cli("dump", "-c", out)
    got_d = {l.split()[0]: int(l.split()[1]) for l in dump.splitlines()}
    assert got_d == dict(oracle)
    # fasta-ish dump format
    fa = run_cli("dump", out).splitlines()
    assert fa[0].startswith(">") and fa[1] in oracle


def test_dump_filters(counted_jf):
    out, oracle = counted_jf
    dump = run_cli("dump", "-c", "-L", "2", out)
    got = {l.split()[0]: int(l.split()[1]) for l in dump.splitlines()}
    assert got == {m: c for m, c in oracle.items() if c >= 2}


def test_query(counted_jf):
    out, oracle = counted_jf
    some = list(oracle)[:5]
    rc = some[0].translate(str.maketrans("ACGT", "TGCA"))[::-1]
    got = run_cli("query", out, *some, rc)
    lines = got.splitlines()
    for mer, line in zip(some, lines):
        assert line == f"{mer} {oracle[mer]}"
    # canonical db: reverse complement hits the same count
    assert lines[-1] == f"{rc} {oracle[some[0]]}"


def test_query_sequence_file(counted_jf, reads_fa, tmp_path):
    """query -s: every window of every read, in order, `MER count` lines —
    the vectorized batch path must match a per-window oracle (reference
    query_main.cc:86-123 sequence mode)."""
    out, oracle = counted_jf
    path, seqs = reads_fa
    qf = tmp_path / "q.fa"
    with open(qf, "w") as f:
        f.write(f">q0\n{seqs[0][:80]}\n>q1\nAC\n>q2\nANN{seqs[1][:40]}\n")
    got = run_cli("query", "-s", str(qf), out).splitlines()
    want = []
    for s in (seqs[0][:80], "AC", "ANN" + seqs[1][:40]):
        for i in range(max(0, len(s) - K + 1)):
            mer = s[i : i + K].upper()
            cnt = oracle.get(canonical_str(mer), 0) if all(
                ch in "ACGT" for ch in mer) else 0
            want.append(f"{mer} {cnt}")
    assert got == want


def test_merge_ops(tmp_path):
    mers = ["ACGTACGTACGTACG", "CCCCCCCCCCCCCCC", "GATTACAGATTACAG"]
    k1 = np.stack([int_to_words(kmer_to_int(m), K) for m in mers[:2]])
    k2 = np.stack([int_to_words(kmer_to_int(m), K) for m in mers[1:]])
    a, b = str(tmp_path / "a.jf"), str(tmp_path / "b.jf")
    write_jf(a, K, k1, np.array([3, 5], np.uint64))
    write_jf(b, K, k2, np.array([7, 2], np.uint64))

    out = str(tmp_path / "m.jf")
    merge_jf_files([a, b], out, op="sum")
    _, keys, counts, _ = read_any_jf(out)
    got = {tuple(keys[i]): int(counts[i]) for i in range(len(keys))}
    expect_sum = {
        tuple(int_to_words(kmer_to_int(mers[0]), K)): 3,
        tuple(int_to_words(kmer_to_int(mers[1]), K)): 12,
        tuple(int_to_words(kmer_to_int(mers[2]), K)): 2,
    }
    assert got == expect_sum

    merge_jf_files([a, b], out, op="min")
    _, keys, counts, _ = read_any_jf(out)
    got = {tuple(keys[i]): int(counts[i]) for i in range(len(keys))}
    # absent in one file -> min 0 (merge_files.cc:78-80)
    assert got[tuple(int_to_words(kmer_to_int(mers[1]), K))] == 5
    assert got[tuple(int_to_words(kmer_to_int(mers[0]), K))] == 0

    merge_jf_files([a, b], out, op="max")
    _, keys, counts, _ = read_any_jf(out)
    got = {tuple(keys[i]): int(counts[i]) for i in range(len(keys))}
    assert got[tuple(int_to_words(kmer_to_int(mers[1]), K))] == 7

    j, wj = jaccard([a, b])
    assert j == pytest.approx(1 / 3)
    assert wj == pytest.approx(5 / (3 + 7 + 2))


def test_merge_cli_matches_direct_count(reads_fa, tmp_path):
    """parallel_hashing.sh-style invariant: counting two halves then merging
    with SUM equals counting everything at once."""
    path, seqs = reads_fa
    half1, half2 = str(tmp_path / "h1.fa"), str(tmp_path / "h2.fa")
    n = len(seqs) // 2
    with open(half1, "w") as f:
        for i, s in enumerate(seqs[:n]):
            f.write(f">a{i}\n{s}\n")
    with open(half2, "w") as f:
        for i, s in enumerate(seqs[n:]):
            f.write(f">b{i}\n{s}\n")
    j1, j2 = str(tmp_path / "1.jf"), str(tmp_path / "2.jf")
    run_cli("count", "-m", str(K), "-s", "100k", "-C", "-o", j1, half1)
    run_cli("count", "-m", str(K), "-s", "100k", "-C", "-o", j2, half2)
    merged = str(tmp_path / "merged.jf")
    run_cli("merge", "-o", merged, j1, j2)
    h_merged = run_cli("histo", merged)
    full = str(tmp_path / "full.jf")
    run_cli("count", "-m", str(K), "-s", "100k", "-C", "-o", full, path)
    h_full = run_cli("histo", full)
    assert h_merged == h_full


def test_disk_mode_matches_direct(reads_fa, tmp_path):
    """--disk dump+merge must equal in-memory counting (the reference's
    parallel_hashing.sh/merge.sh --disk invariant)."""
    path, _ = reads_fa
    direct = str(tmp_path / "direct.jf")
    run_cli("count", "-m", str(K), "-s", "100k", "-C", "-o", direct, path)
    disk = str(tmp_path / "disk.jf")
    run_cli("count", "-m", str(K), "-s", "100k", "-C", "--disk", "-o", disk, path)
    kd, keysd, cntd, _ = read_any_jf(direct)
    kk, keysk, cntk, _ = read_any_jf(disk)
    assert kd == kk
    a = {tuple(keysd[i]): int(cntd[i]) for i in range(len(keysd))}
    b = {tuple(keysk[i]): int(cntk[i]) for i in range(len(keysk))}
    assert a == b


def test_mem_roundtrip():
    out = run_cli("mem", "-m", str(K), "-s", "1M")
    bytes_ = int(out.split()[0])
    out2 = run_cli("mem", "-m", str(K), "--mem", str(bytes_))
    size = int(out2.split()[0])
    assert size >= 10**6


def test_info_and_cite(counted_jf):
    out, _ = counted_jf
    info = run_cli("info", out)
    import json

    h = json.loads(info)
    assert h["format"] == "binary/sorted" and h["key_len"] == 2 * K
    assert "PLoS" in run_cli("cite")


def test_bc_then_filtered_count(reads_fa, tmp_path):
    """bc + count --bc two-pass: only mers seen >= 2 times get counted
    (reference count_main.cc filter_bc semantics)."""
    path, seqs = reads_fa
    bcf = str(tmp_path / "f.bc")
    run_cli("bc", "-m", str(K), "-s", "100k", "-f", "0.001", "-C", "-o", bcf, path)
    out = str(tmp_path / "f.jf")
    run_cli("count", "-m", str(K), "-s", "100k", "-C", "--bc", bcf, "-o", out, path)
    _, keys, counts, _ = read_any_jf(out)
    from jasper_tpu.ops.kmer import int_to_kmer, words_to_int

    got = {int_to_kmer(words_to_int(keys[i]), K): int(counts[i]) for i in range(len(keys))}
    oracle = oracle_counts(seqs, K)
    multi = {m: c for m, c in oracle.items() if c >= 2}
    # every true multi-mer is present with its exact count; bloom false
    # positives may add a few singletons (with count 1), never lose multis
    for m, c in multi.items():
        assert got.get(m) == c
    extras = {m for m in got if m not in multi}
    assert len(extras) <= 0.02 * len(oracle) + 5
    assert all(oracle[m] == 1 for m in extras)


def test_min_qual_filter(tmp_path):
    fq = str(tmp_path / "q.fq")
    seq = "ACGTACGTACGTACGTACGT"
    # low-quality base in the middle kills windows covering it
    qual = "I" * 9 + "!" + "I" * 10
    with open(fq, "w") as f:
        f.write(f"@r0\n{seq}\n+\n{qual}\n")
    out = str(tmp_path / "q.jf")
    run_cli("count", "-m", str(K), "-s", "10k", "-C", "-Q", "5", "-o", out, fq)
    _, _, counts, _ = read_any_jf(out)
    # windows of length 15 over 20 bases avoiding position 9: none on the
    # left (need i+15<=9), one block on the right starting at 10 -> 0 windows
    # ... actually 20-10=10 < 15, so nothing survives
    assert len(counts) == 0
