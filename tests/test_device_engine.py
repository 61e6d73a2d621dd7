"""DevicePolishEngine equivalence: the device-flagged scan + host repair
must produce byte-identical results to the pure-host reference-exact
PolishEngine on every input class (clean, substitutions, indels, N runs,
low-coverage drops, contig boundaries)."""

import numpy as np
import pytest

from tests import golden_util as G

from jasper_tpu.count.counter import count_sequences
from jasper_tpu.polish.device_engine import DevicePolishEngine, DeviceScanner
from jasper_tpu.polish.engine import CountSource, PolishEngine
from jasper_tpu.polish.runner import polish_file
from jasper_tpu.table.host_table import HostKmerTable

K = 25
THRE = 3


def build(genome_len=9000, seed=5, read_len=150, stride=2):
    rng = np.random.default_rng(seed)
    genome = G.random_genome(rng, genome_len)
    tab = count_sequences(G.tiled_reads(genome, read_len=read_len, stride=stride), K)
    host = HostKmerTable(K, np.asarray(tab))
    return genome, tab, host, rng


def run_both(seqs, tab, host, passes=2, fix=True):
    host_counts = CountSource(host)
    ref = PolishEngine(host_counts, K, THRE)
    dev = DevicePolishEngine(
        CountSource(host), K, THRE, scanner=DeviceScanner(tab, K, tile=1 << 12)
    )
    got_ref, got_dev = dict(seqs), dict(seqs)
    for _ in range(passes):
        r = ref.run_pass(got_ref, fix)
        d = dev.run_pass(got_dev, fix)
        assert r.seqs == d.seqs
        assert r.total_wrong_kmers == d.total_wrong_kmers
        assert r.total_kmers == d.total_kmers
        assert [
            (f.contig, f.coord, f.mutation, f.original) for f in r.fixes
        ] == [(f.contig, f.coord, f.mutation, f.original) for f in d.fixes]
        got_ref, got_dev = r.seqs, d.seqs
    return got_ref


def test_clean_draft_untouched():
    genome, tab, host, _ = build()
    out = run_both({"c": genome}, tab, host, passes=1)
    assert out["c"] == genome


def test_substitution_errors_fixed():
    genome, tab, host, rng = build()
    draft, _ = G.inject_errors(genome, rng, n_each=1, spacing=1500)
    out = run_both({"c": draft}, tab, host, passes=2)
    assert out["c"] == genome


def test_indel_errors_shift_mapping():
    genome, tab, host, rng = build(seed=6)
    # hand-inject insertions and deletions to exercise the suffix-shift path
    draft = genome[:2000] + "G" + genome[2000:5000] + genome[5001:]
    out = run_both({"c": draft}, tab, host, passes=2)
    assert out["c"] == genome


def test_n_runs_and_invalid_chars():
    genome, tab, host, rng = build(seed=7)
    draft = (
        genome[:1500] + "NNNNN" + genome[1500:3000] + "n" + genome[3000:4500]
        + "R" + genome[4500:]
    )
    run_both({"c": draft}, tab, host, passes=2)


def test_error_near_contig_ends():
    genome, tab, host, rng = build(seed=8)
    draft = ("T" if genome[3] != "T" else "A") .join(
        [genome[:3], genome[4:]]
    )
    tail = list(genome)
    tail[-4] = "C" if tail[-4] != "C" else "G"
    run_both({"head": draft, "tail": "".join(tail)}, tab, host, passes=2)


def test_multi_contig_and_short_contigs():
    genome, tab, host, rng = build(seed=9)
    seqs = {
        "a": genome[:4000],
        "tiny": genome[100:120],  # shorter than k
        "b": genome[4000:],
    }
    run_both(seqs, tab, host, passes=1)


@pytest.mark.slow
def test_polish_file_device_engine(tmp_path):
    """polish_file wired with the device engine produces the reference
    artifact set."""
    genome, tab, host, rng = build(seed=10)
    draft, _ = G.inject_errors(genome, rng, n_each=1, spacing=2000)
    q = str(tmp_path / "q.fa")
    G.write_fasta_file(q, {"ctg": draft})

    def engine_cls(counts, k, thre):
        return DevicePolishEngine(counts, k, thre, scanner=DeviceScanner(tab, k))

    polish_file(
        q, CountSource(host), K, THRE, passes=1, fix=True, test=True,
        fout="f.csv", fixedout="fixed.fa", workdir=str(tmp_path),
        engine_cls=engine_cls,
    )
    from jasper_tpu.io.fastx import read_fasta

    fixed = read_fasta(str(tmp_path / "_iter0_fixed.fa"))
    assert fixed["ctg"] == genome
