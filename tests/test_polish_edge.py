"""Edge-case byte-parity: N runs, sub-k contigs, errors at position ~0,
lowercase contigs, and an absurd threshold where every k-mer is 'bad'."""

import numpy as np

from tests import golden_util as G

from jasper_tpu.polish.engine import CountSource
from jasper_tpu.polish.runner import polish_file


def _parity(ref_dir, our_dir, db, host, k, thre, passes):
    res = G.run_reference_jasper(ref_dir, db, ref_dir / "draft.fa", k, thre, passes)
    assert res.returncode == 0, res.stderr
    polish_file(
        str(our_dir / "draft.fa"), CountSource(host), k, thre, passes,
        fout="q.fix.csv", fixedout="q.fixed.fa", workdir=str(our_dir),
    )
    ref_out = G.snapshot_outputs(ref_dir)
    our_out = G.snapshot_outputs(our_dir)
    assert set(ref_out) == set(our_out)
    for name in ref_out:
        assert our_out[name] == ref_out[name], f"{name} differs"


def test_edge_contigs_parity(tmp_path):
    rng = np.random.default_rng(5)
    genome = G.random_genome(rng, 5000)
    reads = G.tiled_reads(genome)
    k = 17
    draft = list(genome)
    draft[1] = {"A": "C", "C": "G", "G": "T", "T": "A"}[draft[1]]
    draft[2500] = {"A": "C", "C": "G", "G": "T", "T": "A"}[draft[2500]]
    for p in range(3000, 3020):
        draft[p] = "N"
    draft = "".join(draft)
    seqs = {
        "ctg1": draft,
        "tiny": "ACGTACG",  # shorter than k: negative k-mer tally contribution
        "ctg2": genome[:600],
        "lower": genome[1000:1600].lower(),
    }
    (ref_dir := tmp_path / "ref").mkdir()
    (our_dir := tmp_path / "ours").mkdir()
    db = tmp_path / "db.jf"
    host = G.build_db(reads, k, db)
    for d in (ref_dir, our_dir):
        G.write_fasta_file(d / "draft.fa", seqs)
    _parity(ref_dir, our_dir, db, host, k, 10, 2)


def test_absurd_threshold_parity(tmp_path):
    """threshold far above every count: the whole contig is 'bad'."""
    rng = np.random.default_rng(6)
    genome = G.random_genome(rng, 1200)
    reads = G.tiled_reads(genome)
    k = 17
    (ref_dir := tmp_path / "ref").mkdir()
    (our_dir := tmp_path / "ours").mkdir()
    db = tmp_path / "db.jf"
    host = G.build_db(reads, k, db)
    for d in (ref_dir, our_dir):
        G.write_fasta_file(d / "draft.fa", {"ctg1": genome[:800]})
    _parity(ref_dir, our_dir, db, host, k, 100000, 1)
