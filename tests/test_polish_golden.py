"""THE correctness anchor: byte-identical polishing output vs the unmodified
reference jasper.py (driven through the pure-python oracle shim) on synthetic
genomes with injected errors. Covers every fix family: substitution,
insertion, deletion, homopolymer indels, diploid-style clusters, and the
BFS gap patch, across 1 and 2 passes."""

import numpy as np
import pytest

from tests import golden_util as G

from jasper_tpu.polish.engine import CountSource, PolishEngine
from jasper_tpu.polish.runner import polish_file


def _run_case(tmp_path, seed, genome_len, k, passes, thre=None, spec=None,
              n_each=2, spacing=400):
    rng = np.random.default_rng(seed)
    genome = G.random_genome(rng, genome_len)
    reads = G.tiled_reads(genome)
    draft, errors = G.inject_errors(genome, rng, spec=spec, n_each=n_each,
                                    spacing=spacing)

    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    dev_dir = tmp_path / "dev"
    ref_dir.mkdir()
    our_dir.mkdir()
    dev_dir.mkdir()

    db = tmp_path / "db.jf"
    host = G.build_db(reads, k, db)
    if thre is None:
        thre = 10  # interior coverage is ~40x with the tiled reads

    for d in (ref_dir, our_dir, dev_dir):
        G.write_fasta_file(d / "draft.fa", {"ctg1": draft})

    res = G.run_reference_jasper(ref_dir, db, ref_dir / "draft.fa", k, thre, passes)
    assert res.returncode == 0, f"reference failed:\n{res.stdout}\n{res.stderr}"

    counts = CountSource(host)
    polish_file(
        str(our_dir / "draft.fa"), counts, k, thre, passes,
        fix=True, test=True, fout="q.fix.csv", fixedout="q.fixed.fa",
        workdir=str(our_dir),
    )

    # the device-accelerated engine must match the reference byte-for-byte too
    import jax.numpy as jnp

    from jasper_tpu.polish.device_engine import DevicePolishEngine, DeviceScanner

    scanner = DeviceScanner(jnp.asarray(host.tab), k, tile=1 << 12)
    polish_file(
        str(dev_dir / "draft.fa"), CountSource(host), k, thre, passes,
        fix=True, test=True, fout="q.fix.csv", fixedout="q.fixed.fa",
        workdir=str(dev_dir),
        engine_cls=lambda c, kk, t: DevicePolishEngine(c, kk, t, scanner=scanner),
    )

    ref_out = G.snapshot_outputs(ref_dir)
    our_out = G.snapshot_outputs(our_dir)
    dev_out = G.snapshot_outputs(dev_dir)
    assert set(ref_out) == set(our_out), (
        f"artifact sets differ: {set(ref_out) ^ set(our_out)}"
    )
    assert set(ref_out) == set(dev_out)
    for name in ref_out:
        assert our_out[name] == ref_out[name], (
            f"{name} differs:\nREF:\n{ref_out[name][:2000]!r}\n"
            f"OURS:\n{our_out[name][:2000]!r}"
        )
        assert dev_out[name] == ref_out[name], (
            f"{name} differs (device engine):\nREF:\n{ref_out[name][:2000]!r}\n"
            f"DEV:\n{dev_out[name][:2000]!r}"
        )

    # sanity: polishing must actually reduce the wrong-k-mer tally
    if draft != genome:
        wrong_before = int(our_out["0qValCalcHelper.csv"].split()[0])
        wrong_after = int(our_out[f"{passes}qValCalcHelper.csv"].split()[0])
        assert wrong_after < wrong_before, "polishing did not improve the draft"
    return ref_out, errors


@pytest.mark.parametrize("kind", ["sub", "ins", "del", "homo_ins", "cluster"])
def test_golden_single_error_kind(tmp_path, kind):
    _run_case(tmp_path, seed=hash(kind) % 2**31, genome_len=4000, k=17,
              passes=1, spec=[(kind, 0)] * 3)


def test_golden_mixed_errors_one_pass(tmp_path):
    _run_case(tmp_path, seed=7, genome_len=9000, k=17, passes=1, n_each=2)


def test_golden_mixed_errors_two_passes(tmp_path):
    _run_case(tmp_path, seed=8, genome_len=9000, k=17, passes=2, n_each=2)


def test_golden_k25(tmp_path):
    _run_case(tmp_path, seed=9, genome_len=8000, k=25, passes=2, n_each=2)


def test_golden_clean_draft(tmp_path):
    """A draft with no injected errors. (Contig-end coverage droop still
    flags some k-mers below threshold — identically on both sides; the
    assertion that matters is the byte parity inside _run_case.)"""
    ref_out, _ = _run_case(tmp_path, seed=10, genome_len=3000, k=17, passes=1,
                           spec=[])
    helper = ref_out["0qValCalcHelper.csv"].decode()
    wrong, total = helper.split()
    assert int(total) == 3000 - 17 + 1
    assert int(wrong) < 200  # only boundary droop, no real errors


def test_golden_dense_errors(tmp_path):
    """Errors closer together (spacing 150) exercise interacting regions and
    rolling-threshold paths."""
    _run_case(tmp_path, seed=11, genome_len=6000, k=17, passes=2, n_each=3,
              spacing=150)


def test_golden_gap_dense_bfs_patches(tmp_path):
    """Gap-dense draft: >=k-wide scrambled runs every ~350 bp, each forcing
    the BFS patcher (reference base_extension, src/jasper.py:527-583) with
    its batched frontier lookups + pairwise alignment fix records."""
    _ref, errors = _run_case(tmp_path, seed=12, genome_len=8000, k=17,
                             passes=2, spec=[("gap", 0)] * 20, spacing=350)
    assert sum(1 for kind, _ in errors if kind == "gap") >= 15
