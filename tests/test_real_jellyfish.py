"""Interop + golden tests against REAL jellyfish 2.3.0 (built from the
tarball bundled in the reference repo into .baseline/ — see
tools/measure_baseline.py). These validate:

  * .jf files: ours readable by real jellyfish, theirs by us,
  * the oracle shim's MerDNA semantics against the real SWIG module,
  * byte-identical polishing vs reference jasper.py running on the REAL
    dna_jellyfish (not the shim).

Skipped when .baseline/ hasn't been built (e.g. the CI driver)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests import golden_util as G

BASE = str(G.REPO / ".baseline")
JF_BIN = f"{BASE}/install/bin/jellyfish"
PYSITE = f"{BASE}/pysite"

pytestmark = pytest.mark.skipif(
    not os.path.exists(JF_BIN), reason="real jellyfish not built (.baseline)"
)


def _count_real(reads_path, k, out_db):
    subprocess.run(
        [JF_BIN, "count", "-C", "-m", str(k), "-s", "10M", "-t", "4",
         "-o", out_db, str(reads_path)],
        check=True,
    )


def test_jf_cross_reads(tmp_path):
    """Count the same reads with real jellyfish and with jasper_tpu; the
    (key -> count) maps must be identical, both via our reader on their file
    and their query binary on our file."""
    rng = np.random.default_rng(4)
    genome = G.random_genome(rng, 30000)
    reads = G.tiled_reads(genome, read_len=100, stride=7)
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    k = 21

    their_db = str(tmp_path / "theirs.jf")
    _count_real(fa, k, their_db)

    from jasper_tpu.io.jf import dump_table_to_jf, read_jf
    from jasper_tpu.table import HostKmerTable

    host = G.build_db(reads, k, tmp_path / "ours.jf", n_slots=1 << 17)

    k2, keys2, counts2, _ = read_jf(their_db)
    assert k2 == k
    ours = dict(zip((kk.tobytes() for kk in host.items()[0]),
                    (int(c) for c in host.items()[1])))
    theirs = dict(zip((kk.tobytes() for kk in keys2), (int(c) for c in counts2)))
    assert ours == theirs

    # their binary reads our file: stats must agree with our table
    out = subprocess.run([JF_BIN, "stats", str(tmp_path / "ours.jf")],
                         capture_output=True, text=True, check=True)
    stats = dict(
        line.split(":") for line in out.stdout.strip().split("\n")
    )
    from jasper_tpu.table.kmer_table import table_stats
    import jax.numpy as jnp

    uniq = sum(1 for c in theirs.values() if c == 1)
    assert int(stats["Distinct"].strip()) == len(theirs)
    assert int(stats["Unique"].strip()) == uniq


def test_shim_matches_real_swig(tmp_path):
    """The oracle shim's query semantics (partial fill + A padding +
    canonicalization) must equal the real SWIG module's on adversarial
    strings: short, empty, N-containing, lowercase, overlong."""
    rng = np.random.default_rng(5)
    genome = G.random_genome(rng, 5000)
    reads = G.tiled_reads(genome)
    k = 17
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    db = str(tmp_path / "db.jf")
    _count_real(fa, k, db)

    env_code = f"""
import sys
sys.path.insert(0, {PYSITE!r})
import dna_jellyfish as jf
qf = jf.QueryMerFile({db!r})
jf.MerDNA.k({k})
import json
queries = json.load(open({str(tmp_path / 'q.json')!r}))
out = []
for s in queries:
    out.append(qf[jf.MerDNA(s).get_canonical()])
json.dump(out, open({str(tmp_path / 'out.json')!r}, 'w'))
"""
    import json

    queries = []
    for i in range(0, 400, 7):
        queries.append(genome[i : i + k])  # exact
    queries += [
        "", "A", "ACGT", genome[:k - 1], genome[: k + 5],
        genome[10:20] + "N" + genome[20:26],
        genome[100 : 100 + k].lower(),
        "N" * k, genome[50 : 50 + k - 1] + "X",
    ]
    (tmp_path / "q.json").write_text(json.dumps(queries))
    subprocess.run([sys.executable, "-c", env_code], check=True)
    real = json.load(open(tmp_path / "out.json"))

    sys.path.insert(0, str(G.REPO / "tests" / "oracle"))
    os.environ["JASPER_TPU_ROOT"] = str(G.REPO)
    import dna_jellyfish as shim

    # fresh shim instance on the same db
    qf = shim.QueryMerFile(db)
    got = [qf[shim.MerDNA(s).get_canonical()] for s in queries]
    assert got == real, list(zip(queries, got, real))[:10]


def test_golden_vs_real_jasper(tmp_path):
    """Reference jasper.py on the REAL dna_jellyfish vs our engine on the
    same real-jellyfish-produced database: byte-identical artifacts."""
    rng = np.random.default_rng(6)
    genome = G.random_genome(rng, 9000)
    reads = G.tiled_reads(genome)
    draft, _ = G.inject_errors(genome, rng, n_each=2, spacing=400)
    k = 17
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    db = str(tmp_path / "db.jf")
    _count_real(fa, k, db)

    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()
    for d in (ref_dir, our_dir):
        G.write_fasta_file(d / "draft.fa", {"ctg1": draft})

    env = dict(os.environ)
    # real dna_jellyfish first; oracle dir only for the Bio stub
    env["PYTHONPATH"] = PYSITE + os.pathsep + str(G.ORACLE)
    env["JASPER_TPU_ROOT"] = str(G.REPO)
    res = subprocess.run(
        [sys.executable, str(G.REFERENCE_JASPER),
         "--db", db, "--query", str(ref_dir / "draft.fa"),
         "--ksize", str(k), "-p", "2", "--fix",
         "--fout", "q.fix.csv", "-ff", "q.fixed.fa", "--test", "-thre", "10"],
        cwd=str(ref_dir), env=env, capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stdout + res.stderr

    from jasper_tpu.io.jf import load_jf_into_host_table
    from jasper_tpu.polish.engine import CountSource
    from jasper_tpu.polish.runner import polish_file

    host, _ = load_jf_into_host_table(db)
    polish_file(
        str(our_dir / "draft.fa"), CountSource(host), k, 10, 2,
        fout="q.fix.csv", fixedout="q.fixed.fa", workdir=str(our_dir),
    )
    ref_out = G.snapshot_outputs(ref_dir)
    our_out = G.snapshot_outputs(our_dir)
    assert set(ref_out) == set(our_out)
    for name in ref_out:
        assert our_out[name] == ref_out[name], f"{name} differs"


def test_mem_formula_matches_real_binary():
    """The ported `jellyfish mem` formula (count/stats.py
    jellyfish_mem_bytes) is digit-exact vs the real binary across mer
    lengths, sizes and counter widths, both directions."""
    from jasper_tpu.count.stats import jellyfish_mem_bytes, jellyfish_size_for_mem

    for m, s, c in [(37, 1000, 7), (37, 10**9, 7), (25, 123456789, 7),
                    (101, 10**6, 3), (15, 5000, 7), (55, 77777, 5),
                    (21, 1, 1), (240, 10**7, 7)]:
        out = subprocess.run(
            [JF_BIN, "mem", "-m", str(m), "-s", str(s), "-c", str(c)],
            capture_output=True, text=True, check=True,
        ).stdout
        assert int(out.split()[0]) == jellyfish_mem_bytes(m, s, c), (m, s, c)

    for m, mem in [(37, 16 << 30), (25, 1 << 20), (101, 123456789)]:
        out = subprocess.run(
            [JF_BIN, "mem", "-m", str(m), "--mem", str(mem)],
            capture_output=True, text=True, check=True,
        ).stdout
        assert int(out.split()[0]) == jellyfish_size_for_mem(m, mem), (m, mem)
