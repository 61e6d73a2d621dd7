"""jasper.py-flag-compatible polish CLI (jasper_tpu.polish.runner main)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests import golden_util as G

from jasper_tpu.count.counter import count_sequences
from jasper_tpu.io.fastx import read_fasta
from jasper_tpu.io.jf import dump_table_to_jf
from jasper_tpu.table.host_table import HostKmerTable

K = 25


@pytest.fixture
def case(tmp_path):
    rng = np.random.default_rng(9)
    genome = G.random_genome(rng, 8000)
    draft, _ = G.inject_errors(genome, rng, n_each=1, spacing=2500)
    tab = count_sequences(G.tiled_reads(genome, read_len=150, stride=2), K)
    host = HostKmerTable(K, np.asarray(tab))
    db = str(tmp_path / "db.jf")
    dump_table_to_jf(db, host)
    q = str(tmp_path / "query.fa")
    G.write_fasta_file(q, {"ctg": draft})
    return tmp_path, db, q, genome


def test_runner_cli_fixes_errors(case):
    tmp_path, db, q, genome = case
    r = subprocess.run(
        [sys.executable, "-m", "jasper_tpu.polish.runner",
         "--db", db, "-q", q, "--ksize", str(K), "-p", "1",
         "--fix", "--fout", "f.csv", "-ff", "fixed.fa", "--test",
         "-thre", "3"],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo"},
    )
    assert r.returncode == 0, r.stderr
    fixed = read_fasta(str(tmp_path / "_iter0_fixed.fa"))
    assert fixed["ctg"] == genome
    assert os.path.exists(tmp_path / "_iter0_f.csv")
    assert os.path.exists(tmp_path / "0qValCalcHelper.csv")
    assert os.path.exists(tmp_path / "1qValCalcHelper.csv")


def test_runner_cli_bad_db_exits_1(case, tmp_path):
    r = subprocess.run(
        [sys.executable, "-m", "jasper_tpu.polish.runner",
         "--db", "/nonexistent.jf", "-q", "x.fa", "--ksize", str(K)],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo"},
    )
    assert r.returncode == 1
