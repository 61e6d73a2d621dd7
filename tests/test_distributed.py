"""Multi-host pipeline: two real processes under jax.distributed on the CPU
backend, round-robin batch sharding, process-0 join — outputs must byte-
match the single-process run (SURVEY §5 distributed backend)."""

import gzip
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests import golden_util as G


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["JASPER_TPU_ROOT"])
import jax
jax.config.update("jax_platforms", "cpu")
from jasper_tpu.pipeline.driver import run_pipeline
res = run_pipeline(
    assembly=os.environ["ASM"], reads=[os.environ["READS"]],
    k=25, threads=1, passes=1, batch=4000, workdir=os.environ["WD"],
)
print("QVRESULT", repr(res["q_before"]), repr(res["q_after"]))
"""


_COUNT_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["JASPER_TPU_ROOT"])
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jasper_tpu.parallel.distributed import barrier, maybe_init_distributed, my_shard
pid, pcount = maybe_init_distributed()
from jasper_tpu.count.counter import count_reads_to_host
from jasper_tpu.io.jf import write_jf
reads = os.environ["READS"].split(":")
mine = my_shard(reads, pid, pcount)
_, keys, counts = count_reads_to_host(mine, 25)
write_jf(os.path.join(os.environ["WD"], f"shard{pid}.jf"), 25, keys,
         counts.astype(np.uint64))
barrier("count-done")
print("COUNTOK", pid, len(keys))
"""


@pytest.mark.slow
def test_two_process_counting_merges_to_single(tmp_path):
    """P4 parity (VERDICT r4 #7): two hosts under jax.distributed each
    count their shard of the reads; the SUM-merged .jf must byte-match the
    single-process count of all reads. Reference: merge_files SUM semantics
    (jf:jellyfish/merge_files.cc:45-101) behind --disk automerge."""
    rng = np.random.default_rng(33)
    genome = G.random_genome(rng, 9000)
    reads = G.tiled_reads(genome, read_len=120, stride=4)
    paths = []
    for half in (0, 1):
        rf = tmp_path / f"reads{half}.fq"
        with open(rf, "w") as f:
            for i, r in enumerate(reads[half::2]):
                f.write(f"@r{half}_{i}\n{r}\n+\n{'I' * len(r)}\n")
        paths.append(str(rf))

    # single-process truth over both files
    from jasper_tpu.count.counter import count_reads_to_host
    from jasper_tpu.count.merge import merge_jf_files
    from jasper_tpu.io.jf import write_jf

    _, keys, counts = count_reads_to_host(paths, 25)
    single_jf = tmp_path / "single.jf"
    write_jf(str(single_jf), 25, keys, counts.astype(np.uint64))

    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.update(
            JASPER_TPU_ROOT=str(G.REPO),
            JASPER_TPU_COORDINATOR=f"127.0.0.1:{port}",
            JASPER_TPU_NUM_PROCESSES="2",
            JASPER_TPU_PROCESS_ID=str(pid),
            READS=":".join(paths), WD=str(tmp_path),
            JAX_PLATFORMS="cpu",
        )
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _COUNT_WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for p2 in procs:
                p2.kill()
            pytest.fail("distributed counting hung")
        assert p.returncode == 0, out[-3000:]
        assert "COUNTOK" in out

    merged_jf = tmp_path / "merged.jf"
    merge_jf_files([str(tmp_path / "shard0.jf"), str(tmp_path / "shard1.jf")],
                   str(merged_jf), op="sum")
    with open(single_jf, "rb") as f1, open(merged_jf, "rb") as f2:
        assert f1.read() == f2.read()


@pytest.mark.slow
def test_two_process_pipeline_matches_single(tmp_path):
    rng = np.random.default_rng(21)
    genome = G.random_genome(rng, 12000)
    reads = G.tiled_reads(genome, read_len=120, stride=3)
    draft, _ = G.inject_errors(genome, rng, n_each=1, spacing=900)
    asm = tmp_path / "asm.fa"
    G.write_fasta_file(asm, {"chrA": draft, "chrB": genome[2000:5000]})
    rf = tmp_path / "reads.fq.gz"
    with gzip.open(rf, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")

    # single-process reference run
    from jasper_tpu.pipeline.driver import run_pipeline

    wd1 = tmp_path / "single"
    wd1.mkdir()
    run_pipeline(assembly=str(asm), reads=[str(rf)], k=25, threads=1,
                 passes=1, batch=4000, workdir=str(wd1))

    # two-process distributed run (shared workdir)
    wd2 = tmp_path / "multi"
    wd2.mkdir()
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.update(
            JASPER_TPU_ROOT=str(G.REPO),
            JASPER_TPU_COORDINATOR=f"127.0.0.1:{port}",
            JASPER_TPU_NUM_PROCESSES="2",
            JASPER_TPU_PROCESS_ID=str(pid),
            ASM=str(asm), READS=str(rf), WD=str(wd2),
            JAX_PLATFORMS="cpu",
        )
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for p2 in procs:
                p2.kill()
            pytest.fail("distributed pipeline hung")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    for name in ("asm.fa.polished.fasta", "asm.fa.fixes.csv"):
        with open(wd1 / name, "rb") as f1, open(wd2 / name, "rb") as f2:
            assert f1.read() == f2.read(), name

    # every process must report the same non-empty QV strings (the reference
    # prints QV wherever it runs, src/jasper.sh:234-257)
    qvs = set()
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("QVRESULT")]
        assert lines, out[-2000:]
        qvs.add(lines[-1])
    assert len(qvs) == 1, qvs
    qv_line = qvs.pop()
    assert "''" not in qv_line, qv_line
