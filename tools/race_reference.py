#!/usr/bin/env python
"""End-to-end race: reference jasper.sh (real jellyfish 2.3.0 + real SWIG
dna_jellyfish, built by tools/build_baseline.sh) vs jasper-tpu, on the same
synthetic E. coli-scale input (BASELINE.json config 1 shape). Asserts
byte-parity of the polished FASTA and fixes.csv, and prints wall-clock JSON
for BASELINE.md "Measured".

The ONE shared component is the Bio.pairwise2 shim (tests/oracle/Bio):
Biopython is not installed and cannot be fetched (zero egress), so both
sides use jasper_tpu.utils.pairwise for nb>k patch alignment — see
PARITY.md "Known residual risk".

Usage: python tools/race_reference.py [genome_kb=2000] [coverage=40]
           [k=25] [passes=2] [--keep]
Work dir: .race/ (gitignored).
"""

import json
import os
import random
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.path.join(REPO, ".baseline")
RACE = os.path.join(REPO, ".race")


def log(msg):
    print(f"[race] {msg}", file=sys.stderr, flush=True)


def make_data(genome_kb: int, coverage: int, seed: int = 7):
    random.seed(seed)
    n = genome_kb * 1000
    genome = "".join(random.choice("ACGT") for _ in range(n))
    # draft with an error every ~4 kb, rotating sub/del/ins
    draft = []
    pos = 0
    kinds = ["sub", "del", "ins"]
    ki = 0
    err_every = 4000
    nxt = 2000
    while pos < n:
        draft.append(genome[pos])
        pos += 1
        if pos == nxt and pos < n - err_every:
            kind = kinds[ki % 3]
            ki += 1
            if kind == "sub":
                draft[-1] = "ACGT"[("ACGT".index(draft[-1]) + 1) % 4]
            elif kind == "del":
                draft.pop()
            else:
                draft.append(random.choice("ACGT"))
            nxt += err_every
    draft = "".join(draft)

    rc = {"A": "T", "C": "G", "G": "C", "T": "A"}
    # error hotspots with mixed probabilities for a sloped histogram
    hot = []
    for _ in range(n // 30):
        p = random.randrange(n)
        b = random.choice([c for c in "ACGT" if c != genome[p]])
        hot.append((p, b, random.uniform(0.005, 0.18) ** 1.5))
    hot.sort()
    read_len = 250
    n_reads = n * coverage // read_len
    asm = os.path.join(RACE, "asm.fa")
    reads = os.path.join(RACE, "reads.fq")
    with open(asm, "w") as f:
        f.write(">ctg1\n")
        for off in range(0, len(draft), 70):
            f.write(draft[off : off + 70] + "\n")
    import bisect

    positions = [h[0] for h in hot]
    with open(reads, "w") as f:
        for i in range(n_reads):
            s = random.randrange(0, n - read_len)
            r = list(genome[s : s + read_len])
            lo = bisect.bisect_left(positions, s)
            hi = bisect.bisect_left(positions, s + read_len)
            for p, b, prob in hot[lo:hi]:
                if random.random() < prob:
                    r[p - s] = b
            r = [
                "ACGT"[random.randrange(4)] if random.random() < 0.002 else c
                for c in r
            ]
            r = "".join(r)
            if i % 2:
                r = "".join(rc[c] for c in reversed(r))
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    return asm, reads


def setup_pyenv():
    """One dir serving jasper.sh's single-path $PYTHONPATH contract:
    jellyfish.py (threshold script) + real dna_jellyfish + Bio shim."""
    pyenv = os.path.join(RACE, "pyenv")
    os.makedirs(pyenv, exist_ok=True)
    for src in (
        os.path.join(BASE, "jasper/src/jellyfish.py"),
        os.path.join(BASE, "pysite/dna_jellyfish.py"),
        os.path.join(BASE, "pysite/_dna_jellyfish.so"),
    ):
        shutil.copy(src, pyenv)
    shutil.copytree(
        os.path.join(REPO, "tests/oracle/Bio"),
        os.path.join(pyenv, "Bio"),
        dirs_exist_ok=True,
    )
    return pyenv


def run_reference(asm, reads, k, passes, threads, batch):
    wd = os.path.join(RACE, "ref")
    os.makedirs(wd, exist_ok=True)
    pyenv = setup_pyenv()
    env = dict(os.environ)
    env["PATH"] = os.path.join(BASE, "install/bin") + os.pathsep + env["PATH"]
    env["PYTHONPATH"] = pyenv
    env["JASPER_TPU_ROOT"] = REPO
    t0 = time.time()
    r = subprocess.run(
        ["bash", os.path.join(BASE, "jasper/src/jasper.sh"),
         "-a", asm, "-r", reads, "-k", str(k), "-p", str(passes),
         "-t", str(threads), "-b", str(batch)],
        cwd=wd, env=env, capture_output=True, text=True,
    )
    dt = time.time() - t0
    if r.returncode != 0:
        log("reference FAILED:\n" + r.stdout[-3000:] + r.stderr[-3000:])
        raise SystemExit(1)
    log(f"reference done in {dt:.1f}s")
    return wd, dt, r.stdout


def run_ours(asm, reads, k, passes, threads, batch, platform=None):
    wd = os.path.join(RACE, "tpu")
    os.makedirs(wd, exist_ok=True)
    t0 = time.time()
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    sys.path.insert(0, REPO)
    from jasper_tpu.pipeline.driver import run_pipeline

    res = run_pipeline(
        assembly=asm, reads=[reads], k=k, threads=threads, passes=passes,
        batch=batch, workdir=wd,
    )
    dt = time.time() - t0
    log(f"jasper-tpu done in {dt:.1f}s")
    return wd, dt, res


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    keep = "--keep" in sys.argv
    genome_kb = int(args[0]) if len(args) > 0 else 2000
    coverage = int(args[1]) if len(args) > 1 else 40
    k = int(args[2]) if len(args) > 2 else 25
    passes = int(args[3]) if len(args) > 3 else 2
    threads = int(args[4]) if len(args) > 4 else 16
    batch = 25_000_000  # one batch both sides: identical boundary quirk

    if not os.path.exists(os.path.join(BASE, "install/bin/jellyfish")):
        log("run tools/build_baseline.sh first")
        raise SystemExit(2)
    if os.path.exists(RACE) and not keep:
        shutil.rmtree(RACE)
    os.makedirs(RACE, exist_ok=True)
    log(f"generating {genome_kb} kb genome at {coverage}x")
    asm, reads = make_data(genome_kb, coverage)

    ref_wd, ref_s, ref_out = run_reference(asm, reads, k, passes, threads, batch)
    tpu_wd, tpu_s, _ = run_ours(asm, reads, k, passes, 1, batch)

    def slurp(d, name):
        with open(os.path.join(d, name), "rb") as f:
            return f.read()

    pol_ref = slurp(ref_wd, "asm.fa.polished.fasta")
    pol_tpu = slurp(tpu_wd, "asm.fa.polished.fasta")
    fix_ref = slurp(ref_wd, "asm.fa.fixes.csv")
    fix_tpu = slurp(tpu_wd, "asm.fa.fixes.csv")
    import re

    qv_ref = re.findall(rb"Q value = ([0-9.]+|Inf)", ref_out.encode())
    result = {
        "genome_kb": genome_kb, "coverage": coverage, "k": k,
        "passes": passes, "ref_threads": threads,
        "ref_secs": round(ref_s, 1), "tpu_secs": round(tpu_s, 1),
        "speedup": round(ref_s / tpu_s, 2),
        "polished_identical": pol_ref == pol_tpu,
        "fixes_identical": fix_ref == fix_tpu,
        "ref_qv": [q.decode() for q in qv_ref],
    }
    print(json.dumps(result))
    if not (result["polished_identical"] and result["fixes_identical"]):
        log("PARITY FAILURE — outputs differ")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
