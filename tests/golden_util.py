"""Shared fixtures for golden tests: synthetic genomes, reads, error
injection, and a runner for the UNMODIFIED reference jasper.py driven by the
pure-python oracle shim (tests/oracle)."""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
ORACLE = REPO / "tests" / "oracle"
REFERENCE_JASPER = pathlib.Path("/root/reference/src/jasper.py")

_COMP = str.maketrans("ACGT", "TGCA")


def revcomp(s: str) -> str:
    return s.translate(_COMP)[::-1]


def random_genome(rng, n: int) -> str:
    return "".join(np.array(list("ACGT"))[rng.integers(0, 4, size=n)])


def tiled_reads(genome: str, read_len: int = 100, stride: int = 5, rng=None):
    """Error-free tiling reads (both strands alternating) — deterministic
    coverage ~ 2*read_len/stride in the interior."""
    reads = []
    for i, start in enumerate(range(0, len(genome) - read_len + 1, stride)):
        r = genome[start : start + read_len]
        reads.append(revcomp(r) if i % 2 else r)
    return reads


def inject_errors(genome: str, rng, spec: list[tuple[str, int]] | None = None,
                  n_each: int = 2, spacing: int = 400):
    """Return a draft with injected errors well-separated by `spacing`.

    Error kinds: sub, ins, del, homo_ins (duplicate a base), homo_del
    (drop one copy of a repeated base), cluster (two subs 3 apart).
    Positions are assigned left to right; returns (draft, [(kind, pos)]).
    """
    kinds = ["sub", "ins", "del", "homo_ins", "homo_del", "cluster"] * n_each
    if spec is not None:
        kinds = [k for k, _ in spec]
    draft = list(genome)
    placed = []
    pos = spacing
    out = []
    offset = 0  # coordinate shift applied so far (we edit left->right)
    for kind in kinds:
        if pos + spacing >= len(genome):
            break
        p = pos + offset
        if kind == "sub":
            old = draft[p]
            draft[p] = "ACGT"[("ACGT".index(old) + 1 + rng.integers(0, 3)) % 4]
        elif kind == "ins":
            draft.insert(p, "ACGT"[rng.integers(0, 4)])
            offset += 1
        elif kind == "del":
            del draft[p]
            offset -= 1
        elif kind == "homo_ins":
            draft.insert(p, draft[p])  # duplicate existing base
            offset += 1
        elif kind == "homo_del":
            # force a homopolymer then remove one copy: safer to just drop a
            # base inside any natural repeat; fall back to plain del
            del draft[p]
            offset -= 1
        elif kind == "cluster":
            for dp in (0, 3):
                old = draft[p + dp]
                draft[p + dp] = "ACGT"[("ACGT".index(old) + 1 + rng.integers(0, 3)) % 4]
        elif kind == "gap":
            # scramble a >=k-wide run: every k-mer across it goes bad
            # (nb > k), forcing the reference's base_extension BFS patch
            # (src/jasper.py:527-583)
            for dp in range(20):
                old = draft[p + dp]
                draft[p + dp] = "ACGT"[
                    ("ACGT".index(old) + 1 + rng.integers(0, 3)) % 4
                ]
        out.append((kind, pos))
        pos += spacing
    return "".join(draft), out


def write_fasta_file(path, seqs: dict[str, str], width: int = 70):
    with open(path, "w") as f:
        for name, seq in seqs.items():
            f.write(f">{name}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i : i + width] + "\n")


def build_db(reads, k, jf_path, n_slots=1 << 16):
    """Count reads with jasper_tpu and write a .jf database."""
    import numpy as _np

    from jasper_tpu.count.counter import count_sequences
    from jasper_tpu.io.jf import dump_table_to_jf
    from jasper_tpu.table import HostKmerTable

    tab = count_sequences(reads, k, n_slots=n_slots)
    host = HostKmerTable(k, _np.asarray(tab))
    dump_table_to_jf(str(jf_path), host)
    return host


def run_reference_jasper(workdir, db, query, k, thre, passes,
                         fout="q.fix.csv", ff="q.fixed.fa", timeout=600):
    """Run /root/reference/src/jasper.py with the oracle shim, cwd=workdir."""
    env = dict(os.environ)
    env["PYTHONPATH"] = str(ORACLE)
    env["JASPER_TPU_ROOT"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable,
        str(REFERENCE_JASPER),
        "--db", str(db),
        "--query", str(query),
        "--ksize", str(k),
        "-p", str(passes),
        "--fix",
        "--fout", fout,
        "-ff", ff,
        "--test",
        "-thre", str(thre),
    ]
    return subprocess.run(
        cmd, cwd=str(workdir), env=env, capture_output=True, text=True, timeout=timeout
    )


def snapshot_outputs(d) -> dict[str, bytes]:
    """All polishing artifacts in a directory, by name."""
    out = {}
    for p in sorted(pathlib.Path(d).iterdir()):
        if p.name.startswith("_iter") or p.name.endswith("qValCalcHelper.csv"):
            out[p.name] = p.read_bytes()
    return out
