"""Multi-pass polishing driver — file-level parity with reference jasper.py.

Reproduces the reference main/iteration orchestration (src/jasper.py:12-137)
byte-for-byte:

  * passes p fixing iterations + 1 final QV-only scan,
  * per-iteration fix CSV named by the reference's os.path.split mangling
    (head + "_iter{ite}_" + tail, j.py:48-49) — written with csv.writer
    delimiter=' ' and its default CRLF line terminator,
  * the CSV header labels 'Original','Mutation' with data columns actually
    ordered (mutation, original) — a reference quirk kept as-is
    (j.py:115 vs j.py:219),
  * '{ite}qValCalcHelper.csv' appended with "wrong total" on the first and
    last iteration when test=True (j.py:107-111),
  * 60-column fixed FASTA written on the final iteration when fixing was
    requested (j.py:120-128).
"""

from __future__ import annotations

import csv
import os

from jasper_tpu.io.fastx import read_fasta
from jasper_tpu.polish.engine import CountSource, PolishEngine


def _iter_name(path: str, ite: int) -> str:
    head, tail = os.path.split(path)
    return head + "_iter" + str(ite) + "_" + tail


def polish_file(
    query_path: str,
    counts: CountSource,
    k: int,
    threshold: int,
    passes: int,
    fix: bool = True,
    test: bool = True,
    fout: str = "fout.csv",
    fixedout: str = "fixed_seq.fasta",
    workdir: str = ".",
    seqs: dict[str, str] | None = None,
    engine_cls=PolishEngine,
):
    """Run `passes` fixing iterations + one QV scan over a FASTA file.

    Writes the same artifact set as reference jasper.py. Returns the final
    sequence dict.
    """
    engine = engine_cls(counts, k, threshold)
    user_fix_choice = fix
    if seqs is None:
        seqs = read_fasta(query_path)
    final_fixedout = fixedout
    for ite in range(passes + 1):
        ite_fix = fix
        if ite == passes:
            ite_fix = False
            final_fixedout = _iter_name(fixedout, ite - 1)
        result = engine.run_pass(seqs, ite_fix)
        seqs = result.seqs

        if test and (ite == 0 or ite == passes):
            helper = os.path.join(workdir, f"{ite}qValCalcHelper.csv")
            with open(helper, "a") as f:
                f.write(f"{result.total_wrong_kmers} {result.total_kmers}\n")

        if ite_fix:
            ite_fout = os.path.join(workdir, _iter_name(fout, ite))
            with open(ite_fout, "w") as f:
                w = csv.writer(f, delimiter=" ")
                w.writerow(["Contig", "Base_coord", "Original", "Mutation"])
                w.writerows(
                    [r.contig, r.coord, r.mutation, r.original] for r in result.fixes
                )

        if ite == passes and user_fix_choice:
            out_path = os.path.join(workdir, final_fixedout)
            with open(out_path, "w") as f:
                for name, seq in seqs.items():
                    f.write(f">{name}\n")
                    for off in range(0, len(seq), 60):
                        f.write(seq[off : off + 60] + "\n")
    return seqs
