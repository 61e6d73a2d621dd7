"""Global alignment used to derive per-base fix records for gap patches.

The reference calls Biopython `pairwise2.align.globalms(fixed, original,
0, -1, -1, -1)` (reference src/jasper.py:309) — global alignment scoring
match 0, mismatch -1, gap open -1, gap extend -1 (i.e. linear gaps) — and
reads the first reported alignment. This module provides a dependency-free
Needleman-Wunsch equivalent.

Note the alignment only shapes the fix *records* (CSV rows); the polished
sequence itself is spliced from the patch directly (src/jasper.py:312), so
FASTA output is alignment-independent. Tie-breaking among co-optimal
alignments is deterministic here (diagonal > gap-in-second > gap-in-first)
but not guaranteed to match Biopython's enumeration order.
"""

from __future__ import annotations


def globalms(a: str, b: str, match: float = 0, mismatch: float = -1,
             gap_open: float = -1, gap_extend: float = -1):
    """Return [(aligned_a, aligned_b, score, 0, alen)] like pairwise2.

    Only supports gap_open == gap_extend (linear gap penalty), which is all
    the reference uses.
    """
    assert gap_open == gap_extend, "only linear gap penalties supported"
    gap = gap_open
    n, m = len(a), len(b)
    # DP over score matrix; small inputs only (patch regions are < a few kb)
    prev = [j * gap for j in range(m + 1)]
    back = [[0] * (m + 1) for _ in range(n + 1)]  # 0=diag 1=up(gap in b) 2=left(gap in a)
    for j in range(1, m + 1):
        back[0][j] = 2
    for i in range(1, n + 1):
        cur = [i * gap] + [0] * m
        back[i][0] = 1
        for j in range(1, m + 1):
            d = prev[j - 1] + (match if a[i - 1] == b[j - 1] else mismatch)
            u = prev[j] + gap
            l = cur[j - 1] + gap
            best = d
            move = 0
            if u > best:
                best, move = u, 1
            if l > best:
                best, move = l, 2
            cur[j] = best
            back[i][j] = move
        prev = cur
    score = prev[m]
    out_a: list[str] = []
    out_b: list[str] = []
    i, j = n, m
    while i > 0 or j > 0:
        mv = back[i][j]
        if i > 0 and j > 0 and mv == 0:
            out_a.append(a[i - 1])
            out_b.append(b[j - 1])
            i -= 1
            j -= 1
        elif i > 0 and (mv == 1 or j == 0):
            out_a.append(a[i - 1])
            out_b.append("-")
            i -= 1
        else:
            out_a.append("-")
            out_b.append(b[j - 1])
            j -= 1
    aa = "".join(reversed(out_a))
    bb = "".join(reversed(out_b))
    return [(aa, bb, float(score), 0, len(aa))]
