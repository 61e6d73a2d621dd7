"""Tests for the Biopython-pairwise2-order port in utils/pairwise.py.

Biopython cannot be installed on this image (zero egress), so the port is
locked three ways: (1) the pairwise2 module doctest example is pinned,
(2) structural invariants of pairwise2's enumeration (optimal score, the
canonical gap-adjacency rule, greedy bit order) are property-tested against
an independent brute-force enumerator, (3) first-alignment goldens pin the
tie-break order on adversarial patch/original shapes like the ones
engine.py feeds it (reference src/jasper.py:309).
"""

import itertools
import random

import pytest

from jasper_tpu.utils.pairwise import globalms


def score_of(aa, bb, match, mismatch, gap):
    s = 0
    for x, y in zip(aa, bb):
        if x == "-" or y == "-":
            s += gap
        elif x == y:
            s += match
        else:
            s += mismatch
    return s


def brute_first(a, b, match, mismatch, gap):
    """Independent reference for the first alignment: depth-first greedy
    with pairwise2's branch priority (gap-in-A > diagonal > gap-in-B among
    co-optimal moves) and the col_gap dead-end rule, implemented
    recursively instead of with pairwise2's explicit stack."""
    n, m = len(a), len(b)
    sc = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        sc[i][0] = i * gap
    for j in range(1, m + 1):
        sc[0][j] = j * gap
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            sc[i][j] = max(
                sc[i - 1][j - 1] + (match if a[i - 1] == b[j - 1] else mismatch),
                sc[i][j - 1] + gap,
                sc[i - 1][j] + gap,
            )

    import sys

    sys.setrecursionlimit(10000)

    def walk(i, j, col_gap):
        # returns forward-order (sA, sB) aligning a[:i], b[:j], or None on a
        # dead end. col_gap: the column the CALLER will place immediately to
        # the right is a gap-in-seqB column, so our rightmost column must
        # not be gap-in-seqA (pairwise2's duplicate suppression).
        if i == 0 and j == 0:
            return "", ""
        if i == 0 or j == 0:
            if j and col_gap:
                return None
            if j == 0:
                return a[:i], "-" * i
            return "-" * j, b[:j]
        moves = []
        if sc[i][j] == sc[i][j - 1] + gap:
            moves.append("A")  # gap in seqA
        if sc[i][j] == sc[i - 1][j - 1] + (match if a[i - 1] == b[j - 1] else mismatch):
            moves.append("D")
        if sc[i][j] == sc[i - 1][j] + gap:
            moves.append("B")  # gap in seqB
        order = {"A": 0, "D": 1, "B": 2}
        for mv in sorted(moves, key=order.get):
            if mv == "A":
                if col_gap:
                    continue
                r = walk(i, j - 1, False)
                if r is not None:
                    return r[0] + "-", r[1] + b[j - 1]
            elif mv == "D":
                r = walk(i - 1, j - 1, False)
                if r is not None:
                    return r[0] + a[i - 1], r[1] + b[j - 1]
            else:
                r = walk(i - 1, j, True)
                if r is not None:
                    return r[0] + a[i - 1], r[1] + "-"
        return None

    r = walk(n, m, False)
    assert r is not None
    return r


def test_pairwise2_doctest_example():
    # Biopython pairwise2 module doctest: globalxx("ACCGT", "ACG")
    # first alignment is ACCGT / A-CG- with score 3.
    aa, bb, score, begin, end = globalms("ACCGT", "ACG", 1, 0, 0, 0)[0]
    assert (aa, bb) == ("ACCGT", "A-CG-")
    assert score == 3.0
    assert (begin, end) == (0, 5)


def test_reference_params_basics():
    # the only call shape the reference uses: globalms(patch, orig, 0,-1,-1,-1)
    aa, bb, score, _, _ = globalms("ACGT", "ACGT")[0]
    assert (aa, bb, score) == ("ACGT", "ACGT", 0.0)
    aa, bb, score, _, _ = globalms("AT", "T")[0]
    assert (aa, bb) == ("AT", "-T") and score == -1.0
    aa, bb, score, _, _ = globalms("T", "AT")[0]
    assert (aa, bb) == ("-T", "AT") and score == -1.0


def test_canonical_gap_adjacency():
    # co-optimal mismatch vs gap-pair cases must never emit the forbidden
    # (gap-in-A column)(gap-in-B column) adjacency
    for a, b in [("AC", "CA"), ("ACCA", "AGGA"), ("GATTACA", "GCATGCT")]:
        aa, bb, _, _, _ = globalms(a, b)[0]
        for i in range(len(aa) - 1):
            assert not (aa[i] == "-" and bb[i + 1] == "-"), (aa, bb)


@pytest.mark.parametrize("seed", range(40))
def test_first_alignment_matches_independent_enumerator(seed):
    rng = random.Random(seed)
    n = rng.randrange(1, 12)
    m = rng.randrange(1, 12)
    a = "".join(rng.choice("ACGT") for _ in range(n))
    b = "".join(rng.choice("ACGT") for _ in range(m))
    aa, bb, score, _, _ = globalms(a, b)[0]
    # alignment is valid and optimal
    assert aa.replace("-", "") == a and bb.replace("-", "") == b
    assert len(aa) == len(bb)
    assert score == score_of(aa, bb, 0, -1, -1)
    ra, rb = brute_first(a, b, 0, -1, -1)
    assert (aa, bb) == (ra, rb), (a, b, aa, bb, ra, rb)


@pytest.mark.parametrize("seed", range(20))
def test_indel_pairs_like_engine(seed):
    # adversarial shapes like engine.py's nb>k patches: original region vs
    # patch differing by clustered indels inside repeats
    rng = random.Random(1000 + seed)
    orig = "".join(rng.choice("ACGT") for _ in range(rng.randrange(30, 120)))
    patch = list(orig)
    for _ in range(rng.randrange(1, 6)):
        p = rng.randrange(len(patch))
        if rng.random() < 0.5 and len(patch) > 5:
            del patch[p]
        else:
            patch.insert(p, rng.choice("ACGT"))
    patch = "".join(patch)
    aa, bb, score, _, _ = globalms(patch, orig)[0]
    assert aa.replace("-", "") == patch and bb.replace("-", "") == orig
    assert score == score_of(aa, bb, 0, -1, -1)
    ra, rb = brute_first(patch, orig, 0, -1, -1)
    assert (aa, bb) == (ra, rb)
    for i in range(len(aa) - 1):
        assert not (aa[i] == "-" and bb[i + 1] == "-")
