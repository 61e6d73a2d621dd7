"""Count histogram and polishing threshold.

Reproduces two reference behaviors exactly:

  * `jellyfish histo` default bucketing (low=1, high=10000, inc=1; values
    above high lump into the col-10001 bucket; zero bins unprinted —
    reference sub_commands/histo_main.cc:33-90),
  * the threshold walk of reference src/jellyfish.py:8-23 — descend the
    error slope of the histogram, stop at the first local minimum, output
    bin//2; unusable read sets (threshold < 2, or a histogram that never
    rises again) yield None, which the pipeline turns into the reference's
    abort ("local min of kmer counts is smaller than 4",
    src/jasper.sh:200-202).
"""

from __future__ import annotations

import numpy as np

from jasper_tpu.table.kmer_table import table_histogram

HISTO_HIGH = 10000


def histogram_rows(tab, k: int, high: int = HISTO_HIGH) -> list[tuple[int, int]]:
    """Nonzero (col, freq) rows exactly as `jellyfish histo` prints them."""
    hist = np.asarray(table_histogram(tab, max_count=high + 1, k=k))
    return [(int(c), int(hist[c])) for c in range(1, high + 2) if hist[c] > 0]


def histogram_rows_from_counts(counts, high: int = HISTO_HIGH) -> list[tuple[int, int]]:
    """Nonzero (col, freq) rows from a host count array — identical output
    to histogram_rows(tab) but without needing the device table (the count
    path pulls the distinct counts to the host anyway)."""
    c = np.asarray(counts)
    c = c[c > 0]
    clipped = np.minimum(c.astype(np.int64), high + 1)
    hist = np.bincount(clipped, minlength=high + 2)
    return [(int(col), int(hist[col]))
            for col in range(1, high + 2) if hist[col] > 0]


def write_histogram(path: str, rows) -> None:
    with open(path, "w") as f:
        for col, freq in rows:
            f.write(f"{col} {freq}\n")


def read_histogram(path: str) -> list[tuple[int, int]]:
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if parts:
                rows.append((int(parts[0]), int(parts[-1])))
    return rows


def threshold_from_histogram(rows) -> int | None:
    """First-local-minimum threshold (reference src/jellyfish.py walk).

    The reference reads `row[-1]` as the frequency and `row[0]` as the bin;
    `count` starts at the first row's frequency and the walk begins at the
    second row. Returns None where the reference exits(1) or produces no
    output.
    """
    count = -1
    threshold = 0
    for col, freq in rows:
        if count == -1:
            count = freq
        else:
            if count >= freq:
                count = freq
                threshold = col // 2
            else:  # found local min
                if threshold < 2:
                    return None
                return threshold
    return None  # never rose again: empty output in the reference
