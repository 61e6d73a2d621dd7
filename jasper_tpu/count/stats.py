"""Database statistics + memory sizing.

`stats_from_counts` mirrors `jellyfish stats` (reference
sub_commands/stats_main.cc:33-46): Unique / Distinct / Total / Max over
counts within [low, high]. `table_mem_bytes` / `table_size_for_mem` answer
`jellyfish mem`'s two questions (sub_commands/mem_main.cc:41-53) for the
TPU table layout: memory is n_buckets * 128 uint32 rows (full key + count
per slot; see jasper_tpu.table.kmer_table), not the reference's bit-packed
quotiented layout — so the numbers are for THIS framework's table.
"""

from __future__ import annotations

import numpy as np

from jasper_tpu.ops.kmer import words_per_kmer
from jasper_tpu.table.kmer_table import PAD_BUCKETS, ROW_U32, slot_words_for, slots_for

U64_MAX = int(np.uint64(0xFFFFFFFFFFFFFFFF))


def stats_from_counts(counts: np.ndarray, low: int = 0, high: int = U64_MAX) -> dict:
    """-> {"Unique", "Distinct", "Total", "Max_count"} over counts in [low, high]."""
    counts = np.asarray(counts, dtype=np.uint64)
    sel = counts[(counts >= np.uint64(low)) & (counts <= np.uint64(high))]
    return {
        "Unique": int((sel == 1).sum()),
        "Distinct": int(len(sel)),
        "Total": int(sel.sum()),
        "Max_count": int(sel.max()) if len(sel) else 0,
    }


def stats_from_jf(path: str, low: int = 0, high: int = U64_MAX) -> dict:
    from jasper_tpu.io.jf import read_any_jf

    _, _, counts, _ = read_any_jf(path)
    return stats_from_counts(counts, low, high)


def table_mem_bytes(k: int, size: int, load_factor: float = 0.8) -> int:
    """HBM bytes of the device count table holding `size` distinct k-mers."""
    W = words_per_kmer(k)
    sw = slot_words_for(W)
    n_slots = slots_for(size, load_factor)
    n_buckets = max(1, n_slots // (ROW_U32 // sw))
    return (n_buckets + PAD_BUCKETS) * ROW_U32 * 4


def table_size_for_mem(k: int, mem_bytes: int, load_factor: float = 0.8) -> int:
    """Largest distinct-k-mer capacity whose table fits in mem_bytes."""
    size = 1
    while table_mem_bytes(k, size * 2, load_factor) <= mem_bytes:
        size *= 2
    # refine within the last octave
    lo, hi = size, size * 2
    while lo + 1 < hi:
        mid = (lo + hi) // 2
        if table_mem_bytes(k, mid, load_factor) <= mem_bytes:
            lo = mid
        else:
            hi = mid
    return lo


def add_suffix(val: int, base: int) -> str:
    """Human-size string like the reference's add_suffix (mem_main.cc:24-38)."""
    suffixes = ["k", "M", "G", "T", "P", "E"]
    x = float(val)
    i = 0
    while x >= base and i < len(suffixes):
        x /= base
        i += 1
    s = f"{x:g}"
    return s + (suffixes[i - 1] if i > 0 else "")
