#!/usr/bin/env python
"""Headline benchmark: device k-mer lookup throughput in the polishing scan.

Prints ONE JSON line:
  {"metric": "kmer_lookups_per_sec", "value": N, "unit": "lookups/s",
   "vs_baseline": R}

The measured op is jasper_tpu.polish.window.scan_window — canonical window
extraction + batched HBM count-table probe + threshold classification — on a
realistic workload: a table holding the canonical 37-mers of a synthetic
genome, scanned over a mutated draft (~0.1% substitutions), so probes are a
mix of hits and misses like real polishing.

vs_baseline compares against the reference's query path measured on this
host (jellyfish binary_query_base interpolated binary search via the real
SWIG module, scaled to the reference's default 16-thread deployment); the
measured constant lives in bench_baseline.json (see tools/measure_baseline.py).
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

GENOME_BASES = 4_000_000
TILE = 1 << 20  # windows per device call
ITERS = 8
K = 37
DEFAULT_BASELINE_LOOKUPS_PER_SEC = 16 * 1.1e6  # estimate; overridden by file


def load_baseline():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
        return float(data.get("cpu_lookups_per_sec_16t", DEFAULT_BASELINE_LOOKUPS_PER_SEC))
    return DEFAULT_BASELINE_LOOKUPS_PER_SEC


def main():
    import jax
    import jax.numpy as jnp

    from jasper_tpu.ops.kmer import canonical_windows
    from jasper_tpu.polish.window import scan_window
    from jasper_tpu.table.kmer_table import empty_table, insert_kmers, slots_for

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=GENOME_BASES).astype(np.uint8)

    # build the table from the genome's canonical k-mers
    n_slots = slots_for(GENOME_BASES, 0.5)
    tab = empty_table(K, n_slots)
    insert = jax.jit(insert_kmers, donate_argnums=0)
    step = TILE
    t_build = time.time()
    for off in range(0, GENOME_BASES - K + 1, step):
        end = min(off + step + K - 1, GENOME_BASES)
        chunk = np.full(step + K - 1, 4, dtype=np.uint8)
        chunk[: end - off] = genome[off:end]
        keys, valid = canonical_windows(jnp, jnp.asarray(chunk), K)
        tab, pend, _ = insert(tab, keys, jnp.full(keys.shape[0], 30, jnp.uint32), valid)
    jax.block_until_ready(tab)
    t_build = time.time() - t_build
    assert int(pend) == 0

    # draft with ~0.1% substitutions
    draft = genome.copy()
    n_err = GENOME_BASES // 1000
    pos = rng.choice(GENOME_BASES, size=n_err, replace=False)
    draft[pos] = (draft[pos] + rng.integers(1, 4, size=n_err)) % 4

    tiles = []
    for off in range(0, GENOME_BASES - TILE - K, TILE):
        tiles.append(jnp.asarray(draft[off : off + TILE + K - 1]))
        if len(tiles) >= 4:
            break
    thre = jnp.uint32(15)

    # warmup/compile
    out = scan_window(tab, tiles[0], thre, k=K)
    jax.block_until_ready(out)

    t0 = time.time()
    n_lookups = 0
    for it in range(ITERS):
        for tile in tiles:
            out = scan_window(tab, tile, thre, k=K)
            n_lookups += TILE
    jax.block_until_ready(out)
    dt = time.time() - t0
    rate = n_lookups / dt

    baseline = load_baseline()
    meta = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "k": K,
        "n_slots": n_slots,
        "n_keys": GENOME_BASES - K + 1,
        "build_secs": round(t_build, 2),
        "bench_secs": round(dt, 3),
        "tile_windows": TILE,
        "baseline_lookups_per_sec": baseline,
    }
    print(json.dumps(meta), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "kmer_lookups_per_sec",
                "value": round(rate),
                "unit": "lookups/s",
                "vs_baseline": round(rate / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
