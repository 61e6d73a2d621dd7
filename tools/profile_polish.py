#!/usr/bin/env python
"""Profile the polish stage on the chip: per-pass breakdown of
scanner.prepare (device scan + downloads) vs the host replay loop vs repair
scoring, on a synthetic draft with a realistic error density.

Usage: python tools/profile_polish.py [genome_kb=2000] [k=25] [err_every=4000]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    genome_kb = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    err_every = int(sys.argv[3]) if len(sys.argv) > 3 else 4000

    from jasper_tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from jasper_tpu.ops.codes import encode
    from jasper_tpu.ops.kmer import canonical_windows_fast
    from jasper_tpu.polish.device_engine import DevicePolishEngine, DeviceScanner
    from jasper_tpu.polish.engine import CountSource
    from jasper_tpu.table.host_table import HostKmerTable
    from jasper_tpu.table.build import build_table
    from jasper_tpu.count.sorted_runs import make_run_ones

    rng = np.random.default_rng(0)
    n = genome_kb * 1000
    LUT = np.array(list("ACGT"))
    gcodes = rng.integers(0, 4, size=n).astype(np.uint8)
    genome = "".join(LUT[gcodes])
    draft = list(genome)
    for pos in range(err_every // 2, n - err_every, err_every):
        draft[pos] = "ACGT"[(gcodes[pos] + 1) % 4]
    draft = "".join(draft)

    # table = genome k-mers at depth 40
    keys, valid = canonical_windows_fast(jnp, jnp.asarray(gcodes), k)
    h, kk, cc = make_run_ones(keys, valid)
    run = (h, kk, cc * jnp.uint32(40), int(jnp.sum(cc > 0)))
    tab = build_table(run, k)
    host = HostKmerTable(k, np.asarray(tab))
    print(f"table ready: {run[3]} keys", file=sys.stderr)

    scanner = DeviceScanner(tab, k)
    counts = CountSource(host)
    eng = DevicePolishEngine(counts, k, solid_threshold=5, scanner=scanner)

    # warm compile
    t0 = time.time()
    scanner.prepare(draft[: 1 << 20], 5)
    print(f"scan compile+first: {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    arrays = scanner.prepare(draft, 5)
    t_prep = time.time() - t0
    print(f"prepare({n} bases): {t_prep*1e3:.0f} ms "
          f"({n/t_prep/1e6:.1f} Mwin/s), flagged={int(arrays.unsafe.sum())}",
          file=sys.stderr)

    t0 = time.time()
    res = eng.run_pass({"c": draft}, fix=True)
    t_pass = time.time() - t0
    print(f"full pass (prepare+replay+repairs): {t_pass*1e3:.0f} ms, "
          f"fixes={len(res.fixes)} wrong={res.total_wrong_kmers}",
          file=sys.stderr)

    # replay-only estimate: second pass over the FIXED sequence (clean)
    t0 = time.time()
    res2 = eng.run_pass(res.seqs, fix=True)
    t_clean = time.time() - t0
    print(f"clean pass: {t_clean*1e3:.0f} ms fixes={len(res2.fixes)}",
          file=sys.stderr)

    import json

    print(json.dumps({
        "genome_kb": genome_kb, "k": k,
        "prepare_ms": round(t_prep * 1e3),
        "pass_ms": round(t_pass * 1e3),
        "clean_pass_ms": round(t_clean * 1e3),
        "fixes": len(res.fixes),
        "windows_per_sec": round(n / t_prep),
    }))


if __name__ == "__main__":
    main()
