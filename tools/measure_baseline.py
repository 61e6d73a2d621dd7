#!/usr/bin/env python
"""Measure the REFERENCE query-path throughput on this host.

Uses the real jellyfish 2.3.0 binary + SWIG dna_jellyfish module built under
.baseline/ (from the tarball bundled in the reference repo). Produces
bench_baseline.json with:
  cpu_lookups_per_sec_1t  — qf[MerDNA(s).get_canonical()] rate, single thread
                            (the exact inner op of reference src/jasper.py:70)
  cpu_lookups_per_sec_16t — x16 (the reference's xargs -P process model
                            scales linearly; each process mmaps the same db)
"""
import json, os, subprocess, sys, time
import numpy as np

BASE = "/root/repo/.baseline"
JF = f"{BASE}/install/bin/jellyfish"
sys.path.insert(0, f"{BASE}/pysite")

def main():
    rng = np.random.default_rng(0)
    work = f"{BASE}/work"
    os.makedirs(work, exist_ok=True)
    genome = "".join(np.array(list("ACGT"))[rng.integers(0, 4, size=4_000_000)])
    reads_path = f"{work}/reads.fa"
    if not os.path.exists(reads_path):
        with open(reads_path, "w") as f:
            for i, s in enumerate(range(0, len(genome) - 150, 50)):  # ~3x + errors
                f.write(f">r{i}\n{genome[s:s+150]}\n")
    db = f"{work}/counts37.jf"
    if not os.path.exists(db):
        t0 = time.time()
        subprocess.run([JF, "count", "-C", "-m", "37", "-s", "50M", "-t", "8",
                        "-o", db, reads_path], check=True)
        print("count time:", round(time.time()-t0, 2), "s", file=sys.stderr)

    import dna_jellyfish as jf
    qf = jf.QueryMerFile(db)
    # mixed hit/miss queries like polishing: genome windows + mutated
    draft = list(genome[:500_000])
    pos = rng.choice(len(draft)-40, size=len(draft)//1000, replace=False)
    for p in pos:
        draft[p] = "ACGT"[rng.integers(0,4)]
    draft = "".join(draft)
    N = 200_000
    t0 = time.time()
    tot = 0
    for i in range(N):
        mer = jf.MerDNA(draft[i:i+37])
        mer.canonicalize()
        tot += qf[mer]
    dt = time.time() - t0
    rate = N / dt
    print(f"1-thread rate: {rate:.0f} lookups/s (checksum {tot})", file=sys.stderr)
    out = {
        "cpu_lookups_per_sec_1t": rate,
        "cpu_lookups_per_sec_16t": rate * 16,
        "host": os.uname().nodename,
        "notes": "real jellyfish 2.3.0 SWIG QueryMerFile on 4Mb synthetic genome, "
                 "k=37, mixed hit/miss; 16t = xargs -P16 process model",
    }
    with open("/root/repo/bench_baseline.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))

if __name__ == "__main__":
    main()
