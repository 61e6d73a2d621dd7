#!/usr/bin/env python
"""Deterministic random sequence generator (dev utility).

Equivalent of the reference's test-fixture builder
(jf:jellyfish/generate_sequence.cc: seeded Mersenne-twister FASTA/FASTQ used
by the golden-output integration tests). Seeded numpy Philox here; same role:
reproducible inputs for golden tests and benchmarks.

  python tools/generate_sequence.py -o prefix -s 42 -l 10000000       # FASTA
  python tools/generate_sequence.py -o prefix -s 42 -q -n 1000 -l 150 # FASTQ
"""

import argparse
import sys

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def gen_fasta(path: str, rng: np.random.Generator, length: int, width: int = 70):
    seq = BASES[rng.integers(0, 4, size=length)].tobytes().decode()
    with open(path, "w") as f:
        f.write(f">read\n")
        for i in range(0, length, width):
            f.write(seq[i : i + width] + "\n")


def gen_fastq(path: str, rng: np.random.Generator, n_reads: int, read_len: int):
    with open(path, "w") as f:
        for i in range(n_reads):
            seq = BASES[rng.integers(0, 4, size=read_len)].tobytes().decode()
            qual = (rng.integers(33, 74, size=read_len).astype(np.uint8)).tobytes().decode()
            f.write(f"@read_{i}\n{seq}\n+\n{qual}\n")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--output", required=True, help="Output path prefix")
    p.add_argument("-s", "--seed", type=int, default=42)
    p.add_argument("-q", "--fastq", action="store_true", help="FASTQ instead of FASTA")
    p.add_argument("-l", "--length", type=int, default=1_000_000,
                   help="Sequence length (FASTA) or read length (FASTQ)")
    p.add_argument("-n", "--n-reads", type=int, default=1000, help="FASTQ read count")
    args = p.parse_args(argv)
    rng = np.random.default_rng(args.seed)
    if args.fastq:
        path = args.output + ".fq"
        gen_fastq(path, rng, args.n_reads, args.length)
    else:
        path = args.output + ".fa"
        gen_fasta(path, rng, args.length)
    print(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
