"""jasper_tpu — a TPU-native genome-assembly polishing framework.

A from-scratch reimplementation of the capabilities of JASPER
(Guo, Salzberg, Zimin, PLoS Comput Biol 2023; reference repo alguoo314/JASPER)
designed for TPUs with JAX/XLA/Pallas:

  * k-mer counting of accurate reads into an HBM-resident open-addressing
    count table (replaces Jellyfish's lock-free CAS hash,
    cf. reference jellyfish-2.3.0 include/jellyfish/large_hash_array.hpp),
  * batched, vectorized k-mer count lookups (replaces the per-call SWIG
    binary search of jellyfish binary_query_base,
    cf. include/jellyfish/binary_dumper.hpp:112-213),
  * an assembly scan + error-repair engine byte-compatible with the
    reference polishing semantics (cf. reference src/jasper.py),
  * a pipeline driver compatible with the reference CLI
    (cf. reference src/jasper.sh),
  * multi-chip scaling via jax.sharding meshes: data-parallel window
    scanning with a replicated or hash-sharded count table.
"""

__version__ = "0.1.0"
