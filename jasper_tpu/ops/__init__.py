from jasper_tpu.ops import codes, kmer, hashing, gf2  # noqa: F401
