from jasper_tpu.bloom.bloom import BloomCounter2, BloomFilter1, BloomHashPair, opt_k, opt_m
from jasper_tpu.bloom.io import load_bloom_counter, write_bloom_counter

__all__ = [
    "BloomCounter2",
    "BloomFilter1",
    "BloomHashPair",
    "opt_k",
    "opt_m",
    "load_bloom_counter",
    "write_bloom_counter",
]
