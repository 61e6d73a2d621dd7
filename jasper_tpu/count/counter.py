"""Canonical k-mer counting of reads into the device table.

TPU-native equivalent of `jellyfish count -C` (reference
sub_commands/count_main.cc:218-385): instead of N pthreads CAS-inserting
one mer at a time into a shared hash, fixed-size code chunks stream to the
device, every window is extracted/canonicalized in vectorized form, and one
batched insert accumulates the whole chunk (duplicates legal; see
jasper_tpu.table.kmer_table).
"""

from __future__ import annotations

import functools
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from jasper_tpu.io.fastx import stream_codes, total_file_bytes
from jasper_tpu.ops.kmer import canonical_windows
from jasper_tpu.table.kmer_table import empty_table, insert_kmers, slots_for


@functools.partial(jax.jit, static_argnames=("k",), donate_argnums=0)
def count_chunk(tab, codes, k: int):
    """Count every valid canonical k-mer of one code chunk into tab.

    codes: uint8 [chunk_len]; invalid windows (containing code >= 4, i.e. N
    separators / padding) are skipped, matching the reference mer_iterator's
    reset-on-invalid behavior (jellyfish mer_iterator.hpp:53-81).
    """
    keys, valid = canonical_windows(jnp, codes, k)
    ones = jnp.ones(keys.shape[0], dtype=jnp.uint32)
    return insert_kmers(tab, keys, ones, valid)


def count_reads(
    paths: Iterable[str],
    k: int,
    n_slots: int | None = None,
    chunk_len: int = 1 << 22,
    hash_size_hint: int | None = None,
    progress=None,
):
    """Count canonical k-mers of all reads in `paths`.

    hash_size_hint mirrors jellyfish's `-s` (reference src/jasper.sh:82 sizes
    it as reads_bytes/10); n_slots overrides directly. Returns the device
    table. Raises if the table fills (pre-size larger), the analog of a
    failed cooperative resize.
    """
    paths = list(paths)
    if n_slots is None:
        if hash_size_hint is None:
            hash_size_hint = max(1024, total_file_bytes(paths) // 10)
        n_slots = slots_for(hash_size_hint, load_factor=0.8)
    tab = empty_table(k, n_slots)
    n_chunks = 0
    for codes, _fill in stream_codes(paths, k, chunk_len):
        tab, n_pending = count_chunk(tab, jnp.asarray(codes), k)
        n_chunks += 1
        if progress is not None and n_chunks % 16 == 0:
            progress(n_chunks)
    if n_chunks and int(n_pending) > 0:
        raise RuntimeError(
            f"k-mer table full ({n_slots} slots): {int(n_pending)} keys of the "
            "last chunk unplaced; rerun with a larger hash size (-s)"
        )
    return tab


def count_sequences(seqs: Iterable[str], k: int, n_slots: int = 1 << 16):
    """Count k-mers of in-memory sequences (testing convenience)."""
    from jasper_tpu.ops.codes import CODE_N, encode

    parts = []
    for s in seqs:
        parts.append(encode(s))
        parts.append(np.array([CODE_N], dtype=np.uint8))
    codes = np.concatenate(parts) if parts else np.zeros(0, dtype=np.uint8)
    if len(codes) < k:
        return empty_table(k, n_slots)
    tab = empty_table(k, n_slots)
    tab, n_pending = count_chunk(tab, jnp.asarray(codes), k)
    if int(n_pending) > 0:
        raise RuntimeError("table full")
    return tab
