"""GF(2) rectangular binary matrix — .jf file-order hash.

Only needed for Jellyfish .jf interchange: .jf "binary/sorted" files are
ordered by ``pos = matrix.times(key) & (size-1)`` (reference jellyfish
binary_dumper.hpp:210-212), with the matrix serialized in the JSON header
(file_header.hpp: key "matrix1", column-major, r = ceil(log2(size)),
c = key bits = 2k).

Bit convention (jellyfish rectangular_binary_matrix.hpp:224-252): key bit i
(i=0 the LSB) multiplies column ``c-1-i``; identity mode ("identity": true)
passes the low r bits of the key through.

Our in-memory table uses its own hash (jasper_tpu.ops.hashing); this module
is host-side numpy only.
"""

from __future__ import annotations

import numpy as np


class GF2Matrix:
    def __init__(self, columns: np.ndarray | None, r: int, c: int):
        """columns: uint64 [c] (column j = matrix column), or None = low-identity."""
        self.r = int(r)
        self.c = int(c)
        if columns is not None:
            columns = np.asarray(columns, dtype=np.uint64)
            assert columns.shape == (self.c,)
            mask = np.uint64((1 << self.r) - 1) if self.r < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
            columns = columns & mask
        self.columns = columns

    @classmethod
    def identity(cls, r: int, c: int) -> "GF2Matrix":
        return cls(None, r, c)

    @classmethod
    def random_invertible(cls, r: int, c: int, rng: np.random.Generator) -> "GF2Matrix":
        """Random matrix whose low-r square part admits a pseudo-inverse
        (mirrors jellyfish randomize_pseudo_inverse: retry until full rank)."""
        while True:
            cols = rng.integers(0, 1 << 63, size=c, dtype=np.uint64) * 2 + rng.integers(
                0, 2, size=c, dtype=np.uint64
            )
            m = cls(cols, r, c)
            if m._full_rank():
                return m

    def _full_rank(self) -> bool:
        """Rank over GF(2) equals r?"""
        cols = [int(x) for x in self.columns]
        rank = 0
        for bit in range(self.r - 1, -1, -1):
            pivot = None
            for j in range(len(cols)):
                if (cols[j] >> bit) & 1:
                    pivot = j
                    break
            if pivot is None:
                continue
            pv = cols[pivot]
            for j in range(len(cols)):
                if j != pivot and ((cols[j] >> bit) & 1):
                    cols[j] ^= pv
            cols[pivot] = 0
            rank += 1
        return rank == self.r

    def times_int(self, key: int) -> int:
        """matrix * key for a scalar big-int key (c bits)."""
        if self.columns is None:
            return key & ((1 << self.r) - 1)
        res = 0
        for i in range(self.c):
            if (key >> i) & 1:
                res ^= int(self.columns[self.c - 1 - i])
        return res

    def times_words(self, words: np.ndarray) -> np.ndarray:
        """Vectorized: words uint32 [N, W] (word 0 = LSB 32 bits) -> uint64 [N]."""
        n_words = words.shape[-1]
        if self.columns is None:
            mask = np.uint64((1 << self.r) - 1)
            lo = words[..., 0].astype(np.uint64)
            if self.r > 32 and n_words > 1:
                lo = lo | (words[..., 1].astype(np.uint64) << np.uint64(32))
            return lo & mask
        res = np.zeros(words.shape[:-1], dtype=np.uint64)
        for j in range(n_words):
            w = words[..., j].astype(np.uint64)
            for t in range(32):
                i = 32 * j + t
                if i >= self.c:
                    break
                col = self.columns[self.c - 1 - i]
                bit = (w >> np.uint64(t)) & np.uint64(1)
                res ^= bit * col
        return res

    def to_header_json(self) -> dict:
        d = {"r": self.r, "c": self.c}
        if self.columns is None:
            d["identity"] = True
        else:
            d["identity"] = False
            d["columns"] = [int(x) for x in self.columns]
        return d

    @classmethod
    def from_header_json(cls, d: dict) -> "GF2Matrix":
        r, c = int(d["r"]), int(d["c"])
        if d.get("identity", False):
            return cls.identity(r, c)
        cols = np.array([np.uint64(x) for x in d["columns"]], dtype=np.uint64)
        return cls(cols, r, c)
