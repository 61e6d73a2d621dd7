"""Host (numpy) mirror of the device k-mer table.

Serves the serial host paths that the reference runs through SWIG one call at
a time (reference src/jasper.py:70-71 -> jellyfish binary_query_base):
candidate-edit validation, BFS gap patching, and the pure-python oracle used
in golden tests. Layout and hash are identical to
jasper_tpu.table.kmer_table, so a device table can be mirrored with one
device->host copy and vice versa.
"""

from __future__ import annotations

import numpy as np

from jasper_tpu.ops import codes as codes_mod
from jasper_tpu.ops.hashing import hash_words_np
from jasper_tpu.ops.kmer import canonical_windows, words_per_kmer

_EMPTY = 0


class HostKmerTable:
    def __init__(self, k: int, tab: np.ndarray):
        self.k = int(k)
        self.W = words_per_kmer(k)
        assert tab.shape[1] == self.W + 1
        self.tab = tab
        self.n_slots = tab.shape[0] - 1
        self.mask = np.uint32(self.n_slots - 1)

    # -- construction -------------------------------------------------------

    @classmethod
    def empty(cls, k: int, n_slots: int) -> "HostKmerTable":
        W = words_per_kmer(k)
        return cls(k, np.zeros((n_slots + 1, W + 1), dtype=np.uint32))

    def insert_np(self, keys: np.ndarray, counts: np.ndarray) -> None:
        """Vectorized host insert (same claim-round algorithm as the device
        build in jasper_tpu.table.kmer_table). keys uint32 [B, W], counts
        uint32 [B]; keys may repeat (counts accumulate)."""
        W = self.W
        tab = self.tab
        n = self.n_slots
        B = keys.shape[0]
        keys = np.ascontiguousarray(keys, dtype=np.uint32)
        counts = np.asarray(counts, dtype=np.uint32)
        ids = np.arange(B, dtype=np.uint32)
        pos = (hash_words_np(keys) & self.mask).astype(np.int64)
        pending = np.ones(B, dtype=bool)
        claim = np.full(n + 1, 0xFFFFFFFF, dtype=np.uint32)
        rounds = 0
        while pending.any():
            rows = tab[pos]
            occupied = rows[:, W] != _EMPTY
            key_match = (rows[:, :W] == keys).all(axis=-1)
            is_match = pending & occupied & key_match
            is_empty = pending & ~occupied
            is_coll = pending & occupied & ~key_match

            np.add.at(tab[:, W], pos[is_match], counts[is_match])

            ep = pos[is_empty]
            np.minimum.at(claim, ep, ids[is_empty])
            won = is_empty & (claim[pos] == ids)
            wp = pos[won]
            tab[wp, :W] = keys[won]
            tab[wp, W] = counts[won]
            claim[ep] = 0xFFFFFFFF

            pending = pending & ~is_match & ~won
            pos[is_coll] = (pos[is_coll] + 1) & int(self.mask)
            rounds += 1
            if rounds > n + 64:
                raise RuntimeError("host table full")

    # -- queries ------------------------------------------------------------

    def lookup_words(self, keys: np.ndarray, valid: np.ndarray | None = None) -> np.ndarray:
        """Vectorized probe, same algorithm as the device lookup."""
        W = self.W
        B = keys.shape[0]
        pos = hash_words_np(keys) & self.mask
        res = np.zeros(B, dtype=np.uint32)
        pending = np.ones(B, dtype=bool) if valid is None else valid.copy()
        guard = 0
        while pending.any():
            rows = self.tab[pos]
            occupied = rows[:, W] != _EMPTY
            key_match = (rows[:, :W] == keys).all(axis=-1)
            hit = pending & occupied & key_match
            res[hit] = rows[hit, W]
            pending = pending & occupied & ~key_match
            pos = np.where(pending, (pos + 1) & self.mask, pos).astype(np.uint32)
            guard += 1
            if guard > self.n_slots:
                raise RuntimeError("lookup did not terminate (corrupt table?)")
        return res

    def query_codes(self, seq_codes: np.ndarray) -> np.ndarray:
        """Counts for every k-mer window of a code array (canonicalized;
        invalid windows -> 0)."""
        if seq_codes.shape[0] < self.k:
            return np.zeros(max(0, seq_codes.shape[0] - self.k + 1), dtype=np.uint32)
        keys, valid = canonical_windows(np, seq_codes, self.k)
        out = np.zeros(keys.shape[0], dtype=np.uint32)
        if valid.any():
            out[valid] = self.lookup_words(keys[valid])
        return out

    def query_str(self, mer: str) -> int:
        """Count of one k-mer given as a string; 0 if wrong length or invalid.

        This is the contract the reference scan gets from
        `qf[jf.MerDNA(s).get_canonical()]` for well-formed mers; non-ACGT or
        wrong-length input yields 0 by definition here (see SEMANTICS.md).
        """
        if len(mer) != self.k:
            return 0
        c = codes_mod.encode(mer)
        if (c > 3).any():
            return 0
        keys, _ = canonical_windows(np, c, self.k)
        return int(self.lookup_words(keys)[0])

    # -- bulk export --------------------------------------------------------

    def items(self):
        """(keys uint32 [N, W], counts uint32 [N]) over occupied slots, in
        slot order."""
        W = self.W
        occ = self.tab[: self.n_slots, W] != _EMPTY
        return self.tab[: self.n_slots, :W][occ], self.tab[: self.n_slots, W][occ]
