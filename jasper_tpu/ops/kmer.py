"""Windowed k-mer extraction, 2-bit packing, canonicalization.

A k-mer over bases b_0..b_{k-1} (b_0 = first/leftmost) is the integer
K = sum b_p * 4^(k-1-p), i.e. the first base occupies the most significant
bits. This matches the reference mer representation, whose MSB-first
comparison makes integer order == string order (jellyfish
mer_dna.hpp:227-250), so canonicalization is a word-wise lexicographic min.

K is stored as ``W = ceil(2k/32)`` uint32 words, word 0 = LEAST significant
32 bits. Because 32 is a multiple of 2, every base lands entirely inside one
word: word j holds bases p with k-1-16(j+1) < p <= k-1-16j.

All functions are parameterized over the array namespace ``xp`` (numpy or
jax.numpy): the device path and the host oracle share one implementation.
"""

from __future__ import annotations

import numpy as np

from jasper_tpu.ops.codes import CODE_T


def words_per_kmer(k: int) -> int:
    return (2 * k + 31) // 32


def key_bytes(k: int) -> int:
    """Bytes per key in the .jf binary/sorted record (ceil(2k/8))."""
    return (2 * k + 7) // 8


def _base_word_shift(k: int):
    """For each base position p (0-based from the left): (word, shift)."""
    out = []
    for p in range(k):
        bitpos = 2 * (k - 1 - p)
        out.append((bitpos // 32, bitpos % 32))
    return out


def pack_codes(xp, win, k: int):
    """Pack base-code windows into key words.

    win: integer array [..., k] with values in 0..3 (garbage allowed where the
    caller masks validity). Returns uint32 array [..., W].
    """
    W = words_per_kmer(k)
    u32 = xp.uint32
    words = [None] * W
    win = win.astype(u32)
    for p, (j, shift) in enumerate(_base_word_shift(k)):
        contrib = (win[..., p] & xp.uint32(3)) << u32(shift)
        words[j] = contrib if words[j] is None else (words[j] | contrib)
    return xp.stack([w.astype(u32) for w in words], axis=-1)


def words_le(xp, a, b):
    """Lexicographic a <= b over uint32 word arrays [..., W] (word W-1 most
    significant)."""
    W = a.shape[-1]
    eq = a[..., W - 1] == b[..., W - 1]
    lt = a[..., W - 1] < b[..., W - 1]
    for j in range(W - 2, -1, -1):
        lt = lt | (eq & (a[..., j] < b[..., j]))
        eq = eq & (a[..., j] == b[..., j])
    return lt | eq


def window_stack(xp, codes, k: int):
    """codes [L] -> windows [L-k+1, k]: windows[i, p] = codes[i+p].

    Uses k static slices, cheap under jit.
    """
    n = codes.shape[0] - k + 1
    return xp.stack([codes[p : p + n] for p in range(k)], axis=-1)


def canonical_windows(xp, codes, k: int):
    """All k-mer windows of a code array, canonicalized.

    codes: uint8 [L] (values 0..5; >=4 marks invalid bases).
    Returns (keys uint32 [L-k+1, W], valid bool [L-k+1]).
    Invalid windows (containing any non-ACGT code) get key garbage and
    valid=False; callers must treat their count as 0.
    """
    win = window_stack(xp, codes, k)
    valid = xp.all(win <= np.uint8(CODE_T), axis=-1)
    safe = (win & np.uint8(3)).astype(xp.uint32)
    fwd = pack_codes(xp, safe, k)
    # reverse complement: base q of rc = 3 - base_{k-1-q}
    rc_win = xp.uint32(3) - safe[..., ::-1]
    rc = pack_codes(xp, rc_win, k)
    le = words_le(xp, fwd, rc)
    keys = xp.where(le[..., None], fwd, rc)
    return keys, valid


def forward_windows(xp, codes, k: int):
    """All k-mer windows of a code array WITHOUT canonicalization (jellyfish
    non-`-C` counting mode). Returns (keys uint32 [L-k+1, W], valid bool)."""
    win = window_stack(xp, codes, k)
    valid = xp.all(win <= np.uint8(CODE_T), axis=-1)
    safe = (win & np.uint8(3)).astype(xp.uint32)
    return pack_codes(xp, safe, k), valid


def canonical_kmers_of_batch(xp, codes, k: int):
    """Like canonical_windows but for a batch [B, L] -> ([B, L-k+1, W], [B, L-k+1])."""
    win = xp.stack([codes[:, p : p + codes.shape[1] - k + 1] for p in range(k)], axis=-1)
    valid = xp.all(win <= np.uint8(CODE_T), axis=-1)
    safe = (win & np.uint8(3)).astype(xp.uint32)
    fwd = pack_codes(xp, safe, k)
    rc = pack_codes(xp, xp.uint32(3) - safe[..., ::-1], k)
    le = words_le(xp, fwd, rc)
    keys = xp.where(le[..., None], fwd, rc)
    return keys, valid


# ---------------------------------------------------------------------------
# Host-side scalar helpers (oracle / .jf io)


def kmer_to_int(seq: str) -> int:
    """ACGT string -> packed integer (first base most significant)."""
    v = 0
    m = {"A": 0, "C": 1, "G": 2, "T": 3, "a": 0, "c": 1, "g": 2, "t": 3}
    for ch in seq:
        v = (v << 2) | m[ch]
    return v


def int_to_kmer(v: int, k: int) -> str:
    out = []
    for p in range(k):
        out.append("ACGT"[(v >> (2 * (k - 1 - p))) & 3])
    return "".join(out)


def int_to_words(v: int, k: int) -> np.ndarray:
    W = words_per_kmer(k)
    return np.array([(v >> (32 * j)) & 0xFFFFFFFF for j in range(W)], dtype=np.uint32)


def words_to_int(words) -> int:
    v = 0
    for j in range(len(words) - 1, -1, -1):
        v = (v << 32) | int(words[j])
    return v
