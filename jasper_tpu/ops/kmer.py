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


def _pack_stream(xp, c2, n_words: int):
    """2-bit codes [16*n_words] -> u32 stream [n_words]: word w =
    sum_j c2[16w+j] << 2j (LSB-first base order within each word)."""
    m = c2[: 16 * n_words].reshape(n_words, 16).astype(xp.uint32)
    out = m[:, 0]
    for j in range(1, 16):
        out = out | (m[:, j] << xp.uint32(2 * j))
    return out


def canonical_windows_fast(xp, codes, k: int, grouped: bool = False):
    """Funnel-shift canonical window extraction over packed 2-bit streams.

    Numerically identical to canonical_windows, but O(W) memory passes
    instead of O(k): the forward key of window i is the LSB-first packing of
    the REVERSED code array at position L-k-i, and the revcomp key is the
    LSB-first packing of the COMPLEMENTED codes at i, so both come from two
    precomputed u32 streams with per-word funnel shifts
    (word = (P[w] >> sh) | (P[w+1] << (32-sh))).

    Windows are processed in 16 residue groups (i mod 16 shares its shift,
    so every slice below is static). grouped=False returns positional order
    (scan path); grouped=True returns group-major order, valid for
    order-insensitive consumers (the counting sort path), padded with
    invalid lanes to length 16*ceil(n/16).
    Returns (keys uint32 [n_out, W], valid bool [n_out]).
    """
    L = int(codes.shape[0])
    n = L - k + 1
    W = words_per_kmer(k)
    if n <= 0:
        return (xp.zeros((0, W), dtype=xp.uint32), xp.zeros(0, dtype=bool))
    u32 = xp.uint32
    T = max(1, -(-n // 16))  # lanes per group
    FP = T + W + 2  # front pad (words) so reversed fwd slices stay in range
    n_words = FP + T + W + 2

    base = (codes & np.uint8(3)).astype(xp.uint8)
    tail_pad = 16 * n_words - L
    zpad = xp.zeros(tail_pad, dtype=xp.uint8)
    comp = xp.concatenate([xp.uint8(3) - base, zpad])
    revc = xp.concatenate([base[::-1], zpad])
    PC = _pack_stream(xp, comp, n_words)
    # front-pad the reversed stream by FP zero words: R word (u) lives at
    # PR[FP + u], so indices (q0 - t + j + FP) are nonnegative for all t < T
    PR = xp.concatenate(
        [xp.zeros(FP, dtype=xp.uint32), _pack_stream(xp, revc, n_words - FP)]
    )

    top_bits = 2 * k - 32 * (W - 1)
    top_mask = u32(0xFFFFFFFF) if top_bits == 32 else u32((1 << top_bits) - 1)

    # validity (positional): no invalid base inside [i, i+k)
    bad = (codes > np.uint8(3)).astype(xp.int32)
    cs = xp.cumsum(xp.concatenate([xp.zeros(1, dtype=xp.int32), bad]))
    valid_pos = (cs[k : n + k] - cs[:n]) == 0
    # pad to 16*T so the group reshape below is exact
    valid_pad = xp.concatenate(
        [valid_pos, xp.zeros(16 * T - n, dtype=bool)]
    ).reshape(T, 16)

    keys_g = []
    for r in range(16):
        # rc: stream start s = i = 16t + r -> word index t + j, shift 2r
        sh = 2 * r
        rc_words = []
        for j in range(W):
            a = PC[j : j + T]
            if sh == 0:
                rc_words.append(a)
            else:
                b = PC[j + 1 : j + 1 + T]
                rc_words.append((a >> u32(sh)) | (b << u32(32 - sh)))
        # fwd: stream start s2 = L-k-i = 16*q0 + r2 - 16t in the reversed
        # array; word index (q0 - t + j), shift 2*r2 — reversed-t slices
        M = L - k - r
        r2 = M % 16
        q0 = M // 16
        sh2 = 2 * r2
        fwd_words = []
        for j in range(W):
            hi = FP + q0 + j
            a = PR[hi - (T - 1) : hi + 1][::-1]
            if sh2 == 0:
                fwd_words.append(a)
            else:
                b = PR[hi + 1 - (T - 1) : hi + 2][::-1]
                fwd_words.append((a >> u32(sh2)) | (b << u32(32 - sh2)))
        rc_words[W - 1] = rc_words[W - 1] & top_mask
        fwd_words[W - 1] = fwd_words[W - 1] & top_mask
        fwd = xp.stack(fwd_words, axis=-1)
        rc = xp.stack(rc_words, axis=-1)
        le = words_le(xp, fwd, rc)
        keys_g.append(xp.where(le[..., None], fwd, rc))

    keys = xp.stack(keys_g, axis=0)  # [16, T, W]
    valid = xp.swapaxes(valid_pad, 0, 1)  # [16, T]
    if grouped:
        return keys.reshape(16 * T, W), valid.reshape(16 * T)
    # positional: out[i] = group (i%16), lane (i//16)
    keys = xp.swapaxes(keys, 0, 1).reshape(16 * T, W)[:n]
    valid = valid_pad.reshape(16 * T)[:n]
    return keys, valid


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


_BASE_LUT = np.frombuffer(b"ACGT", dtype=np.uint8)


def decode_keys_ascii(keys: np.ndarray, k: int) -> np.ndarray:
    """Packed key words [N, W] uint32 -> ASCII base matrix [N, k] uint8.

    Vectorized inverse of the 2-bit packing (first base in the highest bit
    pair, little-endian 32-bit words) — the batch analog of int_to_kmer,
    k vector ops instead of N*k Python ops. Powers the streaming dump
    (reference jellyfish binary_dumper.hpp:83-109 reads sequentially; here
    whole chunks decode at once)."""
    keys = np.ascontiguousarray(keys, dtype=np.uint32)
    n = keys.shape[0]
    codes = np.empty((n, k), np.uint8)
    for p in range(k):
        b = 2 * (k - 1 - p)
        codes[:, p] = (keys[:, b >> 5] >> np.uint32(b & 31)).astype(np.uint8) & 3
    return _BASE_LUT[codes]
