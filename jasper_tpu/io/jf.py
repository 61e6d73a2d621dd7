"""Jellyfish .jf "binary/sorted" file interchange.

Format (clean-room from the reference sources; byte layout is fully
determined by these):

  * header: 9 ASCII decimal digits giving `hlen` (JSON length + NUL padding
    to 8-byte alignment of 9+hlen), then terse JSON, then NUL padding
    (jellyfish generic_file_header.hpp:88-117).
  * JSON keys used by readers: "format" ("binary/sorted"), "key_len" (=2k
    bits), "counter_len" (bytes per count), "size" (hash size, power of 2),
    "matrix1" {r, c, identity|columns}, "canonical", "max_reprobe",
    "reprobes" (jellyfish file_header.hpp:26-108).
  * records, sorted by pos = matrix*key & (size-1) then by key: ceil(2k/8)
    little-endian key bytes (key integer = first base most significant)
    followed by counter_len little-endian count bytes, saturating
    (jellyfish binary_dumper.hpp:19-41,112-213).

Reading ignores the matrix (keys are stored in full); writing emits an
identity matrix1 (a layout real jellyfish itself uses for small keys,
large_hash_array.hpp:998-1001), so `jellyfish query/histo/dump` work on our
files.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

from jasper_tpu.ops.gf2 import GF2Matrix
from jasper_tpu.ops.kmer import key_bytes, words_per_kmer

FORMAT = "binary/sorted"
TEXT_FORMAT = "text/sorted"
_QUADRATIC_REPROBES = [1]  # placeholder reprobe table for our headers


class JFHeader(dict):
    @property
    def k(self) -> int:
        return int(self["key_len"]) // 2


def _read_header(f) -> JFHeader:
    digits = f.read(9)
    if len(digits) != 9 or not digits.isdigit():
        raise ValueError("not a jellyfish file (bad header length field)")
    hlen = int(digits)
    raw = f.read(hlen)
    raw = raw.rstrip(b"\x00")
    return JFHeader(json.loads(raw))


def read_jf(path: str):
    """-> (k, keys uint32 [N, W], counts uint64 [N], header)."""
    with open(path, "rb") as f:
        header = _read_header(f)
        if header.get("format") != FORMAT:
            raise ValueError(f"unsupported .jf format {header.get('format')!r}")
        k = header.k
        kb = key_bytes(k)
        cl = int(header["counter_len"])
        rec = kb + cl
        data = f.read()
    if len(data) % rec != 0:
        raise ValueError(f"{path}: data size {len(data)} not a multiple of record {rec}")
    n = len(data) // rec
    W = words_per_kmer(k)
    arr = np.frombuffer(data, dtype=np.uint8).reshape(n, rec)
    keyb = np.zeros((n, 4 * W), dtype=np.uint8)
    keyb[:, :kb] = arr[:, :kb]
    keys = keyb.view("<u4").reshape(n, W)
    cntb = np.zeros((n, 8), dtype=np.uint8)
    cntb[:, :cl] = arr[:, kb:]
    counts = cntb.view("<u8").reshape(n)
    return k, keys, counts, header


def _radix_lexsort(cols_lsd):
    """Stable multi-key argsort, least-significant column first. numpy's
    kind="stable" argsort is radix for integer dtypes (0.4 s for 55M u32 on
    this host), where np.lexsort's per-column mergesorts took 63 s and the
    old device lax.sort detour moved the whole record set back over the
    ~25 MB/s tunnel d2h link (BASELINE.md)."""
    order = np.argsort(cols_lsd[0], kind="stable")
    for c in cols_lsd[1:]:
        order = order[np.argsort(c[order], kind="stable")]
    return order


def _sort_records(pos, keys, counts, W: int):
    """(pos, key) sort of dump records, host-side radix."""
    order = _radix_lexsort([keys[:, j] for j in range(W)] + [pos])
    return keys[order], np.asarray(counts, dtype=np.uint64)[order]


def write_jf(
    path: str,
    k: int,
    keys: np.ndarray,
    counts: np.ndarray,
    counter_len: int = 4,
    size: int | None = None,
    canonical: bool = True,
    extra_header: dict | None = None,
):
    """Write a binary/sorted .jf readable by real jellyfish.

    keys: uint32 [N, W]; counts saturate at 2^(8*counter_len)-1 like the
    reference binary_writer (binary_dumper.hpp:36-40).
    """
    n = keys.shape[0]
    W = words_per_kmer(k)
    kb = key_bytes(k)
    if size is None:
        size = 1 << max(4, math.ceil(math.log2(max(n, 1) * 2)))
    lsize = int(math.log2(size))
    matrix = GF2Matrix.identity(lsize, 2 * k)

    # sort by (pos, key) — key compared MSB-first == word-wise from the top.
    # The native struct-radix + packer (native/jt_jf.cc) does sort+pack in
    # seconds at 55 M records where the numpy path took ~64 s — load-bearing
    # on the background .jf-writer thread, which otherwise starves the
    # concurrent polish scan of host CPU (r4 race instrumentation). The
    # identity-matrix fast path derives the order from the keys alone.
    from jasper_tpu.io import native_jf

    recs = None
    pos = None
    if counter_len <= 8:
        if 2 * k <= 64 and lsize <= 2 * k:
            recs = native_jf.jf_sort_pack(
                keys, np.asarray(counts, np.uint64), None, kb, counter_len,
                lsize, k, identity_lsize=lsize)
        if recs is None:
            pos = matrix.times_words(keys)
            recs = native_jf.jf_sort_pack(
                keys, np.asarray(counts, np.uint64), pos, kb, counter_len,
                lsize, k)
    if recs is None:
        if pos is None:
            pos = matrix.times_words(keys)
        skeys, scounts = _sort_records(pos, keys, counts, W)
        max_val = np.uint64((1 << (8 * counter_len)) - 1)
        scounts = np.minimum(scounts, max_val)

    header = {
        "alignment": 8,
        "canonical": bool(canonical),
        "counter_len": int(counter_len),
        "format": FORMAT,
        "key_len": 2 * k,
        "matrix1": matrix.to_header_json(),
        "max_reprobe": 0,
        "reprobes": _QUADRATIC_REPROBES,
        "size": int(size),
        "val_len": 8 * counter_len,
    }
    if extra_header:
        header.update(extra_header)
    hjson = json.dumps(header, separators=(",", ":"), sort_keys=True).encode()
    pad = (9 + len(hjson)) % 8
    padlen = (8 - pad) if pad else 0
    hlen = len(hjson) + padlen

    if recs is None:
        keyb = np.ascontiguousarray(skeys).view("<u4").astype("<u4").tobytes()
        keyb = np.frombuffer(keyb, dtype=np.uint8).reshape(n, 4 * W)[:, :kb]
        cntb = scounts.astype("<u8").view(np.uint8).reshape(n, 8)[:, :counter_len]
        recs = np.concatenate([keyb, cntb], axis=1)

    with open(path, "wb") as f:
        f.write(b"%09d" % hlen)
        f.write(hjson)
        f.write(b"\x00" * padlen)
        f.write(memoryview(np.ascontiguousarray(recs).reshape(-1)))


def standard_header_extras(argv=None) -> dict:
    """The reference's fill_standard keys (generic_file_header.hpp:119+):
    hostname, pwd, exe, time, cmdline — recorded so `info -c` can print the
    creating command."""
    import datetime
    import socket
    import sys

    return {
        "hostname": socket.gethostname(),
        "pwd": os.getcwd(),
        "exe": sys.argv[0],
        "time": datetime.datetime.now().ctime(),
        "cmdline": list(sys.argv if argv is None else argv),
    }


def read_header(path: str) -> JFHeader:
    """Header JSON of any jellyfish-format file (binary/sorted, text/sorted,
    bloomcounter, ...)."""
    with open(path, "rb") as f:
        return _read_header(f)


def read_text_jf(path: str):
    """Read a "text/sorted" file (text_dumper format: generic header followed
    by `MER count` lines, jellyfish text_dumper.hpp:44-61).

    -> (k, keys uint32 [N, W], counts uint64 [N], header), records in file
    order.
    """
    from jasper_tpu.ops.kmer import int_to_words, kmer_to_int

    with open(path, "rb") as f:
        header = _read_header(f)
        if header.get("format") != TEXT_FORMAT:
            raise ValueError(f"unsupported text format {header.get('format')!r}")
        k = header.k
        W = words_per_kmer(k)
        keys, counts = [], []
        for line in f.read().decode("ascii").splitlines():
            if not line:
                continue
            mer, cnt = line.split()
            keys.append(int_to_words(kmer_to_int(mer), k))
            counts.append(int(cnt))
    ka = np.array(keys, dtype=np.uint32).reshape(len(keys), W)
    return k, ka, np.array(counts, dtype=np.uint64), header


def write_text_jf(
    path: str,
    k: int,
    keys: np.ndarray,
    counts: np.ndarray,
    size: int | None = None,
    canonical: bool = True,
    extra_header: dict | None = None,
):
    """Write a "text/sorted" file with the same record order as write_jf
    (sorted by identity-matrix hash position, then key)."""
    from jasper_tpu.ops.kmer import int_to_kmer, words_to_int

    n = keys.shape[0]
    W = words_per_kmer(k)
    if size is None:
        size = 1 << max(4, math.ceil(math.log2(max(n, 1) * 2)))
    lsize = int(math.log2(size))
    matrix = GF2Matrix.identity(lsize, 2 * k)
    pos = matrix.times_words(keys) if n else np.zeros(0, np.uint64)
    order = np.lexsort([keys[:, j] for j in range(W)] + [pos]) if n else []

    header = {
        "alignment": 8,
        "canonical": bool(canonical),
        "counter_len": 4,
        "format": TEXT_FORMAT,
        "key_len": 2 * k,
        "matrix1": matrix.to_header_json(),
        "max_reprobe": 0,
        "reprobes": _QUADRATIC_REPROBES,
        "size": int(size),
        "val_len": 32,
    }
    if extra_header:
        header.update(extra_header)
    hjson = json.dumps(header, separators=(",", ":"), sort_keys=True).encode()
    pad = (9 + len(hjson)) % 8
    padlen = (8 - pad) if pad else 0

    with open(path, "wb") as f:
        f.write(b"%09d" % (len(hjson) + padlen))
        f.write(hjson)
        f.write(b"\x00" * padlen)
        for i in order:
            mer = int_to_kmer(words_to_int(keys[i]), k)
            f.write(f"{mer} {int(counts[i])}\n".encode())


def read_any_jf(path: str):
    """Read either binary/sorted or text/sorted; -> (k, keys, counts, header)."""
    header = read_header(path)
    fmt = header.get("format")
    if fmt == FORMAT:
        return read_jf(path)
    if fmt == TEXT_FORMAT:
        return read_text_jf(path)
    raise ValueError(f"unsupported jellyfish format {fmt!r}")


def load_jf_into_host_table(path: str, load_factor: float | None = None):
    """.jf -> HostKmerTable (radix sort to hash order + cummax waterfall;
    records in a .jf are distinct, so the sorted-run build applies)."""
    from jasper_tpu.ops.hashing import hash_words_np
    from jasper_tpu.table.host_table import HostKmerTable

    from jasper_tpu.io import native_jf
    from jasper_tpu.ops.kmer import key_bytes as _key_bytes

    k, keys, counts, header = read_any_jf(path)
    W = keys.shape[1]
    srt = native_jf.sort_run_records(keys, counts, _key_bytes(k))
    if srt is None:
        counts32 = np.minimum(counts, 0xFFFFFFFF).astype(np.uint32)
        h = hash_words_np(keys)
        order = _radix_lexsort([keys[:, j] for j in range(W)] + [h])
        srt = (np.ascontiguousarray(keys[order]), counts32[order], h[order])
    skeys, scounts, sh = srt
    tab = HostKmerTable.from_sorted_run(k, skeys, scounts, load_factor, h=sh)
    return tab, header


def dump_table_to_jf(path: str, host_table, counter_len: int = 4, **kw):
    keys, counts = host_table.items()
    write_jf(path, host_table.k, keys, counts.astype(np.uint64), counter_len=counter_len, **kw)
