"""Device-accelerated polishing engine.

The reference scan pays one SWIG query per visited k-mer
(src/jasper.py:50-104, call stack 3.3/3.4). Here every window count of a
contig is computed ON DEVICE in one tiled batch (scan_window_tiled: canonical
extraction + HBM table probe + threshold classification), and the host only
runs the exact reference control flow at the sparse "unsafe" positions the
device flagged (below-threshold, relative-drop candidates, windows near
N/invalid bases). Good regions — the overwhelming majority of an accurate
draft — are skipped with one vectorized argmax over the precomputed flags
instead of a Python loop.

Byte-exactness argument: a visited position whose window is valid ACGT, has
count >= solid_thre, no relative drop, and a valid previous window provably
takes the reference's `i += k-1` branch with no side effects (j.py:97-100),
so skipping straight to the first flagged position preserves the exact visit
sequence. All flagged positions run the inherited reference-exact logic;
in-place edits are handled by a suffix-shift mapping (edits only ever happen
left of the scan cursor), with a conservative dirty margin of 2k after each
repair answered by scalar host lookups.
"""

from __future__ import annotations

import numpy as np

from jasper_tpu.ops.codes import encode
from jasper_tpu.polish.engine import CountSource, PassResult, PolishEngine, _all_acgt
from jasper_tpu.polish.window import scan_window_tiled


class ContigScan:
    """Device-precomputed per-contig arrays (pass-start sequence)."""

    __slots__ = ("counts", "valid", "unsafe", "n", "_stride", "_by_residue")

    def __init__(self, counts, valid, unsafe):
        self.counts = counts
        self.valid = valid
        self.unsafe = unsafe
        self.n = len(counts)
        self._stride = None
        self._by_residue = None

    def skip_clean(self, di: int, stride: int) -> int:
        """Number of stride steps from di to the first flagged position on
        the grid di, di+stride, ... (== the position count if none) —
        equivalent to np.flatnonzero(unsafe[di::stride])[0] without slicing
        the tail of the contig on every call (O(log F) via per-residue
        sorted flagged-position indexes; the slice version re-touches
        n/stride lanes per repaired region, quadratic on long contigs)."""
        if self._stride != stride:
            F = np.flatnonzero(self.unsafe)
            self._by_residue = [F[F % stride == r] for r in range(stride)]
            self._stride = stride
        arr = self._by_residue[di % stride]
        j = np.searchsorted(arr, di)
        if j < len(arr):
            return (int(arr[j]) - di) // stride
        return -(-(self.n - di) // stride)  # ceil: steps to fall off the end


class DeviceScanner:
    """Runs the device pass and packages flag arrays.

    With more than one device visible, tiles scan data-parallel across all
    of them (table replicated) via a ("data",) mesh — the production
    multi-chip polish path (reference P5: xargs -P process fan-out,
    src/jasper.sh:209-212)."""

    def __init__(self, tab, k: int, divisor: int = 50, tile: int = 1 << 22,
                 mesh=None):
        self.tab = tab
        self.k = int(k)
        self.divisor = divisor
        self.tile = tile
        if mesh is None:
            import jax

            # local devices only: under multi-host each process scans its
            # own batches (a global default mesh would create arrays this
            # process cannot read back)
            if len(jax.local_devices()) > 1:
                from jax.sharding import Mesh

                mesh = Mesh(np.array(jax.local_devices()), ("data",))
        self.mesh = mesh

    def prepare(self, seq: str, solid_thre: int) -> ContigScan:
        k = self.k
        codes = encode(seq)
        counts, below, rel = scan_window_tiled(
            self.tab, codes, np.uint32(solid_thre), k, tile=self.tile,
            divisor=self.divisor, mesh=self.mesh,
        )
        n = len(counts)
        if n == 0:
            z = np.zeros(0, bool)
            return ContigScan(counts, z, z)
        # window validity: no non-ACGT code inside [i, i+k)
        bad = (codes > 3).astype(np.int32)
        cs = np.concatenate([[0], np.cumsum(bad)])
        valid = (cs[k : n + k] - cs[:n]) == 0
        # previous-window validity (the relative-drop reference count uses
        # jellyfish effective-key semantics for windows containing invalid
        # bases, j.py:80; those positions must run on host)
        prev_ok = valid[np.maximum(np.arange(n) - k, 0)]
        unsafe = (~valid) | below | rel | (~prev_ok)
        return ContigScan(counts, valid, unsafe)


class DevicePolishEngine(PolishEngine):
    """PolishEngine with the scan hot path on device. Repair logic (error
    localization, candidate edits, BFS patching) is inherited unchanged."""

    def __init__(self, counts: CountSource, k: int, solid_threshold: int,
                 divisor: int = 50, scanner: DeviceScanner | None = None):
        super().__init__(counts, k, solid_threshold, divisor)
        assert scanner is not None, "DevicePolishEngine needs a DeviceScanner"
        self.scanner = scanner

    def run_pass(self, seqs: dict[str, str], fix: bool) -> PassResult:
        import os
        import time

        profile = os.environ.get("JT_POLISH_PROFILE")
        t_prepare = 0.0
        t0_pass = time.perf_counter()
        k, q = self.k, self.q
        total_wrong = 0
        total_kmers = 0
        fixes = []
        out = dict(seqs)
        for name, seq in out.items():
            total_kmers += len(seq) - k + 1  # j.py:51
            t0 = time.perf_counter()
            arrays = self.scanner.prepare(seq, self.solid_thre)
            t_prepare += time.perf_counter() - t0
            orig_len = len(seq)
            clean_from = 0  # first current-coord position allowed to map
            i = 0
            wrong = 0

            def qa(pos: int, seq: str) -> int:
                """Exact q(seq[pos:k+pos]) via the device array when the
                window is untouched by edits, scalar host lookup otherwise."""
                if pos >= clean_from:
                    dp = pos - (len(seq) - orig_len)
                    if 0 <= dp < arrays.n and arrays.valid[dp]:
                        return int(arrays.counts[dp])
                return q(seq[max(pos, 0) : k + pos])

            while i < len(seq) - k + 1:
                # device fast path: stride through provably-good positions
                if i >= clean_from:
                    di = i - (len(seq) - orig_len)
                    if 0 <= di < arrays.n and not arrays.unsafe[di]:
                        i += arrays.skip_clean(di, k - 1) * (k - 1)
                        continue

                mer = seq[i : k + i]
                nN = mer.find("N")  # j.py:57-64
                if nN >= 0:
                    i += nN + 1
                    continue
                nn = mer.find("n")
                if nn >= 0:
                    i += nn + 1
                    continue
                if not _all_acgt(mer):  # j.py:65-68
                    i += 1
                    continue
                occ = qa(i, seq)
                if occ < self.solid_thre:  # j.py:73
                    i, seq, wrong, brk = self._repair_region(
                        i, seq, wrong, fix, fixes, name, rolling_thre=0
                    )
                    clean_from = i + 2 * k
                    if brk:
                        break
                elif i > 0 and occ < qa(max(0, i - k), seq) / self.divisor:
                    # j.py:80-95 relative drop; rolling mean of sampled
                    # previous k-mers
                    rsum = 0
                    ind = max(0, i - k)
                    num = 0
                    while ind < i:
                        num += 1
                        ind += self.step
                        rsum += qa(ind, seq)
                    rolling_thre = round(rsum / num / self.divisor)
                    if occ < rolling_thre:
                        i, seq, wrong, brk = self._repair_region(
                            i, seq, wrong, fix, fixes, name,
                            rolling_thre=round(rsum / num / 2),
                        )
                        clean_from = i + 2 * k
                        if brk:
                            break
                    else:
                        i += k - 1
                else:
                    i += k - 1
            out[name] = seq
            total_wrong += wrong
        if profile:
            t_all = time.perf_counter() - t0_pass
            print(f"[polish-profile] prepare(device scan) {t_prepare:.1f}s, "
                  f"host repair walk {t_all - t_prepare:.1f}s, "
                  f"{len(fixes)} fixes", flush=True)
        return PassResult(out, total_wrong, total_kmers, fixes)
