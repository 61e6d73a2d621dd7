"""Data-parallel multi-chip counting: per-device sorted-run ladders.

Single-chip counting amortizes random-access cost with the device sorter
(jasper_tpu.count.sorted_runs); a mesh multiplies sorter bandwidth. Chunks
of the read stream deal round-robin onto the mesh's "data" axis; each device
keeps its own LSM ladder of sorted runs (the same sort/merge programs,
vmapped over the leading device axis — embarrassingly parallel, XLA
partitions the batched sorts along the sharded axis with no collectives);
finish() folds the per-device runs into ONE run with pairwise merges.

Exactness / parity: per-key multiplicity summation is associative and far
below the uint32 saturation clamp, and the final fold produces a compacted
run sorted by (hash, key) with distinct actives — a unique representation —
so the built table and its .jf dump byte-match the single-device stream's
(tests/test_count.py::test_mesh_counting_jf_byte_match).

Reference anchor: jellyfish's P1 counting parallelism is N pthreads
CAS-inserting into one shared hash (jf:sub_commands/count_main.cc:152-184,
hash_counter.hpp:91-126); here it is N chips with zero shared state until
the final fold.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jasper_tpu.count.sorted_runs import (
    RunAccumulator,
    _compact,
    _scalar_ready,
    make_run_ones,
    merge_runs,
)


def data_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("data"))


@jax.jit
def _vflush_stage(key_parts, valid_parts):
    """Per-device stage flush: concat staged [D, B, W] parts along lanes,
    one make_run_ones sort + compaction per device (vmapped)."""
    keys = jnp.concatenate(list(key_parts), axis=1)
    valid = jnp.concatenate(list(valid_parts), axis=1)

    def one(k1, v1):
        h, sk, tot = make_run_ones(k1, v1)
        return _compact(h, sk, tot)

    return jax.vmap(one)(keys, valid)


@jax.jit
def _vmerge(ha, ka, ca, hb, kb, cb):
    return jax.vmap(merge_runs)(ha, ka, ca, hb, kb, cb)


@jax.jit
def _vpad(h, keys, counts, pad_ref):
    pad = pad_ref.shape[1] - h.shape[1]
    return (
        jnp.pad(h, ((0, 0), (0, pad))),
        jnp.pad(keys, ((0, 0), (0, pad), (0, 0))),
        jnp.pad(counts, ((0, 0), (0, pad))),
    )


class MeshRunAccumulator:
    """RunAccumulator with a leading device axis: runs are [D, L] arrays
    sharded along the mesh's "data" axis; every sort/merge runs device-local.
    Size classes use the MAX active count across devices; like the
    single-device accumulator, that scalar resolves through an async FIFO
    pending queue instead of a blocking per-flush round trip (see
    RunAccumulator's docstring — same determinism argument)."""

    PENDING_DEPTH = 2

    def __init__(self, mesh, unit: int, stage_lanes: int | None = None):
        self.mesh = mesh
        self.D = mesh.shape["data"]
        self.sharding = data_sharding(mesh)
        self.unit = max(1, unit)
        self.stage_lanes = stage_lanes if stage_lanes else 8 * self.unit
        self.levels: dict[int, tuple] = {}
        self._stage: list[tuple] = []
        self._staged = 0  # per-device staged lanes
        self._pending: list[tuple] = []
        self._draining = False

    def push_raw(self, keys, valid):
        """keys uint32 [D, B, W], valid bool [D, B] (device-sharded)."""
        self._stage.append((keys, valid))
        self._staged += keys.shape[1]
        if self._staged >= self.stage_lanes:
            self.flush_stage()

    def flush_stage(self):
        if not self._stage:
            return
        stage, self._stage, self._staged = self._stage, [], 0
        h, kk, cc, n_act = _vflush_stage(
            tuple(k for k, _ in stage), tuple(v for _, v in stage)
        )
        self._enqueue(h, kk, cc, jnp.max(n_act))

    def _size_class(self, n_active: int) -> int:
        j = 0
        while self.unit << j < n_active:
            j += 1
        return j

    def _truncate(self, run, n_active: int):
        h, keys, counts = run
        j = self._size_class(n_active)
        L = min(self.unit << j, h.shape[1])
        return j, (h[:, :L], keys[:, :L], counts[:, :L])

    def _merge(self, a, b):
        if a[0].shape[1] < b[0].shape[1]:
            a, b = b, a
        if b[0].shape[1] < a[0].shape[1]:
            b = _vpad(b[0], b[1], b[2], a[0])
        h, keys, counts, n_act = _vmerge(a[0], a[1], a[2], b[0], b[1], b[2])
        return h, keys, counts, jnp.max(n_act)

    def _enqueue(self, h, keys, counts, n_act):
        if not isinstance(n_act, int):
            try:
                n_act.copy_to_host_async()
            except AttributeError:
                pass
        self._pending.append((h, keys, counts, n_act))
        if not self._draining:
            self._drain()

    def _drain(self, block: bool = False):
        self._draining = True
        try:
            while self._pending:
                if (not block and len(self._pending) <= self.PENDING_DEPTH
                        and not _scalar_ready(self._pending[0][3])):
                    return
                h, keys, counts, n = self._pending.pop(0)
                self._push_resolved(h, keys, counts, int(n))
        finally:
            self._draining = False

    def _push_resolved(self, h, keys, counts, n_active: int):
        j, run = self._truncate((h, keys, counts), n_active)
        if j in self.levels:
            old = self.levels.pop(j)
            mh, mk, mc, mn = self._merge(old, run)
            self._enqueue(mh, mk, mc, mn)
        else:
            self.levels[j] = run

    def n_resident_lanes(self) -> int:
        """Total lanes across all devices (the --disk sizing metric)."""
        return self.D * (
            sum(r[0].shape[1] for r in self.levels.values())
            + sum(p[0].shape[1] for p in self._pending)
            + self._staged
        )

    def n_settled_lanes(self) -> int:
        """Eviction-trigger metric: excludes the async pending queue (see
        RunAccumulator.n_settled_lanes)."""
        return self.D * (
            sum(r[0].shape[1] for r in self.levels.values()) + self._staged
        )

    def finish(self):
        """Merge per-device ladders, then fold across devices into one
        single-device run (h, keys, counts, n_active) — or None if empty."""
        self.flush_stage()
        self._drain(block=True)
        runs = [self.levels.pop(j) for j in sorted(self.levels)]
        if not runs:
            return None
        cur = runs[0]
        for r in runs[1:]:
            h, keys, counts, _ = self._merge(cur, r)
            cur = (h, keys, counts)
        h, keys, counts = cur
        # cross-device fold: reuse the single-device LSM (device rows of the
        # sharded arrays become ordinary single-device runs; actives of a
        # compacted run are a prefix, so lane count bounds n_active)
        acc = RunAccumulator(unit=self.unit)
        for d in range(self.D):
            acc.push_uncompacted(
                jnp.asarray(h[d]), jnp.asarray(keys[d]), jnp.asarray(counts[d])
            )
        return acc.finish()
