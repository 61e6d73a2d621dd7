"""Pipeline driver — the jasper.sh equivalent (reference src/jasper.sh).

Reproduces the reference pipeline stage by stage, with the same artifacts,
checkpoint markers, and joining quirks:

  stage            marker                     reference
  batch split      jasper.split.success       src/jasper.sh:152-159
  k-mer DB         jasper.no_cat.success      src/jasper.sh:161-185
  histogram        jasper.histo.success       src/jasper.sh:187-193
  polish batches   jasper.correct.success     src/jasper.sh:195-216
  join             jasper.join.success        src/jasper.sh:218-232
  QV report        (stdout)                   src/jasper.sh:234-257

Key reproduced behaviors:
  * batch size = assembly_bases/threads*0.9, capped at 25 MB (sh:127-139),
  * contigs split into BATCH_SIZE chunks renamed ">ctg:offset" with NO
    overlap (boundary k-mers unexamined — a reference quirk, see SURVEY §5),
  * greedy packing of chunks into batch files, new file when accumulated
    bases exceed BATCH_SIZE at a header boundary (sh:156),
  * joined polished FASTA has one sequence line per contig (the reference's
    perl join does not re-wrap, sh:220); contig order is the original
    assembly order (the reference's perl-hash order is nondeterministic),
  * fixes.csv built with the awk/sort transform chain including the mangled
    header line and CRLF carried through from the per-batch CSVs
    (sh:222-226),
  * QV formula with bc-style 5-decimal truncation (sh:239-257).

Differences (documented, deliberate): batches run sequentially against the
shared TPU device instead of xargs -P processes — device-level batching is
the parallelism; multi-chip scaling lives in jasper_tpu.parallel.
"""

from __future__ import annotations

import datetime
import math
import os
import re
import sys
import time

import numpy as np

MAX_BATCH_SIZE = 25_000_000  # sh:9

_T0 = time.perf_counter()


def log(msg: str) -> None:
    d = datetime.datetime.now().strftime("%a %b %e %H:%M:%S %Z %Y")
    print(f"[{d}] {msg}", flush=True)


def tlog(msg: str) -> None:
    """Stage-timing log line: elapsed process seconds + message. These lines
    are the reconciliation trail between `.race/result.json` wall-clock and
    the per-stage profile (VERDICT r3: ~120 s unaccounted)."""
    print(f"[stage +{time.perf_counter() - _T0:8.1f}s] {msg}", flush=True)


class PipelineError(RuntimeError):
    pass


def _marker(workdir, name) -> str:
    return os.path.join(workdir, f"jasper.{name}.success")


def _touch(path):
    open(path, "a").close()


def _rm(path):
    try:
        os.remove(path)
    except FileNotFoundError:
        pass


# -- stage 1: batch split ----------------------------------------------------


def compute_batch_size(assembly_path: str, threads: int, requested: int) -> int:
    """sh:127-139: BS = seq_bytes/threads*0.9; use max(requested, BS) capped."""
    total = 0
    from jasper_tpu.io.fastx import _open_text

    with _open_text(assembly_path) as f:
        for line in f:
            if not line.startswith(">"):
                total += len(line.rstrip("\n"))
    batch_size = requested if requested > 0 else 0
    bs = int(total / threads * 0.9)
    if bs > batch_size:
        batch_size = min(bs, MAX_BATCH_SIZE)
    return batch_size


def split_batches(assembly_path: str, batch_size: int, workdir: str, query_fn: str):
    """Chunk contigs at batch_size bases (headers '>ctg:offset'), greedily
    pack chunks into '<query_fn>.batch.<N>.fa' files (sh:155-156)."""
    from jasper_tpu.io.fastx import read_fasta

    seqs = read_fasta(assembly_path)
    chunks: list[tuple[str, str]] = []
    for name, seq in seqs.items():
        if seq == "":
            continue  # perl: empty seq contributes no chunks
        for off in range(0, len(seq), batch_size if batch_size > 0 else len(seq) or 1):
            chunks.append((f"{name}:{off}", seq[off : off + batch_size]))

    batch_paths = []
    idx = 0
    out = None
    written = 0

    def _open_next():
        nonlocal out, idx, written
        if out:
            out.close()
        p = os.path.join(workdir, f"{query_fn}.batch.{idx}.fa")
        batch_paths.append(p)
        out = open(p, "w")
        idx += 1

    _open_next()
    written = 0
    for header, seq in chunks:
        if written > batch_size:
            _open_next()
            written = 0
        out.write(f">{header}\n{seq}\n")
        written += len(seq)
    out.close()
    return batch_paths


# -- stage 4: joining --------------------------------------------------------


def join_polished(fixed_paths, batch_size: int, contig_order, out_path: str):
    """Reassemble '>ctg:offset' pieces; offsets stride batch_size (sh:220).
    One (unwrapped) sequence line per contig, like the reference join."""
    from jasper_tpu.io.fastx import read_fasta

    pieces: dict[str, str] = {}
    seen_order: list[str] = []
    for p in fixed_paths:
        for name, seq in read_fasta(p).items():
            pieces[name] = seq
            seen_order.append(name)
    bs = batch_size if batch_size > 0 else 1
    roots: list[str] = []
    for name in contig_order:
        if f"{name}:0" in pieces:
            roots.append(name)
    with open(out_path + ".tmp", "w") as f:
        for ctg in roots:
            f.write(f">{ctg}\n")
            b = 0
            while f"{ctg}:{b}" in pieces:
                f.write(pieces[f"{ctg}:{b}"])
                b += bs
            f.write("\n")
    os.replace(out_path + ".tmp", out_path)


def _numeric_prefix(s: str) -> float:
    """GNU sort -n key: value of the leading numeric prefix, else 0."""
    m = re.match(r"\s*[-+]?\d*\.?\d*", s)
    try:
        return float(m.group(0)) if m and m.group(0).strip(" +") else 0.0
    except ValueError:
        return 0.0


def join_fix_csvs(csv_paths, out_path: str):
    """Reproduce sh:222-226: awk 'NR==1||FNR>1' | awk -F':' '{print $1" "$2}'
    | sort -k1,1 -k2,2n -k3,3n | awk '{print $1":"$2" "$3" "$4" "$5}'.

    The per-batch CSVs have CRLF line endings (python csv module default);
    the \\r rides through the field splits exactly as awk would carry it.
    """
    lines: list[str] = []
    for fi, p in enumerate(csv_paths):
        with open(p, "r", newline="") as f:
            raw = f.read()
        file_lines = raw.split("\n")
        if file_lines and file_lines[-1] == "":
            file_lines.pop()
        for li, line in enumerate(file_lines):
            if fi == 0 or li > 0:  # NR==1 || FNR>1
                lines.append(line)

    # awk -F':' '{print $1" "$2}'
    stage2 = []
    for line in lines:
        parts = line.split(":")
        f1 = parts[0]
        f2 = parts[1] if len(parts) > 1 else ""
        stage2.append(f1 + " " + f2)

    # sort -k1,1 -k2,2n -k3,3n (last resort: whole line bytewise)
    def key(line: str):
        fields = line.split()
        f1 = fields[0] if fields else ""
        f2 = _numeric_prefix(fields[1]) if len(fields) > 1 else 0.0
        f3 = _numeric_prefix(fields[2]) if len(fields) > 2 else 0.0
        return (f1.encode(), f2, f3, line.encode())

    stage2.sort(key=key)

    # awk '{print $1":"$2" "$3" "$4" "$5}' — awk fields split on [ \t]+
    with open(out_path + ".tmp", "w") as f:
        for line in stage2:
            fields = re.split(r"[ \t]+", line.strip(" \t"))
            g = lambda i: fields[i] if i < len(fields) else ""
            f.write(f"{g(0)}:{g(1)} {g(2)} {g(3)} {g(4)}\n")
    os.replace(out_path + ".tmp", out_path)


# -- QV ----------------------------------------------------------------------


def _bc_trunc(x: float, scale: int) -> str:
    """bc prints results truncated (not rounded) to `scale` decimals."""
    neg = x < 0
    mag = abs(x)
    whole = int(mag)
    frac = mag - whole
    digits = int(frac * 10**scale)
    s = f"{whole}.{digits:0{scale}d}"
    return ("-" if neg else "") + s


def qv_from_tallies(err: int, total: int, k: int) -> str:
    """sh:239-246: Q = -10*log10(1 - pgood^(1/k)), 5-decimal truncation,
    'Inf' when the error rate underflows to <= 0.

    bc semantics: the DIVISION err/total truncates at scale 10 (then the
    subtraction is exact), so pgood = 1 - trunc(err/total, 10) — computed
    with integer arithmetic to avoid float noise at the 10th digit."""
    if total == 0:
        return "Inf"
    pgood = 1 - (err * 10**10 // total) / 10**10
    if pgood <= 0:
        return "0"
    error_rate = 1 - math.exp(math.log(pgood) * (1 / k))
    if error_rate > 0:
        # bc evaluates `scale=5; -10*l(er)/l(10)`: mathlib l() RETURNS a
        # value truncated to the caller's scale (libmath computes with 6
        # guard digits then `return (f/1)`), and the division truncates at
        # scale 5 again — reproduce that exact chain
        def t5(x: float) -> float:
            return int(x * 10**5) / 10**5  # toward zero, like bc

        lnum = t5(math.log(error_rate))
        lden = t5(math.log(10))  # 2.30258
        return _bc_trunc(-10 * lnum / lden, 5)
    return "Inf"


def read_qv_helper(path: str) -> tuple[int, int]:
    err = 0
    total = 0
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    err += int(parts[0])
                    total += int(parts[1])
    return err, total


# -- full pipeline -----------------------------------------------------------


def _polish_batches_mp(batch_paths, host_table, k, thr, passes, threads, workdir):
    """Polish batches in parallel worker processes (reference P5:
    `xargs -P $NUM_THREADS ./run_jasper.sh`, src/jasper.sh:206-215), each
    running the jasper.py-parity CLI against a memmapped shared table.

    SIGINT/SIGTERM/SIGHUP kill all live workers before re-raising — the
    reference's `trap abort 1 2 15` -> `kill -9 0` (src/jasper.sh:23-28)."""
    import signal
    import subprocess
    import sys

    npy = os.path.join(workdir, f"table{k}.npy")
    if not os.path.exists(npy):
        np.save(npy, host_table.tab)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    last_it = passes - 1
    queue = list(batch_paths)
    running: list[tuple[subprocess.Popen, str]] = []

    def _abort(signum, frame):
        for p2, _ in running:
            try:
                p2.kill()
            except Exception:
                pass
        signal.signal(signum, signal.SIG_DFL)
        os.kill(os.getpid(), signum)

    old_handlers = {}
    for sig in (signal.SIGINT, signal.SIGTERM, signal.SIGHUP):
        try:
            old_handlers[sig] = signal.signal(sig, _abort)
        except (ValueError, OSError):
            pass  # non-main thread / unsupported

    def reap(block):
        for i, (proc, bp) in enumerate(list(running)):
            if block or proc.poll() is not None:
                rc = proc.wait()
                running.remove((proc, bp))
                if rc != 0:
                    for p2, _ in running:
                        p2.kill()
                    raise PipelineError(
                        f"polishing worker for {os.path.basename(bp)} failed "
                        f"(exit {rc})"
                    )
                bn = os.path.basename(bp)
                os.replace(
                    os.path.join(workdir, f"_iter{last_it}_{bn}.fixed.fa.tmp"),
                    os.path.join(workdir, f"_iter{last_it}_{bn}.fixed.fa"),
                )
                return

    try:
        while queue or running:
            while queue and len(running) < threads:
                bp = queue.pop(0)
                bn = os.path.basename(bp)
                proc = subprocess.Popen(
                    [sys.executable, "-m", "jasper_tpu.polish.runner",
                     "--table-npy", npy, "--ksize", str(k), "-q", bp,
                     "-p", str(passes), "--fix", "--fout", f"{bn}.fix.csv",
                     "-ff", f"{bn}.fixed.fa.tmp", "--test", "-thre", str(thr)],
                    cwd=workdir, env=env,
                )
                running.append((proc, bp))
            reap(block=True)
    finally:
        for sig, h in old_handlers.items():
            try:
                signal.signal(sig, h)
            except (ValueError, OSError):
                pass
    _rm(npy)


def run_pipeline(
    assembly: str,
    reads: list[str] | None = None,
    jf_db: str | None = None,
    k: int = 37,
    threads: int = 2,
    passes: int = 2,
    batch: int = 0,
    debug: bool = False,
    workdir: str = ".",
    num_devices: int | None = None,
    cpu_workers: bool = False,
) -> dict:
    """Run the full polishing pipeline; returns paths + QV strings.

    threads: shapes the batch size exactly like the reference (sh:127-139)
    but does NOT fan out CPU processes — on this architecture the device
    scanner already parallelizes every batch internally, so batches run
    sequentially against the chip/mesh. Pass cpu_workers=True for the
    reference-style xargs -P process fan-out (host-only polishing; useful
    without a device)."""
    from jasper_tpu.count.histogram import (
        read_histogram,
        threshold_from_histogram,
        write_histogram,
    )
    from jasper_tpu.io.fastx import read_fasta, total_file_bytes
    from jasper_tpu.io.jf import load_jf_into_host_table, write_jf
    from jasper_tpu.polish.engine import CountSource
    from jasper_tpu.polish.runner import polish_file

    from jasper_tpu.parallel.distributed import (
        barrier,
        maybe_init_distributed,
        my_shard,
    )
    from jasper_tpu.utils.jaxenv import setup_compilation_cache

    setup_compilation_cache()
    proc_id, proc_count = maybe_init_distributed()
    workdir = os.path.abspath(workdir)
    os.makedirs(workdir, exist_ok=True)
    if not os.path.exists(assembly) or os.path.getsize(assembly) == 0:
        raise PipelineError(
            "The query file does not exist. Please supply a valid fasta file "
            "to be polished with -a option."
        )
    query_fn = os.path.basename(assembly)
    last_it = passes - 1

    batch_size = compute_batch_size(assembly, threads, batch)
    log(f"Using BATCH SIZE {batch_size}")

    # split (multi-host: process 0 writes the batch files)
    if proc_id == 0 and not os.path.exists(_marker(workdir, "split")):
        log("Splitting query into batches for parallel execution")
        for old in os.listdir(workdir):
            if re.match(re.escape(query_fn) + r"\.batch\..*\.fa$", old):
                _rm(os.path.join(workdir, old))
        split_batches(assembly, batch_size, workdir, query_fn)
        _rm(_marker(workdir, "correct"))
        _touch(_marker(workdir, "split"))
    barrier("split")
    batch_paths = sorted(
        (
            os.path.join(workdir, p)
            for p in os.listdir(workdir)
            if re.match(re.escape(query_fn) + r"\.batch\.\d+\.fa$", p)
        ),
        key=lambda p: int(p.rsplit(".batch.", 1)[1].split(".")[0]),
    )

    # database
    histo_csv = os.path.join(workdir, f"jfhisto{k}.csv")
    host_table = None
    dev_tab = None  # device-built scan table (classic count finish only)
    db_writer = None  # background .jf artifact writer (joined before return)
    if jf_db is None:
        if not reads:
            raise PipelineError(
                "Either a jf database or files of polishing reads must be "
                "provided in the argument."
            )
        for r in reads:
            if not os.path.exists(r) or os.path.getsize(r) == 0:
                raise PipelineError(
                    f"The reads file  {r} does not exist. Please supply a series "
                    "of valid reads files separated by space and wrapped in one "
                    "pair of quotation marks."
                )
        jf_db = os.path.join(workdir, f"mer_counts{k}.jf")
        if proc_id != 0:
            barrier("db")  # process 0 counts; shared FS serves the .jf
        elif os.path.exists(jf_db) and os.path.getsize(jf_db) > 0:
            log(f"Using existing jellyfish database {jf_db}")
            _rm(_marker(workdir, "no_cat"))
        else:
            log(f"Creating jellyfish database {jf_db}")
            from jasper_tpu.count.counter import count_reads_to_host
            from jasper_tpu.count.histogram import histogram_rows_from_counts
            from jasper_tpu.parallel.scanner import local_data_mesh

            jf_size = total_file_bytes(reads) // 10
            mesh = local_data_mesh(num_devices)
            if mesh is not None:
                log(f"Counting data-parallel over {mesh.shape['data']} devices")
            tlog("count: start (ingest + device counting)")
            # count + land the distinct set on the host: pulls the
            # ~12 B/record run (not the ~40 B/record table) over the slow
            # tunnel d2h link with host-table placement overlapping the
            # transfer; chromosome-scale sets (past the device finish
            # budget) pull per-level and k-way merge on the host instead
            # (count_reads_to_host policy)
            host_table, rkeys, rcounts, dev_tab = count_reads_to_host(
                reads, k, hash_size_hint=max(jf_size, 1024), mesh=mesh,
                tlog=tlog, return_device_table=True,
            )
            write_histogram(histo_csv, histogram_rows_from_counts(rcounts))
            tlog("count: histogram done")
            # the in-process polish stage reads the in-memory table; the .jf
            # artifact writes in the background (tmp+rename keeps a crashed
            # run restartable) and is joined before the pipeline returns.
            # Multi-host writes synchronously: peers load it right after the
            # "db" barrier off the shared FS.
            def _write_db(path=jf_db, kk=k, ks=rkeys, cs=rcounts):
                t0 = time.perf_counter()
                try:
                    # yield the CPU to the concurrent polish scan: this
                    # thread runs dead last (the r4 instrumented race showed
                    # the writer starving polish pass 0, 112 s vs 8 s)
                    import threading

                    os.setpriority(os.PRIO_PROCESS, threading.get_native_id(), 19)
                except (OSError, AttributeError):
                    pass
                tmp = path + ".tmp"
                write_jf(tmp, kk, ks, cs.astype(np.uint64))
                os.replace(tmp, path)
                tlog(f"count: background .jf write done "
                     f"({time.perf_counter() - t0:.1f}s thread time)")

            if proc_count > 1:
                _write_db()
            else:
                import threading

                db_writer = threading.Thread(target=_write_db, name="jf-write")
                db_writer.start()
            del rkeys, rcounts
            _touch(_marker(workdir, "no_cat"))
            _touch(_marker(workdir, "histo"))
        if proc_id == 0:
            barrier("db")

    if host_table is None:
        log(f"Loading k-mer database {jf_db}")
        host_table, _header = load_jf_into_host_table(jf_db)
        if host_table.k != k:
            raise PipelineError(
                f"Database {jf_db} has k={host_table.k}, but -k {k} was requested"
            )

    # histogram (multi-host: process 0 writes, shared FS serves the rest)
    if proc_id == 0 and (
        not os.path.exists(_marker(workdir, "histo"))
        or not (os.path.exists(histo_csv) and os.path.getsize(histo_csv) > 0)
    ):
        log("Computing K-mer histogram")
        rows = _host_histogram(host_table)
        write_histogram(histo_csv, rows)
        _rm(_marker(workdir, "correct"))
        _touch(_marker(workdir, "histo"))
    barrier("histo")

    # polish
    threshold_txt = os.path.join(workdir, "threshold.txt")
    if not os.path.exists(_marker(workdir, "correct")):
        log("Polishing")
        thr = threshold_from_histogram(read_histogram(histo_csv))
        if thr is None:
            raise PipelineError(
                "Local min of kmer counts is smaller than 4. The input read "
                "data is not suitable for polishing."
            )
        with open(threshold_txt, "w") as f:
            f.write(str(thr))
        log(f"Lower threshold for unreliable kmers is {thr}")
        if cpu_workers and threads > 1 and len(batch_paths) > 1:
            # reference-style process fan-out over batches (src/jasper.sh:212
            # xargs -P); workers share the table zero-copy via a .npy memmap
            # (the analog of the pre-warmed .jf page cache, sh:209-211)
            _polish_batches_mp(
                batch_paths, host_table, k, thr, passes, threads, workdir
            )
        else:
            counts = CountSource(host_table)
            # scan hot path on device: replicated table + data-parallel
            # tiles when it fits HBM, hash-sharded table + all-to-all
            # routing when it doesn't (reference P5 deployment analog,
            # src/jasper.sh:206-215)
            from jasper_tpu.parallel.scanner import select_scanner
            from jasper_tpu.polish.device_engine import DevicePolishEngine

            scanner = select_scanner(host_table, k, num_devices=num_devices,
                                     device_tab=dev_tab)
            log(f"Scanner: {type(scanner).__name__}")

            def engine_cls(c, kk, t):
                return DevicePolishEngine(c, kk, t, scanner=scanner)

            tlog("polish: start")
            for bp in my_shard(batch_paths, proc_id, proc_count):
                bn = os.path.basename(bp)
                polish_file(
                    bp, counts, k, thr, passes,
                    fix=True, test=True,
                    fout=f"{bn}.fix.csv", fixedout=f"{bn}.fixed.fa.tmp",
                    workdir=workdir, engine_cls=engine_cls,
                )
                os.replace(
                    os.path.join(workdir, f"_iter{last_it}_{bn}.fixed.fa.tmp"),
                    os.path.join(workdir, f"_iter{last_it}_{bn}.fixed.fa"),
                )
                tlog(f"polish: batch {bn} done")
        barrier("correct")  # all hosts' batches done before the join
        _rm(_marker(workdir, "join"))
        _touch(_marker(workdir, "correct"))

    # join (multi-host: shared-FS outputs joined by process 0 only)
    polished = os.path.join(workdir, f"{query_fn}.polished.fasta")
    fixes_csv = os.path.join(workdir, f"{query_fn}.fixes.csv")
    if proc_id == 0 and not os.path.exists(_marker(workdir, "join")):
        log("Joining")
        tlog("join: start")
        fixed_paths = [
            os.path.join(workdir, f"_iter{last_it}_{os.path.basename(bp)}.fixed.fa")
            for bp in batch_paths
        ]
        contig_order = list(read_fasta(assembly).keys())
        join_polished(fixed_paths, batch_size, contig_order, polished)
        for p in fixed_paths:
            _rm(p)
        csv_paths = sorted(
            (
                os.path.join(workdir, p)
                for p in os.listdir(workdir)
                if re.match(
                    r"_iter\d+_" + re.escape(query_fn) + r"\.batch\.\d+\.fa\.fix\.csv$", p
                )
            ),
        )
        join_fix_csvs(csv_paths, fixes_csv)
        _touch(_marker(workdir, "join"))
        if not debug:
            for p in os.listdir(workdir):
                if re.match(
                    r"_iter\d+_" + re.escape(query_fn) + r"\.batch\.\d+\.fa\.fix\.csv$", p
                ) or re.match(re.escape(query_fn) + r"\.batch\.\d+\.fa$", p):
                    _rm(os.path.join(workdir, p))
    if proc_count > 1:
        barrier("join")  # join done before anyone reads joined outputs

    # QV — every process reads the shared helper CSVs so logs and return
    # values match the single-host contract (reference src/jasper.sh:234-257
    # prints QV wherever it runs); process 0 deletes the helpers only after
    # all processes have read them
    err_b, tot_b = read_qv_helper(os.path.join(workdir, "0qValCalcHelper.csv"))
    err_a, tot_a = read_qv_helper(os.path.join(workdir, f"{passes}qValCalcHelper.csv"))
    q_before = qv_from_tallies(err_b, tot_b, k)
    q_after = qv_from_tallies(err_a, tot_a, k)
    log(f"Before Polishing: Q value = {q_before}")
    log(f"After Polishing: Q value = {q_after}")
    if proc_count > 1:
        barrier("qv")
    if proc_id == 0:
        for p in os.listdir(workdir):
            if p.endswith("qValCalcHelper.csv"):
                _rm(os.path.join(workdir, p))
    if db_writer is not None:
        t0 = time.perf_counter()
        db_writer.join()
        wait = time.perf_counter() - t0
        if wait > 0.5:
            tlog(f"blocked {wait:.1f}s waiting for background .jf write")
    tlog("pipeline done")
    log(f"Polished sequence is in {query_fn}.polished.fasta")
    return {
        "polished": polished,
        "fixes": fixes_csv,
        "q_before": q_before,
        "q_after": q_after,
        "db": jf_db,
        "batch_size": batch_size,
    }


def _host_histogram(host_table, high: int = 10000):
    sw, S = host_table.sw, host_table.slots
    counts = host_table.tab[:, : S * sw].reshape(-1, sw)[:, sw - 1]
    occ = counts != 0
    clipped = np.minimum(counts[occ].astype(np.int64), high + 1)
    hist = np.bincount(clipped, minlength=high + 2)
    return [(int(c), int(hist[c])) for c in range(1, high + 2) if c < len(hist) and hist[c] > 0]
