"""Tracing / profiling helpers.

The reference has no profiling support beyond ad-hoc ``time.time()`` prints
and a forced ``CUDA_LAUNCH_BLOCKING=1`` (SURVEY §5).  The TPU-native
replacement: ``jax.profiler`` traces viewable in TensorBoard / Perfetto,
named-scope annotations for the hot regions, and a tiny step timer that
feeds the MetricWriter.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace into ``logdir`` (open with TensorBoard's
    profile plugin or Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that shows up in profiler timelines; usable as a context
    manager or decorator."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step-time / throughput tracker for the train loop."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def mean_step_time(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def throughput(self, items_per_step: int) -> float:
        st = self.mean_step_time
        return items_per_step / st if st > 0 else 0.0


def xplane_device_time_ms(logdir: str) -> Optional[dict]:
    """Parse a ``jax.profiler`` xplane trace -> device-time summary.

    Returns ``{"busy_ms": float, "span_ms": float, "n_ops": int}`` for the
    device plane's "XLA Ops" line: ``busy_ms`` sums op durations (the
    device-compute time — ops on one TensorCore timeline are serialized),
    ``span_ms`` is last-end minus first-start (includes inter-op gaps,
    i.e. host dispatch stalls show up here but not in busy).  Wall-clock
    timings on the shared remote-TPU host swing 1.5-2.5x with load;
    device time from a trace is load-robust, which is why the bench
    records it next to wall throughput (VERDICT r3 §2).  Returns None
    when no device plane exists (CPU runs) or the profile plugin proto
    is unavailable."""
    import glob

    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except Exception:  # pragma: no cover - env dependent
        return None
    paths = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    if not paths:
        return None
    xs = xplane_pb2.XSpace()
    with open(max(paths), "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            if not line.events:
                continue
            busy = sum(ev.duration_ps for ev in line.events) / 1e9
            start = min(ev.offset_ps for ev in line.events)
            end = max(ev.offset_ps + ev.duration_ps for ev in line.events)
            return {"busy_ms": busy, "span_ms": (end - start) / 1e9,
                    "n_ops": len(line.events)}
    return None


def chrome_trace_device_time_ms(logdir: str) -> Optional[dict]:
    """Parse the profiler's ``*.trace.json.gz`` (Chrome trace format) ->
    the same device-time summary as :func:`xplane_device_time_ms`.

    The chrome trace is plain JSON, so it needs no protobuf gencode — the
    environment's ``tensorboard_plugin_profile`` ships an ``xplane_pb2``
    that fails to import (protobuf descriptor-version mismatch), which is
    why this parser is the primary path.  Device events live under the
    process named ``/device:TPU:N`` on the thread named ``XLA Ops`` with
    microsecond ``ts``/``dur`` fields."""
    import glob
    import gzip

    paths = glob.glob(logdir + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        return None
    import json as _json

    with gzip.open(max(paths)) as f:
        events = _json.load(f).get("traceEvents", [])
    dev_pids = set()
    ops_tids = {}  # pid -> tid of its "XLA Ops" line
    for ev in events:
        if ev.get("ph") != "M":
            continue
        name = (ev.get("args") or {}).get("name", "")
        if ev.get("name") == "process_name" and "/device:" in name:
            dev_pids.add(ev["pid"])
        elif ev.get("name") == "thread_name" and name == "XLA Ops":
            ops_tids[ev["pid"]] = ev["tid"]
    for pid in dev_pids:
        tid = ops_tids.get(pid)
        if tid is None:
            continue
        spans = sorted((ev["ts"], ev["ts"] + ev["dur"]) for ev in events
                       if ev.get("ph") == "X" and ev.get("pid") == pid
                       and ev.get("tid") == tid and "dur" in ev)
        if not spans:
            continue
        # busy = UNION of the op intervals, not the sum of durations: for
        # scan/while-loop programs the trace nests a whole-loop event over
        # its per-iteration body events on the same line, and a plain sum
        # double-counts them (observed: "device time" 1.7x the sustained
        # wall per call on the 50-step sampling pipeline, which is
        # physically impossible on an in-order core)
        busy_us = 0.0
        cur_s, cur_e = spans[0]
        for s, e in spans[1:]:
            if s > cur_e:
                busy_us += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        busy_us += cur_e - cur_s
        # after the sweep cur_e is the global last end (merged segments
        # are disjoint and start-ordered); spans[-1][1] would miss a long
        # early event outlasting the last-starting one
        return {"busy_ms": busy_us / 1e3,
                "span_ms": (cur_e - spans[0][0]) / 1e3,
                "n_ops": len(spans)}
    return None


def chrome_trace_op_table(logdir: str) -> Optional[list]:
    """Per-op aggregation of the device trace's "XLA Ops" line.

    Returns rows ``{"name", "category", "tf_op", "dur_ms", "count",
    "gflops", "mbytes"}`` summed over repeated executions of the same HLO op
    (e.g. scan iterations), sorted by total duration.  ``tf_op`` is the
    JAX/XLA op-metadata path (``jit(step)/transpose(jvp(loss))/dot_general``)
    — ``transpose(`` marks backward ops, explicit ``jax.named_scope`` names
    appear verbatim — which is what lets a caller bucket device time into
    forward / backward / optimizer slabs (the VERDICT r4 train-step
    decomposition).  Container ops that nest their body's events on the same
    timeline (while/conditional/call fusions) are excluded from the rows so
    the table's total approximates the union busy time rather than
    double-counting loop bodies."""
    import glob
    import gzip
    import json as _json

    paths = glob.glob(logdir + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        return None
    with gzip.open(max(paths)) as f:
        events = _json.load(f).get("traceEvents", [])
    dev_pids = set()
    ops_tids = {}
    for ev in events:
        if ev.get("ph") != "M":
            continue
        name = (ev.get("args") or {}).get("name", "")
        if ev.get("name") == "process_name" and "/device:" in name:
            dev_pids.add(ev["pid"])
        elif ev.get("name") == "thread_name" and name == "XLA Ops":
            ops_tids[ev["pid"]] = ev["tid"]
    _SKIP = ("while", "conditional", "call", "all-reduce-start")
    for pid in dev_pids:
        tid = ops_tids.get(pid)
        if tid is None:
            continue
        table = {}
        found = False
        for ev in events:
            if (ev.get("ph") != "X" or ev.get("pid") != pid
                    or ev.get("tid") != tid or "dur" not in ev):
                continue
            found = True
            args = ev.get("args") or {}
            cat = args.get("hlo_category", "")
            if cat in _SKIP:
                continue
            row = table.setdefault(ev.get("name", "?"), {
                "name": ev.get("name", "?"), "category": cat,
                "tf_op": args.get("tf_op", ""), "dur_ms": 0.0, "count": 0,
                "gflops": 0.0, "mbytes": 0.0,
            })
            row["dur_ms"] += ev["dur"] / 1e3
            row["count"] += 1
            row["gflops"] += float(args.get("model_flops", 0) or 0) / 1e9
            row["mbytes"] += float(args.get("bytes_accessed", 0) or 0) / 1e6
        if found:
            return sorted(table.values(), key=lambda r: -r["dur_ms"])
    return None


_PROFILER_WEDGED = False


def profiler_wedged() -> bool:
    """True once a watchdog timeout has marked the remote profiler wedged
    for the rest of the process — callers (bench.py) can annotate rows
    whose device columns are absent for this reason, and timed sections
    following a wedge can account for the orphaned trace thread."""
    return _PROFILER_WEDGED


def traced_device_time_ms(run, iters: int = 3,
                          timeout_s: float = 120.0) -> Optional[dict]:
    """Trace ``iters`` calls of ``run()`` (must block on its result) into a
    temp dir and return per-call device time (busy/span divided by iters).

    The whole trace runs in a watchdog thread: over the remote axon tunnel
    ``jax.profiler.stop_trace()`` intermittently hangs forever (the remote
    runtime's profiler session wedges — observed after a client was killed
    mid-trace).  A hang here must degrade the caller to wall-only numbers,
    not stall a 30-minute bench run, so on timeout we mark the profiler
    wedged for the rest of the process (a second ``start_trace`` would
    raise "profiler already active" anyway) and return None."""
    import shutil
    import tempfile
    import threading

    global _PROFILER_WEDGED
    if _PROFILER_WEDGED:
        return None
    logdir = tempfile.mkdtemp(prefix="devtime_")
    box = {}
    give_up = threading.Event()

    def work():
        try:
            with trace(logdir):
                for _ in range(iters):
                    if give_up.is_set():
                        # the caller timed out and moved on — stop issuing
                        # device work so orphaned iterations don't overlap
                        # (and inflate) the caller's next timed section
                        break
                    run()
            box["stats"] = (chrome_trace_device_time_ms(logdir)
                            or xplane_device_time_ms(logdir))
        except Exception:  # profiler unavailable over some remote backends
            box["stats"] = None

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    try:
        if t.is_alive():  # wedged inside start/stop_trace or collection
            _PROFILER_WEDGED = True
            give_up.set()
            # grace period: if the thread was merely slow (not wedged), let
            # its current iteration drain so it can't pollute the caller's
            # next wall-clock window; a truly wedged stop_trace won't exit
            # and the daemon thread dies with the process
            t.join(10.0)
            return None
        stats = box.get("stats")
        if stats is None:
            return None
        return {"busy_ms": stats["busy_ms"] / iters,
                "span_ms": stats["span_ms"] / iters,
                "n_ops": stats["n_ops"] // iters}
    finally:
        if not t.is_alive():
            shutil.rmtree(logdir, ignore_errors=True)


def enable_debug_nans(enable: bool = True):
    """Opt-in NaN tracing (the TPU-era equivalent of the reference's
    always-on ``torch.autograd.set_detect_anomaly(True)``,
    diffusion_architecture.py:22 — which taxes every step; here it is a
    switch)."""
    jax.config.update("jax_debug_nans", enable)
