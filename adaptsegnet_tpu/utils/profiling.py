"""Step timing + jax.profiler trace hooks (reference has none — SURVEY §5.1)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


class StepTimer:
    """Wall-clock per-step timing with warmup discard and percentiles."""

    def __init__(self, warmup: int = 2):
        self._warmup = warmup
        self._times: list[float] = []
        self._seen = 0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self._warmup:
            self._times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self._times)) if self._times else float("nan")

    @property
    def p50(self) -> float:
        return float(np.median(self._times)) if self._times else float("nan")

    @property
    def best(self) -> float:
        return float(np.min(self._times)) if self._times else float("nan")


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def op_stats(trace_dir: str, device_only: bool = True) -> list[dict]:
    """Per-op stats from the NEWEST xplane under a `trace()` directory.

    Converts via xprof's framework_op_stats tool. Passing only the newest
    .xplane.pb matters: mixing planes from different trace sessions breaks
    the converter. The tool's output format varies by xprof version/backend
    (gviz JSON or CSV); rows are normalized to canonical keys
    {host_or_device, op_type, op_name, occurrences, self_us} and sorted by
    self time (descending). `device_only` keeps rows whose host_or_device
    == "Device" (the CPU backend labels rows "Host" — pass False there).
    """
    import csv
    import glob
    import io
    import json
    import os

    planes = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not planes:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([planes[-1]], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()

    rows: list[dict] = []
    if data.lstrip().startswith(("[", "{")):  # gviz JSON DataTable(s)
        tables = json.loads(data)
        table = tables[0] if isinstance(tables, list) else tables
        ids = [c["id"] for c in table["cols"]]
        for r in table["rows"]:
            vals = {i: (c or {}).get("v") for i, c in zip(ids, r["c"])}
            rows.append({
                "host_or_device": vals.get("host_or_device"),
                "op_type": vals.get("type"),
                "op_name": vals.get("operation"),
                "occurrences": vals.get("occurrences"),
                "self_us": float(vals.get("total_self_time") or 0.0),
            })
    else:  # CSV variant
        for r in csv.DictReader(io.StringIO(data)):
            rows.append({
                "host_or_device": r.get("host_or_device"),
                "op_type": r.get("op_type", r.get("type")),
                "op_name": r.get("op_name", r.get("operation")),
                "occurrences": r.get("occurrences"),
                "self_us": float(r.get("total_self_time_us")
                                 or r.get("total_self_time") or 0.0),
            })
    if device_only:
        rows = [r for r in rows if r["host_or_device"] == "Device"]
    # IDLE rows are kept deliberately: on the TPU they expose dispatch
    # stalls (e.g. the ~280 us/iter while-loop stall CLAUDE.md documents).
    rows.sort(key=lambda r: -r["self_us"])
    return rows


def print_op_stats(rows: list[dict], top: int = 40, iters: int = 1):
    """Top-N ops by device self time + a rollup by op type."""
    total = sum(r["self_us"] for r in rows)
    print(f"device total self time: {total / 1e3:.2f} ms over "
          f"{iters} iters -> {total / 1e3 / max(iters, 1):.2f} ms/step")
    print(f"{'op type':<28} {'occ':>4} {'self ms':>9} {'%':>5}  name")
    for r in rows[:top]:
        # Cells can be None (absent column / null gviz cell, varies by
        # xprof version); str() them so formatting never throws after an
        # expensive trace.
        print(f"{str(r.get('op_type') or ''):<28} "
              f"{str(r.get('occurrences') or ''):>4} "
              f"{r['self_us'] / 1e3:>9.3f} "
              f"{100 * r['self_us'] / max(total, 1e-9):>5.1f}  "
              f"{str(r.get('op_name') or '')[:70]}")
    agg: dict = {}
    for r in rows:
        key = r.get("op_type") or "?"
        agg[key] = agg.get(key, 0.0) + r["self_us"]
    print("\nrollup by op type:")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {k:<32} {v / 1e3:>9.3f} ms  "
              f"{100 * v / max(total, 1e-9):>5.1f}%")
