"""Benchmark: fused TPC-H Q1 hash aggregation on the device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: TPC-H Q1 over SF1-sized lineitem (6M rows) — the reference's
headline hash-aggregation query. Baseline: reference `tpch_mem` Q1 =
2182.44 ms for SF1 (BASELINE.md), i.e. ~2.75M rows/s on its (unspecified)
CPU. vs_baseline = our_throughput / baseline_throughput.
"""
from __future__ import annotations

import json
import time

import numpy as np

SF1_ROWS = 6_001_215
BASELINE_Q1_MS = 2182.44
BASELINE_ROWS_PER_SEC = SF1_ROWS / (BASELINE_Q1_MS / 1000.0)


def main():
    import datafusion_tpu.device  # noqa: F401 — x64 on
    import jax
    from __graft_entry__ import _q1_inputs, q1_device_step

    n = SF1_ROWS
    inputs = _q1_inputs(n)
    args = (inputs["returnflag"], inputs["linestatus"], inputs["shipdate"],
            inputs["qty"], inputs["price"], inputs["disc"], inputs["tax"])
    step = jax.jit(q1_device_step)

    # warmup / compile
    out = step(*args)
    jax.block_until_ready(out)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = step(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    rows_per_sec = n / best
    print(json.dumps({
        "metric": "tpch_q1_sf1_rows_per_sec",
        "value": round(rows_per_sec, 1),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_sec / BASELINE_ROWS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
