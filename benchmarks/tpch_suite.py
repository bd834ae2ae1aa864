"""Full TPC-H suite benchmark on the real chip (tpch_mem mode).

Runs all 22 queries at the given scale factor through the complete
engine (SQL -> optimize -> physical plan -> device execution), records
cold (first, includes compile + staging) and best-warm times, and the
ratio vs the reference's published `tpch_mem` numbers (BASELINE.md).

Usage: python benchmarks/tpch_suite.py [SF] [--json out.json]
Methodology: warm = best of 3 after one cold run in the same process
(device staging and compiled programs cached, like repeated queries in a
long-lived engine).
"""
from __future__ import annotations

import json
import sys
import time

# reference tpch_mem SF1 (ms), "main" column of the published example run
# (BASELINE.md / reference benchmarks/README.md:132-160; hardware unspecified)
BASELINE_MEM_MS = {
    1: 2182.44, 2: 181.16, 3: 98.89, 4: 61.43, 5: 260.20, 6: 24.24,
    7: 545.87, 8: 147.48, 9: 371.53, 10: 197.91, 11: 197.91,
    12: 100.32, 13: 428.02, 14: 38.50, 15: 101.15, 16: 171.15,
    17: 1885.05, 18: 1549.92, 19: 106.53, 20: 532.11, 21: 723.39,
    22: 91.84,
}


def main():
    sf = 1.0
    out_json = None
    args = sys.argv[1:]
    if args and not args[0].startswith("--"):
        sf = float(args[0])
        args = args[1:]
    if args[:1] == ["--json"]:
        out_json = args[1]

    import datafusion_tpu as df
    from datafusion_tpu.tpch import QUERIES, register_tpch

    t0 = time.time()
    ctx = df.SessionContext()
    register_tpch(ctx, sf=sf, seed=1)
    gen_s = time.time() - t0
    print(f"# data generated sf={sf} in {gen_s:.1f}s", flush=True)

    rows = []
    for n in sorted(QUERIES):
        t0 = time.time()
        ctx.sql(QUERIES[n]).collect_batch()
        cold = time.time() - t0
        warm = []
        for _ in range(3):
            t0 = time.time()
            ctx.sql(QUERIES[n]).collect_batch()
            warm.append(time.time() - t0)
        w = min(warm)
        base = BASELINE_MEM_MS.get(n)
        ratio = (base / 1000.0 / w) if base and sf == 1.0 else None
        rows.append({"q": n, "cold_ms": round(cold * 1000, 1),
                     "warm_ms": round(w * 1000, 1),
                     "baseline_ms": base,
                     "vs_baseline": round(ratio, 2) if ratio else None})
        print(f"Q{n:<3d} cold {cold*1000:9.1f}ms  warm {w*1000:9.1f}ms"
              + (f"  vs_ref {ratio:6.2f}x" if ratio else ""), flush=True)

    if sf == 1.0:
        ratios = [r["vs_baseline"] for r in rows if r["vs_baseline"]]
        geo = 1.0
        for r in ratios:
            geo *= r
        geo **= 1.0 / len(ratios)
        total_warm = sum(r["warm_ms"] for r in rows)
        total_base = sum(BASELINE_MEM_MS.values())
        print(f"# geomean vs tpch_mem baseline: {geo:.2f}x; "
              f"suite warm {total_warm:.0f}ms vs baseline {total_base:.0f}ms",
              flush=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"sf": sf, "mode": "mem",
                       "methodology": "cold=first run (compile+staging); "
                       "warm=best of 3, same process", "queries": rows}, f,
                      indent=1)


if __name__ == "__main__":
    main()
