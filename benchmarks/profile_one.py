"""Profile one TPC-H query end-to-end on the real chip: where does the
warm time go? Usage: python benchmarks/profile_one.py Q [SF] [--profile]"""
import cProfile
import io
import pstats
import sys
import time


def main():
    qn = int(sys.argv[1])
    sf = float(sys.argv[2]) if len(sys.argv) > 2 and \
        not sys.argv[2].startswith("--") else 1.0
    do_prof = "--profile" in sys.argv

    import datafusion_tpu as df
    from datafusion_tpu.tpch import QUERIES, register_tpch

    t0 = time.time()
    ctx = df.SessionContext()
    register_tpch(ctx, sf=sf, seed=1)
    print(f"# gen {time.time()-t0:.1f}s", flush=True)

    sql = QUERIES[qn]
    t0 = time.time()
    ctx.sql(sql).collect_batch()
    print(f"# cold {time.time()-t0:.2f}s", flush=True)
    for i in range(2):
        t0 = time.time()
        ctx.sql(sql).collect_batch()
        print(f"# warm{i} {time.time()-t0:.3f}s", flush=True)

    # phase breakdown: parse/plan vs execute
    t0 = time.time()
    frame = ctx.sql(sql)
    t_plan = time.time() - t0
    t0 = time.time()
    frame.collect_batch()
    t_exec = time.time() - t0
    print(f"# plan {t_plan*1000:.1f}ms exec {t_exec*1000:.1f}ms", flush=True)

    print(ctx.sql("EXPLAIN ANALYZE " + sql).to_pydict(), flush=True)

    if do_prof:
        pr = cProfile.Profile()
        pr.enable()
        ctx.sql(sql).collect_batch()
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(45)
        print(s.getvalue())


if __name__ == "__main__":
    main()
