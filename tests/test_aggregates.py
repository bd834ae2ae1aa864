"""Aggregation: grouped/scalar, all accumulators, FILTER, grouping sets,
and a seeded differential fuzz vs pandas (SURVEY.md §4.3 aggregate_fuzz)."""
import numpy as np
import pytest


def q(ctx, sql):
    return ctx.sql(sql).to_pydict()


def test_scalar_aggregates(emp_ctx):
    out = q(emp_ctx, "SELECT count(*) c, sum(sal) s, avg(sal) a, "
                     "min(sal) mn, max(sal) mx FROM emp")
    assert out == {"c": [5], "s": [pytest.approx(1500.0)],
                   "a": [pytest.approx(300.0)],
                   "mn": [pytest.approx(100.0)], "mx": [pytest.approx(500.0)]}


def test_empty_input_aggregates(ctx):
    ctx.register_arrays("t", {"a": np.array([1.0])})
    out = q(ctx, "SELECT count(*) c, sum(a) s, min(a) m FROM t WHERE a > 100")
    assert out == {"c": [0], "s": [None], "m": [None]}


def test_group_by_string(emp_ctx):
    out = q(emp_ctx, "SELECT dept, count(*) c, sum(sal) s FROM emp "
                     "GROUP BY dept ORDER BY dept")
    assert out["dept"] == ["a", "b", "c"]
    assert out["c"] == [2, 2, 1]
    assert out["s"] == [pytest.approx(400.0), pytest.approx(700.0),
                        pytest.approx(400.0)]


def test_group_by_expression(emp_ctx):
    out = q(emp_ctx, "SELECT sal > 250 AS hi, count(*) c FROM emp "
                     "GROUP BY sal > 250 ORDER BY hi")
    assert out["hi"] == [False, True]
    assert out["c"] == [2, 3]


def test_count_null_skipping(ctx):
    ctx.register_arrays("t", {
        "g": np.array(["x", "x", "y"]),
        "v": np.array([1.0, np.nan, 3.0]),
    })
    # NaN is a valid float, not NULL — count sees it
    out = q(ctx, "SELECT g, count(v) c FROM t GROUP BY g ORDER BY g")
    assert out["c"] == [2, 1]


def test_min_max_strings(emp_ctx):
    out = q(emp_ctx, "SELECT min(dept) a, max(dept) b FROM emp")
    assert out == {"a": ["a"], "b": ["c"]}


def test_variance_family(ctx):
    ctx.register_arrays("t", {"v": np.array([2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0])})
    out = q(ctx, "SELECT var_pop(v) vp, var_samp(v) vs, stddev_pop(v) sp, "
                 "stddev(v) ss FROM t")
    assert out["vp"] == [pytest.approx(4.0)]
    assert out["vs"] == [pytest.approx(32.0 / 7.0)]
    assert out["sp"] == [pytest.approx(2.0)]


def test_median_and_percentile(ctx):
    ctx.register_arrays("t", {"v": np.array([1.0, 2.0, 3.0, 4.0])})
    out = q(ctx, "SELECT median(v) m FROM t")
    assert out["m"] == [pytest.approx(2.5)]


def test_corr_covar(ctx):
    ctx.register_arrays("t", {"x": np.array([1.0, 2.0, 3.0]),
                              "y": np.array([2.0, 4.0, 6.0])})
    out = q(ctx, "SELECT corr(x, y) c, covar_pop(x, y) cp FROM t")
    assert out["c"] == [pytest.approx(1.0)]
    assert out["cp"] == [pytest.approx(4.0 / 3.0)]


def test_count_distinct(emp_ctx):
    out = q(emp_ctx, "SELECT count(DISTINCT dept) c, approx_distinct(dept) a FROM emp")
    assert out["c"] == [3]
    assert out["a"] == [3]


def test_bool_and_bit_aggs(ctx):
    ctx.register_arrays("t", {"b": np.array([True, True, False]),
                              "i": np.array([6, 3, 5])})
    out = q(ctx, "SELECT bool_and(b) ba, bool_or(b) bo, bit_and(i) ia, "
                 "bit_or(i) io_, bit_xor(i) ix FROM t")
    assert out == {"ba": [False], "bo": [True], "ia": [6 & 3 & 5],
                   "io_": [6 | 3 | 5], "ix": [6 ^ 3 ^ 5]}


def test_first_last_value(emp_ctx):
    out = q(emp_ctx, "SELECT dept, first_value(id) f, last_value(id) l "
                     "FROM emp GROUP BY dept ORDER BY dept")
    assert out["f"] == [1, 2, 4]
    assert out["l"] == [3, 5, 4]


def test_agg_filter_clause(emp_ctx):
    out = q(emp_ctx, "SELECT count(*) FILTER (WHERE sal > 250) c FROM emp")
    assert out["c"] == [3]


def test_having(emp_ctx):
    out = q(emp_ctx, "SELECT dept, sum(sal) s FROM emp GROUP BY dept "
                     "HAVING count(*) > 1 ORDER BY dept")
    assert out["dept"] == ["a", "b"]


def test_rollup(emp_ctx):
    out = q(emp_ctx, "SELECT dept, count(*) c FROM emp GROUP BY ROLLUP(dept) "
                     "ORDER BY dept NULLS LAST")
    assert out["dept"] == ["a", "b", "c", None]
    assert out["c"] == [2, 2, 1, 5]


def test_string_agg(emp_ctx):
    out = q(emp_ctx, "SELECT dept, string_agg(dept, '|') s FROM emp "
                     "GROUP BY dept ORDER BY dept")
    assert out["s"] == ["a|a", "b|b", "c"]


def test_aggregate_fuzz_vs_pandas(ctx):
    """Differential test against pandas groupby (the reference fuzzes
    sorted-agg vs hash-agg; our oracle is pandas)."""
    import pandas as pd
    rng = np.random.default_rng(42)
    n = 5000
    g1 = rng.integers(0, 50, n)
    g2 = rng.choice(list("abcdefgh"), n)
    v = rng.normal(size=n) * 100
    ctx.register_arrays("t", {"g1": g1, "g2": g2.astype(object), "v": v})
    out = ctx.sql("SELECT g1, g2, count(*) c, sum(v) s, min(v) mn, max(v) mx, "
                  "avg(v) a FROM t GROUP BY g1, g2 ORDER BY g1, g2").to_pandas()
    pdf = pd.DataFrame({"g1": g1, "g2": g2, "v": v})
    exp = pdf.groupby(["g1", "g2"], as_index=False).agg(
        c=("v", "size"), s=("v", "sum"), mn=("v", "min"), mx=("v", "max"),
        a=("v", "mean")).sort_values(["g1", "g2"]).reset_index(drop=True)
    assert len(out) == len(exp)
    np.testing.assert_array_equal(out["g1"].to_numpy(), exp["g1"].to_numpy())
    np.testing.assert_allclose(out["s"].to_numpy(), exp["s"].to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(out["mn"].to_numpy(), exp["mn"].to_numpy())
    np.testing.assert_allclose(out["a"].to_numpy(), exp["a"].to_numpy(), rtol=1e-9)


def test_two_phase_partitioned_aggregation(ctx):
    """Multi-partition input plans Partial -> hash Repartition -> Final
    (reference: AggregateMode FinalPartitioned, aggregates/mod.rs:64)."""
    import pandas as pd
    rng = np.random.default_rng(11)
    n = 40_000
    g = rng.choice(list("abcdefghij"), n).astype(object)
    v = rng.normal(size=n)
    from datafusion_tpu.datasource.memory import MemTable
    ctx.register_table("t", MemTable.from_arrays({"g": g, "v": v},
                                                 n_partitions=4))
    ctx.config.set("datafusion.tpu.device_aggregate", False)
    d = ctx.sql("SELECT g, count(*) c, sum(v) s, min(v) mn FROM t "
                "GROUP BY g ORDER BY g")
    text = d.create_physical_plan().display_indent()
    assert "mode=Partial" in text and "FinalPartitioned" in text, text
    assert "RepartitionExec" in text
    out = d.to_pandas()
    exp = pd.DataFrame({"g": g, "v": v}).groupby("g", as_index=False).agg(
        c=("v", "size"), s=("v", "sum"), mn=("v", "min")).sort_values("g")
    np.testing.assert_array_equal(out["c"].to_numpy(), exp["c"].to_numpy())
    np.testing.assert_allclose(out["s"].to_numpy(), exp["s"].to_numpy(),
                               rtol=1e-9)
    np.testing.assert_allclose(out["mn"].to_numpy(), exp["mn"].to_numpy())


class TestSketches:
    """HyperLogLog approx_distinct + t-digest approx_percentile_cont
    (reference: hyperloglog.rs, tdigest.rs)."""

    def test_approx_distinct_within_2pct(self, ctx):
        import numpy as np
        rng = np.random.default_rng(7)
        n = 100_000
        ctx.register_arrays("hll_t", {
            "g": rng.integers(0, 2, n), "x": rng.integers(0, 20_000, n)})
        out = ctx.sql(
            "SELECT g, approx_distinct(x) d, count(distinct x) e "
            "FROM hll_t GROUP BY g ORDER BY g").to_pydict()
        for d, e in zip(out["d"], out["e"]):
            assert abs(d - e) / e < 0.02

    def test_approx_percentile_tdigest(self, ctx):
        import numpy as np
        rng = np.random.default_rng(8)
        v = rng.normal(100, 15, 50_000)
        ctx.register_arrays("td_t", {"v": v})
        out = ctx.sql(
            "SELECT approx_percentile_cont(v, 0.5) m, "
            "approx_percentile_cont(v, 0.95) p FROM td_t").to_pydict()
        assert abs(out["m"][0] - np.percentile(v, 50)) < 0.5
        assert abs(out["p"][0] - np.percentile(v, 95)) < 0.5

    def test_approx_percentile_small_exact(self, ctx):
        import numpy as np
        ctx.register_arrays("td_s", {"v": np.arange(101, dtype=np.float64)})
        out = ctx.sql(
            "SELECT approx_percentile_cont(v, 0.5) a FROM td_s").to_pydict()
        # reference-faithful t-digest compresses 101 values into 100
        # centroids; the interpolated median lands within one centroid width
        assert abs(out["a"][0] - 50.0) < 0.5

    def test_approx_median_tdigest(self, ctx):
        import numpy as np
        rng = np.random.default_rng(9)
        v = rng.normal(0, 5, 30_000)
        ctx.register_arrays("am_t", {"v": v})
        out = ctx.sql("SELECT approx_median(v) m FROM am_t").to_pydict()
        assert abs(out["m"][0] - np.median(v)) < 0.2
