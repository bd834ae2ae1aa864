"""Window functions (reference: window.slt + bounded_window_agg_exec)."""
import numpy as np
import pytest


def q(ctx, sql):
    return ctx.sql(sql).to_pydict()


@pytest.fixture()
def wctx(ctx):
    ctx.register_arrays("t", {
        "g": np.array(["a", "a", "a", "b", "b"]),
        "v": np.array([10.0, 20.0, 20.0, 5.0, 15.0]),
        "i": np.array([1, 2, 3, 4, 5]),
    })
    return ctx


def test_row_number_rank_dense(wctx):
    out = q(wctx, "SELECT i, row_number() OVER (ORDER BY v) rn, "
                  "rank() OVER (ORDER BY v) rk, dense_rank() OVER (ORDER BY v) dr "
                  "FROM t ORDER BY i")
    assert out["rn"] == [2, 4, 5, 1, 3]
    assert out["rk"] == [2, 4, 4, 1, 3]
    assert out["dr"] == [2, 4, 4, 1, 3]


def test_partitioned_window(wctx):
    out = q(wctx, "SELECT i, row_number() OVER (PARTITION BY g ORDER BY v DESC) rn "
                  "FROM t ORDER BY i")
    assert out["rn"] == [3, 1, 2, 2, 1] or out["rn"] == [3, 2, 1, 2, 1]


def test_running_sum_count(wctx):
    out = q(wctx, "SELECT i, sum(v) OVER (ORDER BY i) s, "
                  "count(*) OVER (ORDER BY i) c FROM t ORDER BY i")
    assert out["s"] == [pytest.approx(x) for x in [10, 30, 50, 55, 70]]
    assert out["c"] == [1, 2, 3, 4, 5]


def test_whole_partition_agg(wctx):
    out = q(wctx, "SELECT i, sum(v) OVER (PARTITION BY g) s FROM t ORDER BY i")
    assert out["s"] == [pytest.approx(x) for x in [50, 50, 50, 20, 20]]


def test_lag_lead(wctx):
    out = q(wctx, "SELECT i, lag(v) OVER (ORDER BY i) lg, "
                  "lead(v) OVER (ORDER BY i) ld, "
                  "lag(v, 2, 0.0) OVER (ORDER BY i) lg2 FROM t ORDER BY i")
    assert out["lg"] == [None, 10.0, 20.0, 20.0, 5.0]
    assert out["ld"] == [20.0, 20.0, 5.0, 15.0, None]
    assert out["lg2"] == [0.0, 0.0, 10.0, 20.0, 20.0]


def test_first_last_nth(wctx):
    out = q(wctx, "SELECT i, first_value(v) OVER (PARTITION BY g ORDER BY i) f, "
                  "nth_value(v, 2) OVER (PARTITION BY g ORDER BY i) n2 "
                  "FROM t ORDER BY i")
    assert out["f"] == [10.0, 10.0, 10.0, 5.0, 5.0]
    # default frame ends at the current peer group: nth(2) is NULL while the
    # running frame holds fewer than 2 rows (reference: window.slt:82)
    assert out["n2"] == [None, 20.0, 20.0, None, 15.0]


def test_rows_frame(wctx):
    out = q(wctx, "SELECT i, sum(v) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING "
                  "AND 1 FOLLOWING) s FROM t ORDER BY i")
    assert out["s"] == [pytest.approx(x) for x in [30, 50, 45, 40, 20]]


def test_min_max_window(wctx):
    out = q(wctx, "SELECT i, min(v) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING "
                  "AND CURRENT ROW) mn, max(v) OVER (PARTITION BY g) mx "
                  "FROM t ORDER BY i")
    assert out["mn"] == [10.0, 10.0, 20.0, 5.0, 5.0]
    assert out["mx"] == [20.0, 20.0, 20.0, 15.0, 15.0]


def test_ntile_percent_cume(wctx):
    out = q(wctx, "SELECT i, ntile(2) OVER (ORDER BY i) n, "
                  "percent_rank() OVER (ORDER BY v) pr, "
                  "cume_dist() OVER (ORDER BY v) cd FROM t ORDER BY i")
    assert out["n"] == [1, 1, 1, 2, 2]
    assert out["pr"][3] == pytest.approx(0.0)
    assert out["cd"][0] == pytest.approx(2 / 5)


class TestBoundedWindow:
    """BoundedWindowExec: shared PARTITION BY windows stream partition
    runs (reference: bounded_window_agg_exec.rs)."""

    def test_selected_and_correct(self, ctx):
        import numpy as np
        import pandas as pd
        rng = np.random.default_rng(0)
        n = 5000
        g = rng.integers(0, 40, n)
        v = rng.normal(size=n)
        ctx.register_arrays("bw", {"g": g, "v": v})
        q = ("SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) rn, "
             "sum(v) OVER (PARTITION BY g) s FROM bw")
        pl = ctx.sql("EXPLAIN " + q).to_pydict()
        assert any("BoundedWindow" in r for r in pl["plan"])
        out = ctx.sql(q + " ORDER BY g, v").to_pandas()
        pdf = pd.DataFrame({"g": g, "v": v}).sort_values(["g", "v"]) \
            .reset_index(drop=True)
        np.testing.assert_array_equal(
            out["rn"].to_numpy(), (pdf.groupby("g").cumcount() + 1).to_numpy())
        np.testing.assert_allclose(
            out["s"].to_numpy(),
            pdf.groupby("g")["v"].transform("sum").to_numpy(), rtol=1e-9)

    def test_mixed_partitions_fall_back(self, ctx):
        import numpy as np
        ctx.register_arrays("bw2", {"g": [1, 1, 2], "h": [1, 2, 2],
                                    "v": [1.0, 2.0, 3.0]})
        q = ("SELECT sum(v) OVER (PARTITION BY g) a, "
             "sum(v) OVER (PARTITION BY h) b FROM bw2")
        pl = ctx.sql("EXPLAIN " + q).to_pydict()
        assert not any("BoundedWindow" in r for r in pl["plan"])
        out = ctx.sql(q).to_pydict()
        assert sorted(out["a"]) == [3.0, 3.0, 3.0]
        assert sorted(out["b"]) == [1.0, 5.0, 5.0]


class TestQualify:
    """QUALIFY clause (reference: sql/src/select.rs qualify planning —
    filter on window results applied after the Window stage)."""

    def test_qualify_alias_reference(self, wctx):
        out = q(wctx, "SELECT g, v, row_number() OVER "
                      "(PARTITION BY g ORDER BY v DESC, i) rn FROM t "
                      "QUALIFY rn = 1 ORDER BY g")
        assert out["g"] == ["a", "b"]
        assert out["v"] == [20.0, 15.0]

    def test_qualify_bare_window(self, wctx):
        out = q(wctx, "SELECT g, v FROM t QUALIFY row_number() OVER "
                      "(PARTITION BY g ORDER BY v, i) = 1 ORDER BY g")
        assert out["v"] == [10.0, 5.0]

    def test_qualify_with_aggregate(self, wctx):
        out = q(wctx, "SELECT g, sum(v) s FROM t GROUP BY g "
                      "QUALIFY rank() OVER (ORDER BY sum(v) DESC) = 1")
        assert out["g"] == ["a"] and out["s"] == [50.0]
