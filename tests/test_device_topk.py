"""Fused device top-k (ORDER BY <count agg> LIMIT k into
DeviceGroupAggregateExec) + the unbounded-cardinality big path.

Reference analog: physical_optimizer/topk_aggregation.rs — the reference
limits the group state; here the selection runs on-device (lax.top_k) so
only k group rows cross the device->host boundary.
"""
import numpy as np
import pandas as pd
import pytest

import datafusion_tpu as df
from datafusion_tpu.datasource.memory import MemTable


@pytest.fixture()
def ctx():
    return df.SessionContext()


def _expected_counts(u, k, asc=False):
    vc = pd.Series(u).value_counts()
    vals = sorted(vc.tolist()) if asc else sorted(vc.tolist(), reverse=True)
    return vals[:k]


def test_topk_fused_into_plan(ctx):
    rng = np.random.default_rng(0)
    ctx.register_arrays("t", {"u": (rng.zipf(1.3, 50000) % 997).astype(np.int64)})
    phys = ctx.sql(
        "SELECT u, count(*) c FROM t GROUP BY u ORDER BY c DESC LIMIT 10"
    ).create_physical_plan()
    assert "topk=[count(*) DESC LIMIT 10]" in phys.display_indent()


def test_topk_matches_host_oracle(ctx):
    rng = np.random.default_rng(1)
    u = (rng.zipf(1.3, 80000) % 2003).astype(np.int64)
    ctx.register_arrays("t", {"u": u})
    out = ctx.sql(
        "SELECT u, count(*) c FROM t GROUP BY u ORDER BY c DESC LIMIT 10"
    ).to_pydict()
    assert out["c"] == _expected_counts(u, 10)


def test_topk_ascending(ctx):
    rng = np.random.default_rng(2)
    u = (rng.zipf(1.3, 30000) % 503).astype(np.int64)
    ctx.register_arrays("t", {"u": u})
    out = ctx.sql(
        "SELECT u, count(*) c FROM t GROUP BY u ORDER BY c ASC LIMIT 5"
    ).to_pydict()
    assert out["c"] == _expected_counts(u, 5, asc=True)


def test_topk_fewer_groups_than_k(ctx):
    ctx.register_arrays("t", {"u": np.array([1, 1, 2], dtype=np.int64)})
    out = ctx.sql(
        "SELECT u, count(*) c FROM t GROUP BY u ORDER BY c DESC LIMIT 10"
    ).to_pydict()
    assert out["u"] == [1, 2] and out["c"] == [2, 1]


def test_big_cardinality_overflow_reroutes_to_sorted_path(ctx):
    """Group count above the fixed device table: the poison sentinel must
    re-route to device_group_aggregate_big, not the host fallback."""
    rng = np.random.default_rng(3)
    u = np.concatenate([rng.integers(0, 200_000, 300_000),
                        np.full(700, 42)]).astype(np.int64)
    ctx.register_arrays("t", {"u": u})
    out = ctx.sql(
        "SELECT u, count(*) c FROM t GROUP BY u ORDER BY c DESC LIMIT 3"
    ).to_pydict()
    assert out["u"][0] == 42
    assert out["c"] == _expected_counts(u, 3)


def test_big_path_all_agg_kinds_multichunk(ctx):
    rng = np.random.default_rng(4)
    u = rng.integers(0, 120_000, 400_000).astype(np.int64)
    v = rng.integers(-50, 50, 400_000).astype(np.int64)
    ctx.register_table("t", MemTable.from_arrays({"u": u, "v": v},
                                                 n_partitions=3))
    out = ctx.sql(
        "SELECT u, count(*) c, sum(v) s, min(v) mn, max(v) mx FROM t "
        "GROUP BY u ORDER BY c DESC LIMIT 6").to_pydict()
    g = pd.DataFrame({"u": u, "v": v}).groupby("u").agg(
        c=("v", "size"), s=("v", "sum"), mn=("v", "min"), mx=("v", "max"))
    assert out["c"] == g["c"].sort_values(ascending=False).head(6).tolist()
    want = {int(k): (int(r.c), int(r.s), int(r.mn), int(r.mx))
            for k, r in g.iterrows()}
    for i, uu in enumerate(out["u"]):
        assert want[uu] == (out["c"][i], out["s"][i],
                            out["mn"][i], out["mx"][i])


def test_topk_with_filter_and_float_outputs(ctx):
    """Order lane is the count; other output lanes may be float (avg)."""
    rng = np.random.default_rng(5)
    u = (rng.zipf(1.4, 60000) % 701).astype(np.int64)
    w = rng.random(60000)
    ctx.register_arrays("t", {"u": u, "w": w})
    out = ctx.sql(
        "SELECT u, count(*) c, avg(w) a FROM t WHERE u <> 3 GROUP BY u "
        "ORDER BY c DESC LIMIT 8").to_pydict()
    f = pd.DataFrame({"u": u, "w": w})
    f = f[f.u != 3]
    g = f.groupby("u").agg(c=("w", "size"), a=("w", "mean"))
    assert out["c"] == g["c"].sort_values(ascending=False).head(8).tolist()
    want = {int(k): r.a for k, r in g.iterrows()}
    for i, uu in enumerate(out["u"]):
        np.testing.assert_allclose(out["a"][i], want[uu], rtol=1e-12)


def test_count_distinct_order_not_fused_wrong(ctx):
    """ORDER BY a count(distinct) column stays correct (fused via the
    distinct lane or not fused at all)."""
    rng = np.random.default_rng(6)
    u = (rng.zipf(1.4, 40000) % 301).astype(np.int64)
    v = rng.integers(0, 50, 40000).astype(np.int64)
    ctx.register_arrays("t", {"u": u, "v": v})
    out = ctx.sql(
        "SELECT u, count(distinct v) d FROM t GROUP BY u "
        "ORDER BY d DESC, u LIMIT 5").to_pydict()
    g = pd.DataFrame({"u": u, "v": v}).groupby("u").v.nunique()
    exp = g.reset_index().sort_values(["v", "u"],
                                      ascending=[False, True]).head(5)
    assert out["d"] == exp["v"].tolist()
