"""SQL planner -> mesh-distributed aggregation
(`SET datafusion.tpu.mesh_devices = N`): SPMD shard_map grouping +
ICI-style exchange, checked against pandas on the virtual 8-device mesh."""
import numpy as np
import pandas as pd
import pytest

import datafusion_tpu as df
from datafusion_tpu.physical.plan.distributed_aggregate import (
    DistributedAggregateExec,
)


@pytest.fixture()
def mesh_ctx():
    ctx = df.SessionContext()
    ctx.config.set("datafusion.tpu.mesh_devices", 8)
    return ctx


def _spy(monkeypatch):
    calls = []
    orig = DistributedAggregateExec._execute_device

    def wrapper(self, p, c):
        calls.append(self.mesh_devices)
        return orig(self, p, c)

    monkeypatch.setattr(DistributedAggregateExec, "_execute_device", wrapper)
    return calls


def test_distributed_group_by_matches_pandas(mesh_ctx, monkeypatch):
    calls = _spy(monkeypatch)
    rng = np.random.default_rng(1)
    n = 50_000
    g = rng.integers(0, 30, n)
    v = rng.normal(5, 2, n)
    x = rng.integers(0, 500, n)
    s = rng.choice(["p", "q", "r"], n).astype(object)
    mesh_ctx.register_arrays("t", {"g": g, "v": v, "x": x, "s": s})
    out = mesh_ctx.sql(
        "SELECT g, s, count(*) c, sum(v) sv, avg(v) av, min(x) mn, max(x) mx "
        "FROM t WHERE x > 50 GROUP BY g, s ORDER BY g, s").to_pandas()
    pdf = pd.DataFrame({"g": g, "v": v, "x": x, "s": s})
    pdf = pdf[pdf.x > 50]
    exp = pdf.groupby(["g", "s"]).agg(
        c=("v", "size"), sv=("v", "sum"), av=("v", "mean"),
        mn=("x", "min"), mx=("x", "max")).reset_index().sort_values(["g", "s"])
    assert calls, "distributed path was not used"
    assert len(out) == len(exp)
    np.testing.assert_array_equal(out["c"].to_numpy(), exp["c"].to_numpy())
    np.testing.assert_allclose(out["sv"].to_numpy(), exp["sv"].to_numpy(),
                               rtol=1e-9)
    np.testing.assert_allclose(out["av"].to_numpy(), exp["av"].to_numpy(),
                               rtol=1e-9)
    np.testing.assert_array_equal(out["mn"].to_numpy(), exp["mn"].to_numpy())
    np.testing.assert_array_equal(out["mx"].to_numpy(), exp["mx"].to_numpy())


def test_distributed_nullable_keys_and_args(mesh_ctx, monkeypatch):
    calls = _spy(monkeypatch)
    from datafusion_tpu.common import dt
    from datafusion_tpu.common.batch import Batch
    from datafusion_tpu.common.column import Column
    from datafusion_tpu.common.schema import Field, Schema
    from datafusion_tpu.datasource.memory import MemTable
    g = np.array([1, 1, 2, 2, 3], np.int64)
    gv = np.array([True, True, True, False, True])
    v = np.array([10.0, 20.0, 30.0, 40.0, 50.0])
    vv = np.array([True, False, True, True, True])
    schema = Schema([Field("g", dt.INT64, True), Field("v", dt.FLOAT64, True)])
    batch = Batch(schema, [Column(dt.INT64, g, gv), Column(dt.FLOAT64, v, vv)])
    mesh_ctx.register_table("t", MemTable(schema, [[batch]]))
    out = mesh_ctx.sql(
        "SELECT g, count(v) c, sum(v) s FROM t GROUP BY g ORDER BY g NULLS FIRST"
    ).to_pydict()
    assert calls
    assert out == {"g": [None, 1, 2, 3], "c": [1, 1, 1, 1],
                   "s": [40.0, 10.0, 30.0, 50.0]}


def test_distributed_scalar_aggregate(mesh_ctx, monkeypatch):
    calls = _spy(monkeypatch)
    mesh_ctx.register_arrays("t", {"v": np.arange(10_001, dtype=np.float64)})
    out = mesh_ctx.sql("SELECT sum(v) s, count(*) c FROM t").to_pydict()
    assert calls
    assert out == {"s": [10_001 * 10_000 / 2], "c": [10_001]}


def test_distributed_falls_back_for_median(mesh_ctx):
    mesh_ctx.register_arrays("t", {"g": [1, 1, 2], "v": [1.0, 3.0, 5.0]})
    out = mesh_ctx.sql(
        "SELECT g, median(v) m FROM t GROUP BY g ORDER BY g").to_pydict()
    assert out == {"g": [1, 2], "m": [2.0, 5.0]}
