"""StreamingTableExec + PipelineChecker (reference: stream.rs,
streaming.rs:207, pipeline_checker.rs:18)."""
import numpy as np
import pytest

import datafusion_tpu as df
from datafusion_tpu.common.batch import Batch
from datafusion_tpu.common.errors import PlanError
from datafusion_tpu.datasource.stream import StreamTable


def _schema_batch():
    return Batch.from_arrays({"x": np.arange(10),
                              "s": np.array(["a", "b"] * 5)})


def test_bounded_stream_scan_aggregates():
    ctx = df.SessionContext()

    def source():
        for i in range(5):
            yield Batch.from_arrays({"x": np.arange(10) + 10 * i,
                                     "s": np.array(["a", "b"] * 5)})
    ctx.register_table("st", StreamTable(_schema_batch().schema, source,
                                         unbounded=False))
    out = ctx.sql("SELECT count(*) c, sum(x) s FROM st WHERE x % 2 = 0"
                  ).to_pydict()
    assert out["c"] == [25]
    assert out["s"] == [sum(v for v in range(50) if v % 2 == 0)]


def test_unbounded_stream_limit_streams_incrementally():
    ctx = df.SessionContext()
    pulled = []

    def infinite():
        i = 0
        while True:
            pulled.append(i)
            yield Batch.from_arrays({"x": np.arange(10) + 10 * i,
                                     "s": np.array(["a", "b"] * 5)})
            i += 1
    ctx.register_table("inf", StreamTable(_schema_batch().schema, infinite))
    out = ctx.sql("SELECT x FROM inf LIMIT 7").to_pydict()
    assert out["x"] == list(range(7))
    assert len(pulled) <= 3     # back-pressure: only a prefix was pulled


def test_pipeline_checker_rejects_blocking_ops_on_unbounded():
    ctx = df.SessionContext()

    def infinite():
        while True:
            yield _schema_batch()
    ctx.register_table("inf", StreamTable(_schema_batch().schema, infinite))
    with pytest.raises(PlanError):
        ctx.sql("SELECT sum(x) FROM inf").collect()
    with pytest.raises(PlanError):
        ctx.sql("SELECT * FROM inf ORDER BY x").collect()
    ctx.register_arrays("dim", {"k": np.arange(5)})
    with pytest.raises(PlanError):
        # unbounded build side of a hash join
        ctx.sql("SELECT count(*) FROM dim JOIN inf ON x = k LIMIT 1"
                ).collect()
