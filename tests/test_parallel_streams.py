"""Parallel host partition streaming (reference: stream.rs:212
RecordBatchReceiverStream — one task per partition feeding a channel)."""
import threading
import time

import numpy as np
import pytest

import datafusion_tpu as df
from datafusion_tpu.physical.plan.base import (collect,
                                               parallel_partition_stream)


def _ctx(parallel=True):
    ctx = df.SessionContext()
    ctx.sql("SET datafusion.execution.parallel_host_streams = "
            + ("true" if parallel else "false"))
    return ctx


def _register(ctx, n=40_000, parts=4):
    rng = np.random.default_rng(0)
    from datafusion_tpu.datasource.memory import MemTable
    cols = {"k": rng.integers(0, 97, n), "v": rng.random(n)}
    ctx.register_table("t", MemTable.from_arrays(cols, n_partitions=parts))


def test_parallel_matches_serial():
    out = []
    for flag in (True, False):
        ctx = _ctx(flag)
        _register(ctx)
        out.append(ctx.sql(
            "SELECT k, sum(v) s, count(*) c FROM t GROUP BY k ORDER BY k"
        ).to_pydict())
    assert out[0] == out[1]


def test_parallel_join_matches_serial():
    out = []
    for flag in (True, False):
        ctx = _ctx(flag)
        _register(ctx)
        out.append(ctx.sql(
            "SELECT a.k, count(*) c FROM t a JOIN t b ON a.k = b.k "
            "GROUP BY a.k ORDER BY c DESC, a.k LIMIT 5").to_pydict())
    assert out[0] == out[1]


def test_ordered_mode_preserves_partition_order():
    """ordered=True must yield partition 0's rows before partition 1's."""
    ctx = _ctx(True)
    from datafusion_tpu.datasource.memory import MemTable
    ctx.register_table("s", MemTable.from_arrays(
        {"p": np.arange(8)}, n_partitions=4))
    phys = ctx.sql("SELECT p FROM s").create_physical_plan()
    vals = []
    for b in parallel_partition_stream(phys, ctx.task_context(),
                                       ordered=True):
        vals.extend(np.asarray(b.columns[0].data_host()).tolist())
    serial = []
    tctx = ctx.task_context()
    for p in range(phys.output_partitioning().n):
        for b in phys.execute(p, tctx):
            serial.extend(np.asarray(b.columns[0].data_host()).tolist())
    assert vals == serial


def test_error_propagates_from_worker_thread():
    ctx = _ctx(True)
    _register(ctx)
    from datafusion_tpu.common.errors import DataFusionError
    with pytest.raises(DataFusionError):
        ctx.sql("SELECT 1 // (k - k) FROM t").collect()


def test_abandoned_stream_unblocks_producers():
    """A consumer that stops early (LIMIT) must not leave producer
    threads blocked forever on a full queue."""
    ctx = _ctx(True)
    _register(ctx, n=200_000, parts=4)
    before = threading.active_count()
    phys = ctx.sql("SELECT v FROM t").create_physical_plan()
    stream = parallel_partition_stream(phys, ctx.task_context(),
                                       ordered=True, queue_depth=1)
    next(stream)
    stream.close()  # GeneratorExit -> cancel flag
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
