"""Memory-limit enforcement (reference: core/tests/memory_limit/mod.rs —
run real queries under tiny memory pools and expect a clean
ResourcesExhausted error, never an OOM or wrong result)."""
import numpy as np
import pytest

import datafusion_tpu as df
from datafusion_tpu.common.errors import ResourcesExhausted
from datafusion_tpu.runtime import (FairSpillPool, GreedyMemoryPool,
                                    MemoryReservation, RuntimeEnv,
                                    UnboundedMemoryPool)


def _ctx(pool):
    ctx = df.SessionContext(runtime=RuntimeEnv(memory_pool=pool))
    rng = np.random.default_rng(0)
    n = 50_000
    ctx.register_arrays("t", {
        "k": rng.integers(0, 1000, n),
        "v": rng.normal(size=n),
        "s": rng.choice(list("abcdefgh"), n).astype(object),
    })
    return ctx


def test_sort_exceeds_tiny_pool():
    ctx = _ctx(GreedyMemoryPool(2_000))
    with pytest.raises(ResourcesExhausted):
        ctx.sql("SELECT * FROM t ORDER BY v").collect_batch()


def test_join_build_exceeds_tiny_pool():
    ctx = _ctx(GreedyMemoryPool(2_000))
    with pytest.raises(ResourcesExhausted):
        ctx.sql("SELECT count(*) c FROM t a JOIN t b ON a.k = b.k").collect_batch()


def test_queries_fit_in_large_pool():
    ctx = _ctx(GreedyMemoryPool(512 * 1024 * 1024))
    out = ctx.sql("SELECT count(*) c FROM (SELECT * FROM t ORDER BY v)").to_pydict()
    assert out["c"] == [50_000]


def test_greedy_pool_accounting():
    pool = GreedyMemoryPool(1000)
    r1 = MemoryReservation("a", pool)
    r1.try_grow(600)
    r2 = MemoryReservation("b", pool)
    with pytest.raises(ResourcesExhausted):
        r2.try_grow(600)
    r1.shrink(400)
    r2.try_grow(600)
    assert pool.reserved() == 800
    r1.free()
    r2.free()
    assert pool.reserved() == 0


def test_fair_spill_pool():
    pool = FairSpillPool(1000)
    a = MemoryReservation("a", pool, can_spill=True)
    b = MemoryReservation("b", pool, can_spill=True)
    # fair share is 500 each
    a.try_grow(450)
    with pytest.raises(ResourcesExhausted):
        b.try_grow(600)
    b.try_grow(450)


def test_sort_spills_with_disk_manager():
    """With a DiskManager the sort externalizes instead of erroring, and
    the result is identical to the in-memory sort (reference:
    sorts/sort.rs spill tests)."""
    from datafusion_tpu.runtime import DiskManager
    disk = DiskManager()
    ctx = df.SessionContext(runtime=RuntimeEnv(
        memory_pool=GreedyMemoryPool(200_000), disk_manager=disk))
    rng = np.random.default_rng(1)
    n = 60_000
    # several batches so the sorter buffers incrementally
    from datafusion_tpu.datasource.memory import MemTable
    from datafusion_tpu.common.batch import Batch
    batches = []
    vals = rng.normal(size=n)
    ks = rng.integers(0, 10**6, n)
    for i in range(0, n, 10_000):
        batches.append(Batch.from_arrays({
            "k": ks[i:i+10_000], "v": vals[i:i+10_000]}))
    ctx.register_table("t", MemTable(batches[0].schema, [batches]))
    out = ctx.sql("SELECT k, v FROM t ORDER BY v").to_pydict()
    sm = ctx.sql("EXPLAIN ANALYZE SELECT k, v FROM t ORDER BY v").to_pydict()
    assert any("spill_count" in p for p in sm["plan"]), sm["plan"]
    exp = np.sort(vals)
    np.testing.assert_allclose(np.array(out["v"]), exp)
    assert disk.spilled_bytes > 0


def test_unbounded_pool_tracks():
    pool = UnboundedMemoryPool()
    r = MemoryReservation("x", pool)
    r.try_grow(10**9)
    assert pool.reserved() == 10**9
    r.free()
