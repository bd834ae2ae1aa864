"""2-process execution pod: physical-plan JSON shipping + socket shuffle
(the DCN layer of SURVEY §5.8; reference: datafusion.proto:713-760 +
the Ballista executor model)."""
import numpy as np
import pytest

import datafusion_tpu as df


def _make_batch(n, seed=0):
    rng = np.random.default_rng(seed)
    ctx = df.SessionContext()
    ctx.register_arrays("t", {
        "g": rng.integers(0, 7, n),
        "s": np.array([f"k{i % 3}" for i in range(n)]),
        "v": rng.integers(0, 100, n).astype(np.int64),
        "f": rng.random(n),
    })
    return ctx, ctx.sql("SELECT * FROM t").collect_batch()


def test_pod_roundtrip_wire():
    from datafusion_tpu.parallel.pod import batch_from_wire, batch_to_wire
    _ctx, batch = _make_batch(100)
    meta, blobs = batch_to_wire(batch)
    back = batch_from_wire(meta, blobs)
    assert back.num_rows == batch.num_rows
    for a, b in zip(batch.columns, back.columns):
        assert a.to_pylist(batch.num_rows) == b.to_pylist(back.num_rows)


def test_physical_plan_json_roundtrip():
    from datafusion_tpu.proto.physical import phys_from_dict, phys_to_dict
    ctx, _ = _make_batch(50)
    plan = ctx.sql(
        "SELECT g, sum(v) s, count(*) c FROM t WHERE v > 10 GROUP BY g"
    ).create_physical_plan()
    names = {id(ctx.get_table("t")): "t"}
    d = phys_to_dict(plan, names)
    back = phys_from_dict(d, ctx)
    from datafusion_tpu.physical.plan.base import collect_batch
    r1 = collect_batch(plan, ctx.task_context())
    r2 = collect_batch(back, ctx.task_context())
    assert sorted(map(tuple, zip(*[c.to_pylist(r1.num_rows)
                                   for c in r1.columns]))) == \
        sorted(map(tuple, zip(*[c.to_pylist(r2.num_rows)
                                for c in r2.columns])))


@pytest.mark.parametrize("sql", [
    "SELECT g, sum(v) sv, count(*) c, avg(f) af FROM t GROUP BY g "
    "ORDER BY g",
    "SELECT s, min(v) mn, max(v) mx FROM t WHERE v % 2 = 0 GROUP BY s "
    "ORDER BY s",
])
def test_pod_distributed_aggregate(sql):
    """End-to-end: coordinator plans, 2 worker processes execute shipped
    fragments, shuffle over sockets, final answer matches single-node."""
    from datafusion_tpu.parallel.pod import LocalPod
    ctx, batch = _make_batch(5000, seed=3)
    expected = ctx.sql(sql).to_pydict()
    with LocalPod(n_workers=2) as pod:
        pod.register_sharded("t", batch)
        got = pod.sql_distributed(ctx, sql)
    got_d = {f.name: c.to_pylist(got.num_rows)
             for f, c in zip(got.schema, got.columns)}
    assert set(got_d) == set(expected)
    for k in expected:
        g, e = got_d[k], expected[k]
        if e and isinstance(e[0], float):
            # distributed float sums reassociate: last-ulp differences
            np.testing.assert_allclose(g, e, rtol=1e-12)
        else:
            assert g == e, k
