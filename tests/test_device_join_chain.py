"""DeviceJoinChainAggregateExec: multi-way join chains fused with
aggregation (reference shape: stacked CollectLeft hash joins feeding
GroupedHashAggregateStream — joins/hash_join.rs:1368 ->
aggregates/row_hash.rs:524). Each test asserts both that the chain plan
was selected and that results match the host execution path.
"""
import numpy as np
import pytest

import datafusion_tpu as df


def make_ctx(device=True):
    ctx = df.SessionContext()
    ctx.sql(f"SET datafusion.tpu.device_aggregate = {str(device).lower()}")
    rng = np.random.default_rng(7)
    n_fact, n_d1, n_d2 = 5000, 300, 40
    ctx.register_arrays("fact", {
        "k1": rng.integers(0, n_d1, n_fact),
        "v": rng.normal(size=n_fact).round(3),
        "tag": rng.integers(0, 5, n_fact),
    })
    ctx.register_arrays("d1", {
        "id": np.arange(n_d1),
        "k2": rng.integers(0, n_d2, n_d1),
        "w": rng.integers(1, 100, n_d1),
    })
    ctx.register_arrays("d2", {
        "id": np.arange(n_d2),
        "name": np.array([f"g{i % 7}" for i in range(n_d2)]),
    })
    return ctx


CHAIN_SQL = (
    "SELECT d2.name, count(*) AS c, sum(f.v * d1.w) AS s "
    "FROM fact f JOIN d1 ON f.k1 = d1.id JOIN d2 ON d1.k2 = d2.id "
    "WHERE f.tag < 4 GROUP BY d2.name ORDER BY d2.name")


def test_chain_plan_selected():
    ctx = make_ctx()
    plan = ctx.sql("EXPLAIN " + CHAIN_SQL).to_pydict()["plan"][1]
    assert "DeviceJoinChainAggregateExec" in plan


def test_chain_matches_host():
    dev = make_ctx(True).sql(CHAIN_SQL).to_pydict()
    host = make_ctx(False).sql(CHAIN_SQL).to_pydict()
    assert dev["name"] == host["name"]
    assert dev["c"] == host["c"]
    np.testing.assert_allclose(dev["s"], host["s"], rtol=1e-9)


def test_chain_semi_join():
    sql = ("SELECT d2.name, count(*) c FROM fact f "
           "JOIN d1 ON f.k1 = d1.id JOIN d2 ON d1.k2 = d2.id "
           "WHERE f.k1 IN (SELECT id FROM d1 WHERE w > 50) "
           "GROUP BY d2.name ORDER BY d2.name")
    ctx = make_ctx(True)
    plan = ctx.sql("EXPLAIN " + sql).to_pydict()["plan"][1]
    assert "DeviceJoinChainAggregateExec" in plan
    assert "LEFTSEMI" in plan
    dev = ctx.sql(sql).to_pydict()
    host = make_ctx(False).sql(sql).to_pydict()
    assert dev == host


def test_chain_anti_join():
    sql = ("SELECT count(*) c, sum(f.v) s FROM fact f "
           "JOIN d1 ON f.k1 = d1.id "
           "WHERE f.k1 NOT IN (SELECT id FROM d1 WHERE w > 50) "
           "AND f.tag = 1 GROUP BY f.tag")
    dev = make_ctx(True).sql(sql).to_pydict()
    host = make_ctx(False).sql(sql).to_pydict()
    assert dev["c"] == host["c"]
    np.testing.assert_allclose(dev["s"], host["s"], rtol=1e-9)


def test_chain_nonunique_build_falls_back():
    """Duplicate build keys (fanout > 1) must fall back to a correct
    path, not mis-join."""
    ctx = df.SessionContext()
    ctx.register_arrays("f", {"k": np.array([1, 2, 3, 1] * 500),
                              "v": np.arange(2000.0)})
    ctx.register_arrays("b1", {"id": np.array([1, 1, 2, 3]),
                               "p": np.array([10, 11, 20, 30])})
    ctx.register_arrays("b2", {"p": np.array([10, 11, 20, 30]),
                               "g": np.array(["x", "x", "y", "z"])})
    sql = ("SELECT g, count(*) c FROM f JOIN b1 ON f.k = b1.id "
           "JOIN b2 ON b1.p = b2.p GROUP BY g ORDER BY g")
    out = ctx.sql(sql).to_pydict()
    host = df.SessionContext()
    host.sql("SET datafusion.tpu.device_aggregate = false")
    host.register_arrays("f", {"k": np.array([1, 2, 3, 1] * 500),
                               "v": np.arange(2000.0)})
    host.register_arrays("b1", {"id": np.array([1, 1, 2, 3]),
                                "p": np.array([10, 11, 20, 30])})
    host.register_arrays("b2", {"p": np.array([10, 11, 20, 30]),
                                "g": np.array(["x", "x", "y", "z"])})
    assert out == host.sql(sql).to_pydict()


def test_chain_null_keys_never_match():
    ctx = df.SessionContext()
    ctx.sql("CREATE TABLE f AS SELECT * FROM (VALUES "
            "(1, 10.0), (2, 20.0), (NULL, 30.0), (4, 40.0)) v(k, x)")
    ctx.sql("CREATE TABLE b AS SELECT * FROM (VALUES "
            "(1, 'a'), (2, 'b'), (NULL, 'n')) v(id, s)")
    ctx.sql("CREATE TABLE c AS SELECT * FROM (VALUES "
            "('a', 100), ('b', 200)) v(s, m)")
    sql = ("SELECT b.s, sum(f.x) t, sum(c.m) mm FROM f "
           "JOIN b ON f.k = b.id JOIN c ON b.s = c.s "
           "GROUP BY b.s ORDER BY b.s")
    out = ctx.sql(sql).to_pydict()
    assert out["s"] == ["a", "b"]
    assert out["t"] == [pytest.approx(10.0), pytest.approx(20.0)]
    assert out["mm"] == [100, 200]


def test_chain_residual_cross_dimension_equality():
    """A second equality between two dimension payloads becomes a device
    residual mask (the TPC-H Q5 c_nationkey = s_nationkey shape)."""
    ctx = df.SessionContext()
    rng = np.random.default_rng(3)
    n = 4000
    ctx.register_arrays("f", {
        "a": rng.integers(0, 50, n), "b": rng.integers(0, 30, n),
        "v": rng.integers(0, 1000, n)})
    ctx.register_arrays("da", {"id": np.arange(50),
                               "region": rng.integers(0, 4, 50)})
    ctx.register_arrays("db", {"id": np.arange(30),
                               "region": rng.integers(0, 4, 30)})
    sql = ("SELECT da.region, sum(f.v) s FROM f "
           "JOIN da ON f.a = da.id JOIN db ON f.b = db.id "
           "AND da.region = db.region GROUP BY da.region ORDER BY da.region")
    dev = ctx.sql(sql).to_pydict()
    hostctx = df.SessionContext()
    hostctx.sql("SET datafusion.tpu.device_aggregate = false")
    hostctx.register_arrays("f", {
        "a": rng.integers(0, 50, n), "b": rng.integers(0, 30, n),
        "v": rng.integers(0, 1000, n)})
    # same data matters: rebuild with identical arrays
    hostctx = df.SessionContext()
    hostctx.sql("SET datafusion.tpu.device_aggregate = false")
    for name, tbl in (("f", {"a": ctx.table("f").to_pydict()["a"],
                             "b": ctx.table("f").to_pydict()["b"],
                             "v": ctx.table("f").to_pydict()["v"]}),):
        hostctx.register_arrays(name, {k: np.asarray(v) for k, v in tbl.items()})
    hostctx.register_arrays("da", {"id": np.arange(50),
                                   "region": ctx.table("da").to_pydict()["region"]})
    hostctx.register_arrays("db", {"id": np.arange(30),
                                   "region": ctx.table("db").to_pydict()["region"]})
    host = hostctx.sql(sql).to_pydict()
    assert dev["region"] == host["region"]
    assert dev["s"] == host["s"]


def test_chain_filtered_build_over_lut_table():
    """Regression for the round-3 LUT staging bug: a chain whose build is
    a FILTERED select over a LUT-eligible table (unique int keys, bounded
    domain) must probe through the masked direct-address LUT, not treat
    the LUT as sorted keys. Round-3 HEAD silently returned 0 rows here."""
    sql = ("SELECT d2.name, count(*) c, sum(f.v) s FROM fact f "
           "JOIN d1 ON f.k1 = d1.id JOIN d2 ON d1.k2 = d2.id "
           "WHERE d1.w > 30 AND d2.name <> 'g3' "
           "GROUP BY d2.name ORDER BY d2.name")
    ctx = make_ctx(True)
    plan = ctx.sql("EXPLAIN " + sql).to_pydict()["plan"][1]
    assert "DeviceJoinChainAggregateExec" in plan
    dev = ctx.sql(sql).to_pydict()
    host = make_ctx(False).sql(sql).to_pydict()
    assert dev["name"] == host["name"] and dev["name"]  # non-empty!
    assert dev["c"] == host["c"]
    np.testing.assert_allclose(dev["s"], host["s"], rtol=1e-9)
    # run again so the second pass takes the cross-query LUT cache hit
    dev2 = ctx.sql(sql).to_pydict()
    assert dev2 == dev


def test_chain_lut_cache_not_aliased_by_replaced_table():
    """Re-registering a table under the same name must not serve stale
    LUT entries (versioned Column uids, not id())."""
    ctx = make_ctx(True)
    base = ctx.sql(CHAIN_SQL).to_pydict()
    assert base["name"]
    # replace d1 with shifted weights: results must change accordingly
    rng = np.random.default_rng(7)
    n_fact, n_d1, n_d2 = 5000, 300, 40
    rng.integers(0, n_d1, n_fact)
    rng.normal(size=n_fact)
    rng.integers(0, 5, n_fact)
    k2 = rng.integers(0, n_d2, n_d1)
    w = rng.integers(1, 100, n_d1)
    ctx.register_arrays("d1", {"id": np.arange(n_d1), "k2": k2,
                               "w": w * 2})
    doubled = ctx.sql(CHAIN_SQL).to_pydict()
    np.testing.assert_allclose(doubled["s"], [2 * x for x in base["s"]],
                               rtol=1e-9)


def test_chain_sorted_spine_group_key():
    """A spine pre-sorted on its group/join key (the dbgen lineitem
    layout) takes the sort-free device aggregate; results must match the
    host twin exactly, including FD-reconstructed dependent keys."""
    rng = np.random.default_rng(5)
    n_fact, n_d = 6000, 500
    k = np.sort(rng.integers(0, n_d, n_fact))       # sorted spine key
    v = rng.normal(size=n_fact).round(3)
    d_date = rng.integers(8000, 9000, n_d)
    d_w = rng.integers(1, 9, n_d)
    d_g = rng.integers(0, 40, n_d)
    ctxs = []
    for device in (True, False):
        ctx = df.SessionContext()
        ctx.sql(f"SET datafusion.tpu.device_aggregate = {str(device).lower()}")
        ctx.register_arrays("fact", {"k": k, "v": v})
        ctx.register_arrays("d", {"id": np.arange(n_d), "dt": d_date,
                                  "w": d_w, "g": d_g})
        ctx.register_arrays("d2", {"id": np.arange(40),
                                   "z": np.arange(40) * 10})
        ctxs.append(ctx)
    # Q3 shape: 2-hop chain, filtered LUT build, FD-dropped dependent
    # keys (dt depends on k through the unique-key build)
    sql = ("SELECT f.k, d.dt, count(*) c, sum(f.v) s FROM fact f "
           "JOIN d ON f.k = d.id JOIN d2 ON d.g = d2.id WHERE d.w > 2 "
           "GROUP BY f.k, d.dt ORDER BY f.k LIMIT 50")
    plan = ctxs[0].sql("EXPLAIN " + sql).to_pydict()["plan"][1]
    assert "DeviceJoinChainAggregateExec" in plan
    dev = ctxs[0].sql(sql).to_pydict()
    host = ctxs[1].sql(sql).to_pydict()
    assert dev["k"] == host["k"] and dev["k"]
    assert dev["dt"] == host["dt"]
    assert dev["c"] == host["c"]
    np.testing.assert_allclose(dev["s"], host["s"], rtol=1e-9)


def test_chain_string_group_key_from_build_payload():
    ctx = make_ctx(True)
    sql = ("SELECT d2.name, min(d1.w) mn, max(d1.w) mx FROM fact f "
           "JOIN d1 ON f.k1 = d1.id JOIN d2 ON d1.k2 = d2.id "
           "GROUP BY d2.name ORDER BY d2.name")
    dev = ctx.sql(sql).to_pydict()
    host = make_ctx(False).sql(sql).to_pydict()
    assert dev == host


def test_registered_tables_keep_lut_staging_after_warmup():
    """Regression (round 5, suite runs 3-4): data_device() swaps a
    staged Column's _data to the jax copy, which made the device-born
    staging branch hijack every WARM chain build — dropping the
    cross-query direct-address LUT cache. Registered tables must take
    the host/LUT staging path on every run."""
    import numpy as np

    import datafusion_tpu as df
    from datafusion_tpu.physical.plan import device_join_chain as djc

    ctx = df.SessionContext()
    n = 30_000
    rng = np.random.default_rng(1)
    ctx.register_arrays("f", {"k": np.sort(rng.integers(0, 5000, n)),
                              "v": rng.integers(0, 50, n).astype(np.int64)})
    ctx.register_arrays("d", {"k": np.arange(5000),
                              "w": rng.integers(0, 9, 5000)})
    sql = "SELECT w, sum(v) s FROM f JOIN d ON f.k = d.k GROUP BY w"

    calls = []
    orig = djc.DeviceJoinChainAggregateExec._stage_build_device

    def spy(self, b, bb, col_map, jax, jnp, m):
        out = orig(self, b, bb, col_map, jax, jnp, m)
        calls.append(out is not None)
        return out

    djc.DeviceJoinChainAggregateExec._stage_build_device = spy
    try:
        r1 = ctx.sql(sql + " ORDER BY w").to_pydict()
        r2 = ctx.sql(sql + " ORDER BY w").to_pydict()   # warm: _data is jax now
    finally:
        djc.DeviceJoinChainAggregateExec._stage_build_device = orig
    assert r1 == r2
    assert not any(calls), \
        "device-born staging fired for a registered table build"
