"""Joins: all 8 types, NULL keys, non-equi filters, multi-key, fuzz vs
pandas merge (reference: hash_join.rs unit tests + join_fuzz)."""
import numpy as np
import pytest


def q(ctx, sql):
    return ctx.sql(sql).to_pydict()


@pytest.fixture()
def jctx(ctx):
    ctx.register_arrays("l", {
        "k": np.array([1, 2, 3, 4]),
        "lv": np.array(["l1", "l2", "l3", "l4"]),
    })
    ctx.register_arrays("r", {
        "k": np.array([2, 3, 3, 5]),
        "rv": np.array(["r2", "r3a", "r3b", "r5"]),
    })
    return ctx


def test_inner(jctx):
    out = q(jctx, "SELECT l.k, lv, rv FROM l JOIN r ON l.k = r.k ORDER BY l.k, rv")
    assert out["k"] == [2, 3, 3]
    assert out["rv"] == ["r2", "r3a", "r3b"]


def test_left(jctx):
    out = q(jctx, "SELECT l.k, rv FROM l LEFT JOIN r ON l.k = r.k ORDER BY l.k, rv")
    assert out["k"] == [1, 2, 3, 3, 4]
    assert out["rv"] == [None, "r2", "r3a", "r3b", None]


def test_right(jctx):
    out = q(jctx, "SELECT r.k, lv FROM l RIGHT JOIN r ON l.k = r.k ORDER BY r.k, lv")
    assert out["k"] == [2, 3, 3, 5]
    assert out["lv"] == ["l2", "l3", "l3", None]


def test_full(jctx):
    out = q(jctx, "SELECT l.k AS lk, r.k AS rk FROM l FULL JOIN r ON l.k = r.k "
                  "ORDER BY lk NULLS LAST, rk NULLS LAST")
    assert out["lk"] == [1, 2, 3, 3, 4, None]
    assert out["rk"] == [None, 2, 3, 3, None, 5]


def test_semi_anti(jctx):
    out = q(jctx, "SELECT k FROM l WHERE k IN (SELECT k FROM r) ORDER BY k")
    assert out["k"] == [2, 3]
    out = q(jctx, "SELECT k FROM l WHERE k NOT IN (SELECT k FROM r) ORDER BY k")
    assert out["k"] == [1, 4]


def test_null_keys_never_match(ctx):
    import datafusion_tpu as df
    from datafusion_tpu.common.column import Column
    from datafusion_tpu.common.batch import Batch
    from datafusion_tpu.common.schema import Field, Schema
    from datafusion_tpu.common import dt
    from datafusion_tpu.datasource.memory import MemTable
    k = Column(dt.INT64, np.array([1, 0, 2], np.int64),
               np.array([True, False, True]))
    b = Batch(Schema([Field("k", dt.INT64, True)]), [k])
    ctx.register_table("ln", MemTable(b.schema, [[b]]))
    ctx.register_table("rn", MemTable(b.schema, [[b]]))
    out = q(ctx, "SELECT ln.k FROM ln JOIN rn ON ln.k = rn.k ORDER BY ln.k")
    assert out["k"] == [1, 2]   # the NULL row matches nothing


def test_join_with_residual_filter(jctx):
    out = q(jctx, "SELECT l.k, rv FROM l JOIN r ON l.k = r.k AND rv != 'r3a' "
                  "ORDER BY l.k")
    assert out["rv"] == ["r2", "r3b"]


def test_non_equi_join(jctx):
    out = q(jctx, "SELECT l.k AS lk, r.k AS rk FROM l JOIN r ON l.k < r.k "
                  "ORDER BY lk, rk")
    assert out["lk"][:3] == [1, 1, 1]


def test_cross_join(jctx):
    out = q(jctx, "SELECT count(*) c FROM l CROSS JOIN r")
    assert out["c"] == [16]


def test_multi_key_join(ctx):
    ctx.register_arrays("a", {"x": np.array([1, 1, 2]), "y": np.array(["p", "q", "p"]),
                              "v": np.array([10, 20, 30])})
    ctx.register_arrays("b", {"x": np.array([1, 2]), "y": np.array(["q", "p"]),
                              "w": np.array([7, 8])})
    out = q(ctx, "SELECT v, w FROM a JOIN b ON a.x = b.x AND a.y = b.y ORDER BY v")
    assert out == {"v": [20, 30], "w": [7, 8]}


def test_using_and_natural(jctx):
    out = q(jctx, "SELECT k FROM l JOIN r USING (k) ORDER BY k")
    assert out["k"] == [2, 3, 3]


def test_self_join_alias(jctx):
    out = q(jctx, "SELECT a.k FROM l a, l b WHERE a.k = b.k + 1 ORDER BY a.k")
    assert out["k"] == [2, 3, 4]


def test_join_fuzz_vs_pandas(ctx):
    import pandas as pd
    rng = np.random.default_rng(7)
    n = 2000
    lk = rng.integers(0, 100, n)
    rk = rng.integers(0, 100, n)
    lv = rng.normal(size=n)
    rv = rng.normal(size=n)
    ctx.register_arrays("fl", {"k": lk, "v": lv})
    ctx.register_arrays("fr", {"k": rk, "w": rv})
    out = ctx.sql("SELECT fl.k AS k, v, w FROM fl JOIN fr ON fl.k = fr.k "
                  "ORDER BY k, v, w").to_pandas()
    exp = pd.merge(pd.DataFrame({"k": lk, "v": lv}),
                   pd.DataFrame({"k": rk, "w": rv}), on="k") \
        .sort_values(["k", "v", "w"]).reset_index(drop=True)
    assert len(out) == len(exp)
    np.testing.assert_allclose(out["v"].to_numpy(), exp["v"].to_numpy())
    np.testing.assert_allclose(out["w"].to_numpy(), exp["w"].to_numpy())

    # left join row counts
    got = ctx.sql("SELECT count(*) c FROM fl LEFT JOIN fr ON fl.k = fr.k").to_pydict()
    expn = len(pd.merge(pd.DataFrame({"k": lk, "v": lv}),
                        pd.DataFrame({"k": rk, "w": rv}), on="k", how="left"))
    assert got["c"] == [expn]


def test_joins_under_forced_hash_collisions(ctx):
    """All hashes collide -> the exact-equality verification must carry
    the join alone (reference: force_hash_collisions feature tests)."""
    import datafusion_tpu.physical.hashing as H
    import pandas as pd
    rng = np.random.default_rng(5)
    lk = rng.integers(0, 50, 500)
    rk = rng.integers(0, 50, 500)
    ctx.register_arrays("cl", {"k": lk})
    ctx.register_arrays("cr", {"k": rk})
    expected = len(pd.merge(pd.DataFrame({"k": lk}), pd.DataFrame({"k": rk}),
                            on="k"))
    H.FORCE_HASH_COLLISIONS = True
    try:
        got = ctx.sql("SELECT count(*) c FROM cl JOIN cr ON cl.k = cr.k"
                      ).to_pydict()["c"][0]
    finally:
        H.FORCE_HASH_COLLISIONS = False
    assert got == expected


class TestSortMergeJoin:
    """datafusion.optimizer.prefer_hash_join=false selects SortMergeJoinExec
    (reference: sort_merge_join.rs); differential vs the hash join."""

    @staticmethod
    def _ctx(prefer_hash):
        import numpy as np
        import datafusion_tpu as df
        rng = np.random.default_rng(11)
        ctx = df.SessionContext()
        ctx.config.set("datafusion.optimizer.prefer_hash_join", prefer_hash)
        ctx.register_arrays("l", {
            "k": rng.integers(0, 50, 800),
            "s": rng.choice(["x", "y", "z"], 800).astype(object),
            "lv": rng.normal(size=800)})
        ctx.register_arrays("r", {
            "k": rng.integers(0, 50, 500),
            "s": rng.choice(["x", "y", "w"], 500).astype(object),
            "rv": rng.normal(size=500)})
        return ctx

    @staticmethod
    def _explain_has(ctx, text):
        pl = ctx.sql("EXPLAIN SELECT * FROM l JOIN r ON l.k = r.k").to_pydict()
        return any(text in row for row in pl["plan"])

    def test_selected_by_config(self):
        assert self._explain_has(self._ctx(False), "SortMergeJoin")
        assert self._explain_has(self._ctx(True), "HashJoinExec")

    def test_differential_all_types(self):
        queries = [
            "SELECT count(*) c FROM l {} r ON l.k = r.k AND l.s = r.s",
            "SELECT count(*) c FROM l {} r ON l.k = r.k AND l.lv < r.rv",
        ]
        for jt in ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]:
            for q in queries:
                a = self._ctx(True).sql(q.format(jt)).to_pydict()
                b = self._ctx(False).sql(q.format(jt)).to_pydict()
                assert a == b, (jt, q, a, b)

    def test_semi_anti(self):
        for q in ["SELECT count(*) c FROM l WHERE k IN (SELECT k FROM r)",
                  "SELECT count(*) c FROM l WHERE k NOT IN "
                  "(SELECT k FROM r WHERE k IS NOT NULL)"]:
            a = self._ctx(True).sql(q).to_pydict()
            b = self._ctx(False).sql(q).to_pydict()
            assert a == b, (q, a, b)


# ---------------------------------------------------------------------------
# SymmetricHashJoinExec (reference: joins/symmetric_hash_join.rs)
# ---------------------------------------------------------------------------

def _collect_rows(exec_):
    import numpy as np
    from datafusion_tpu.runtime import TaskContext
    rows = []
    for b in exec_.execute(0, TaskContext()):
        cols = [c.data_host()[:b.num_rows].tolist() for c in b.columns]
        vals = [c.validity_host() for c in b.columns]
        for i in range(b.num_rows):
            rows.append(tuple(
                None if (vals[j] is not None and not vals[j][i]) else cols[j][i]
                for j in range(len(cols))))
    return sorted(rows, key=lambda r: tuple((v is None, v) for v in r))


def test_symmetric_hash_join_matches_hash_join_all_types():
    import numpy as np
    from datafusion_tpu.common.batch import Batch
    from datafusion_tpu.common import dt
    from datafusion_tpu.datasource.memory import MemTable
    from datafusion_tpu.physical.plan.scan import MemoryExec
    from datafusion_tpu.physical.plan.joins import (
        HashJoinExec, SymmetricHashJoinExec)
    from datafusion_tpu.physical.expressions import (
        BinaryPhysExpr, ColumnExpr)
    from datafusion_tpu.expr.operator import Op

    rng = np.random.default_rng(11)

    def mk(names, arrays, parts=4):
        named = dict(zip(names, arrays))
        n = len(arrays[0])
        cuts = np.linspace(0, n, parts + 1).astype(int)
        batches = [Batch.from_arrays(
            {k: v[cuts[i]:cuts[i + 1]] for k, v in named.items()})
            for i in range(parts)]
        return MemoryExec(MemTable.from_batches(batches, 1), None, None)

    left = mk(["k", "x"], [rng.integers(0, 40, 250), rng.random(250)])
    right = mk(["k2", "y"], [rng.integers(0, 40, 330), rng.random(330)])
    on = [(ColumnExpr(0, "k", dt.INT64), ColumnExpr(0, "k2", dt.INT64))]
    flt = BinaryPhysExpr(ColumnExpr(1, "x", dt.FLOAT64), Op.LT,
                         ColumnExpr(3, "y", dt.FLOAT64), dt.BOOL)
    for jt in ("INNER", "LEFT", "RIGHT", "FULL",
               "LEFTSEMI", "LEFTANTI", "RIGHTSEMI", "RIGHTANTI"):
        for f in (None, flt if jt in ("INNER", "LEFT", "RIGHT", "FULL")
                  else None):
            a = _collect_rows(HashJoinExec(left, right, on, jt, f, None))
            b = _collect_rows(SymmetricHashJoinExec(left, right, on, jt, f,
                                                    None))
            assert a == b, (jt, f is not None)


def test_symmetric_hash_join_interval_pruning():
    """Range filter over sorted inputs prunes buffered state via interval
    constraint propagation (cp_solver analog) without changing results."""
    import numpy as np
    from datafusion_tpu.common.batch import Batch
    from datafusion_tpu.common import dt
    from datafusion_tpu.datasource.memory import MemTable
    from datafusion_tpu.physical.plan.scan import MemoryExec
    from datafusion_tpu.physical.plan.sort import PhysSortExpr, SortExec
    from datafusion_tpu.physical.plan.joins import (
        HashJoinExec, SymmetricHashJoinExec)
    from datafusion_tpu.physical.expressions import (
        BinaryPhysExpr, ColumnExpr, LiteralExpr)
    from datafusion_tpu.common.scalar import ScalarValue
    from datafusion_tpu.expr.operator import Op

    rng = np.random.default_rng(3)
    n = 2000

    def mk(names, arrays, parts):
        named = dict(zip(names, arrays))
        cuts = np.linspace(0, len(arrays[0]), parts + 1).astype(int)
        batches = [Batch.from_arrays(
            {k: v[cuts[i]:cuts[i + 1]] for k, v in named.items()})
            for i in range(parts)]
        return MemoryExec(MemTable.from_batches(batches, 1), None, None)

    lts = np.sort(rng.integers(0, 10_000, n))
    rts = np.sort(rng.integers(0, 10_000, n))

    class SortedSource(type(mk(["z"], [np.zeros(1, np.int64)], 1))):
        """Sorted streaming source: batches arrive in watermark order
        (the reference's symmetric-join input shape)."""
        order_col = None

        def output_ordering(self):
            return [(self.order_col, True, False)]

    def mk_sorted(names, arrays, parts, order_col):
        base = mk(names, arrays, parts)
        base.__class__ = SortedSource
        base.order_col = order_col
        return base

    left = mk_sorted(["k", "lts"], [rng.integers(0, 50, n), lts], 8, "lts@1")
    right = mk_sorted(["k2", "rts"], [rng.integers(0, 50, n), rts], 8, "rts@1")
    on = [(ColumnExpr(0, "k", dt.INT64), ColumnExpr(0, "k2", dt.INT64))]
    # lts between rts - 100 and rts + 100
    f1 = BinaryPhysExpr(
        ColumnExpr(1, "lts", dt.INT64), Op.GTEQ,
        BinaryPhysExpr(ColumnExpr(3, "rts", dt.INT64), Op.MINUS,
                       LiteralExpr(ScalarValue.int64(100)), dt.INT64), dt.BOOL)
    f2 = BinaryPhysExpr(
        ColumnExpr(1, "lts", dt.INT64), Op.LTEQ,
        BinaryPhysExpr(ColumnExpr(3, "rts", dt.INT64), Op.PLUS,
                       LiteralExpr(ScalarValue.int64(100)), dt.INT64), dt.BOOL)
    flt = BinaryPhysExpr(f1, Op.AND, f2, dt.BOOL)
    shj = SymmetricHashJoinExec(left, right, on, "INNER", flt, None)
    got = _collect_rows(shj)
    exp = _collect_rows(HashJoinExec(left, right, on, "INNER", flt, None))
    assert got == exp
    pruned = 0
    for mv in shj.metrics.iter_values() if hasattr(shj.metrics, "iter_values") \
            else []:
        pass
    # metric check via display string
    txt = shj.display_indent(show_metrics=True)
    assert "state_pruned_rows" in txt
    import re
    mnum = re.search(r"state_pruned_rows=(\d+)", txt)
    assert mnum and int(mnum.group(1)) > 0, txt
