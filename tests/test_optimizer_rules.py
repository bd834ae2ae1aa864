"""Rule-level tests for the logical rules completing the reference's
optimizer list (optimizer/src/optimizer.rs:245-278), implemented in
datafusion_tpu/optimizer/extra_rules.py: each test asserts both the plan
shape (the rule fired) and the query result (the rewrite is sound).
"""
import numpy as np
import pytest


def plan_str(ctx, sql):
    return str(ctx.sql(sql).optimized_plan())


def q(ctx, sql):
    return ctx.sql(sql).to_pydict()


# ---------------------------------------------------------------- distinct

class TestReplaceDistinctWithAggregate:
    def test_plan_becomes_aggregate(self, emp_ctx):
        p = plan_str(emp_ctx, "SELECT DISTINCT dept FROM emp")
        assert "Distinct" not in p
        assert "Aggregate" in p

    def test_result(self, emp_ctx):
        out = q(emp_ctx, "SELECT DISTINCT dept FROM emp ORDER BY dept")
        assert out["dept"] == ["a", "b", "c"]

    def test_multi_column(self, emp_ctx):
        out = q(emp_ctx,
                "SELECT DISTINCT dept, sal > 250 AS hi FROM emp "
                "ORDER BY dept, hi")
        assert out["dept"] == ["a", "a", "b", "b", "c"]
        assert out["hi"] == [False, True, False, True, True]


class TestSingleDistinctToGroupBy:
    def test_plan_double_aggregate(self, emp_ctx):
        p = plan_str(emp_ctx,
                     "SELECT dept, count(DISTINCT sal) FROM emp "
                     "GROUP BY dept")
        # inner GROUP BY (dept, sal), outer GROUP BY dept: two Aggregates
        assert p.count("Aggregate") == 2

    def test_count_distinct_grouped(self, emp_ctx):
        out = q(emp_ctx,
                "SELECT dept, count(DISTINCT sal) AS c FROM emp "
                "GROUP BY dept ORDER BY dept")
        assert out["dept"] == ["a", "b", "c"]
        assert out["c"] == [2, 2, 1]

    def test_sum_distinct_with_duplicates(self, ctx):
        ctx.register_arrays("t", {
            "g": np.array([1, 1, 1, 2, 2]),
            "v": np.array([10, 10, 20, 5, 5]),
        })
        out = q(ctx, "SELECT g, sum(DISTINCT v) AS s, count(DISTINCT v) c "
                     "FROM t GROUP BY g ORDER BY g")
        assert out["s"] == [30, 5]
        assert out["c"] == [2, 1]

    def test_mixed_with_max_stays_correct(self, ctx):
        ctx.register_arrays("t", {
            "g": np.array([1, 1, 2]),
            "v": np.array([3, 3, 7]),
        })
        out = q(ctx, "SELECT g, count(DISTINCT v) c, max(v) m FROM t "
                     "GROUP BY g ORDER BY g")
        assert out["c"] == [1, 1]
        assert out["m"] == [3, 7]

    def test_global_count_distinct(self, emp_ctx):
        out = q(emp_ctx, "SELECT count(DISTINCT dept) AS c FROM emp")
        assert out["c"] == [3]


# -------------------------------------------------------------- empty prop

class TestPropagateEmptyRelation:
    def test_filter_false_annihilates(self, emp_ctx):
        p = plan_str(emp_ctx,
                     "SELECT id FROM emp WHERE false ORDER BY id LIMIT 3")
        assert "EmptyRelation" in p
        assert "Sort" not in p and "Limit" not in p
        assert q(emp_ctx,
                 "SELECT id FROM emp WHERE false ORDER BY id")["id"] == []

    def test_inner_join_with_empty_side(self, emp_ctx):
        p = plan_str(emp_ctx,
                     "SELECT e.id FROM emp e JOIN "
                     "(SELECT name FROM dept WHERE false) d "
                     "ON e.dept = d.name")
        assert "Join" not in p
        assert "EmptyRelation" in p

    def test_union_drops_empty_branches(self, emp_ctx):
        p = plan_str(emp_ctx,
                     "SELECT id FROM emp WHERE false "
                     "UNION ALL SELECT id FROM emp")
        assert "Union" not in p
        out = q(emp_ctx, "SELECT id FROM emp WHERE false "
                         "UNION ALL SELECT id FROM emp ORDER BY id")
        assert out["id"] == [1, 2, 3, 4, 5]

    def test_global_aggregate_of_empty_keeps_row(self, emp_ctx):
        out = q(emp_ctx, "SELECT count(*) AS c FROM emp WHERE false")
        assert out["c"] == [0]

    def test_grouped_aggregate_of_empty_is_empty(self, emp_ctx):
        out = q(emp_ctx, "SELECT dept, count(*) AS c FROM emp "
                         "WHERE false GROUP BY dept")
        assert out["c"] == []


# ------------------------------------------------------------- unwrap cast

class TestUnwrapCastInComparison:
    def test_unwraps_widening_int_cast(self, ctx):
        ctx.register_arrays("t", {"a": np.array([1, 2, 3], dtype=np.int32)})
        p = plan_str(ctx, "SELECT a FROM t WHERE CAST(a AS BIGINT) = 2")
        assert "CAST" not in p.upper().replace("FORECAST", "")
        assert q(ctx, "SELECT a FROM t WHERE CAST(a AS BIGINT) = 2")["a"] \
            == [2]

    def test_out_of_range_literal_not_unwrapped(self, ctx):
        ctx.register_arrays("t2", {"a": np.array([1, 2], dtype=np.int8)})
        # 300 does not fit int8: the cast must survive (result: no rows)
        out = q(ctx, "SELECT a FROM t2 WHERE CAST(a AS INT) = 300")
        assert out["a"] == []

    def test_literal_on_left(self, ctx):
        ctx.register_arrays("t3", {"a": np.array([5, 9], dtype=np.int16)})
        out = q(ctx, "SELECT a FROM t3 WHERE 6 < CAST(a AS BIGINT)")
        assert out["a"] == [9]


# --------------------------------------------------------- null join keys

class TestFilterNullJoinKeys:
    def test_plan_gains_is_not_null(self, ctx):
        import datafusion_tpu as df
        c = df.SessionContext()
        c.sql("CREATE TABLE l AS SELECT * FROM (VALUES (1), (NULL)) v(k)")
        c.sql("CREATE TABLE r AS SELECT * FROM (VALUES (1), (NULL)) v(k)")
        p = plan_str(c, "SELECT l.k FROM l JOIN r ON l.k = r.k")
        assert "IS NOT NULL" in p or "isnotnull" in p.lower() \
            or "NOT " in p
        out = q(c, "SELECT l.k FROM l JOIN r ON l.k = r.k")
        assert out["k"] == [1]


# ------------------------------------------------------------------- CSE

class TestCommonSubexprEliminate:
    def test_shared_expr_computed_once(self, emp_ctx):
        p = plan_str(emp_ctx,
                     "SELECT sal * bonus + 1 AS a, sal * bonus - 1 AS b "
                     "FROM emp")
        assert "__common_expr_1" in p

    def test_result_unchanged(self, emp_ctx):
        out = q(emp_ctx,
                "SELECT sal * 2 + 1 AS a, sal * 2 - 1 AS b FROM emp "
                "WHERE id = 1")
        assert out["a"] == [pytest.approx(201.0)]
        assert out["b"] == [pytest.approx(199.0)]

    def test_no_rewrite_for_unique_exprs(self, emp_ctx):
        p = plan_str(emp_ctx, "SELECT sal + 1 AS a, sal - 1 AS b FROM emp")
        assert "__common_expr" not in p


# --------------------------------------------------------- eliminate join

class TestEliminateJoin:
    def test_join_on_false(self, emp_ctx):
        p = plan_str(emp_ctx,
                     "SELECT e.id FROM emp e JOIN dept d "
                     "ON e.dept = d.name AND false")
        assert "EmptyRelation" in p or "Join" not in p
        out = q(emp_ctx, "SELECT e.id FROM emp e JOIN dept d "
                         "ON e.dept = d.name AND false")
        assert out["id"] == []
