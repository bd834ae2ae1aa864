"""Unparser round-trip: plan -> SQL -> plan gives the same rows
(reference: sql/tests/cases + unparser round-trip suites)."""
import numpy as np
import pytest

from datafusion_tpu.sql.unparser import plan_to_sql

ROUNDTRIP_QUERIES = [
    "SELECT 1 + 2 AS three",
    "SELECT a, b FROM t WHERE a > 2 ORDER BY b DESC LIMIT 3",
    "SELECT a + 1 AS a1, upper(s) u FROM t WHERE s LIKE 'a%'",
    "SELECT a, count(*) c, sum(b) FROM t GROUP BY a HAVING count(*) > 0",
    "SELECT DISTINCT a FROM t",
    "SELECT t.a, u.d FROM t JOIN u ON t.a = u.a WHERE u.d > 0",
    "SELECT a FROM t UNION ALL SELECT a FROM t",
    "SELECT a, CASE WHEN a > 2 THEN 'hi' ELSE 'lo' END lbl FROM t",
    "SELECT a, b FROM t WHERE a IN (1, 2, 3) AND b BETWEEN 0 AND 100",
    "SELECT cast(a AS DOUBLE) x FROM t WHERE a IS NOT NULL",
    "SELECT sub.a FROM (SELECT a FROM t WHERE b > 1) AS sub",
    "SELECT a, row_number() OVER (PARTITION BY a ORDER BY b) rn FROM t",
    "SELECT a, sum(b) FILTER (WHERE a > 1) s FROM t GROUP BY a",
    "SELECT * FROM (VALUES (1, 'x'), (2, 'y')) AS v(n, s)",
    "SELECT a FROM t WHERE a = (SELECT min(a) FROM t)",
    "SELECT a FROM t WHERE EXISTS (SELECT 1 FROM u WHERE u.a = t.a)",
    "SELECT a FROM t INTERSECT SELECT a FROM u",
    "SELECT a FROM t EXCEPT SELECT a FROM u",
    "SELECT date_part('year', DATE '2024-03-05') y",
]


@pytest.fixture()
def rt_ctx(ctx):
    rng = np.random.default_rng(3)
    ctx.register_arrays("t", {
        "a": rng.integers(0, 5, 50),
        "b": rng.integers(-10, 100, 50),
        "s": rng.choice(["ab", "cd", "axe"], 50).astype(object),
    })
    ctx.register_arrays("u", {
        "a": rng.integers(0, 5, 20),
        "d": rng.integers(-5, 5, 20),
    })
    return ctx


def _sorted_rows(batch):
    cols = [batch.column(i).to_pylist(batch.num_rows)
            for i in range(len(batch.schema.fields))]
    return sorted(zip(*cols)) if cols else []


@pytest.mark.parametrize("sql", ROUNDTRIP_QUERIES)
def test_roundtrip(rt_ctx, sql):
    df = rt_ctx.sql(sql)
    expected = _sorted_rows(df.collect_batch())
    sql2 = plan_to_sql(df.logical_plan())
    got = _sorted_rows(rt_ctx.sql(sql2).collect_batch())
    assert got == expected, sql2


def test_unparse_is_sql_text(rt_ctx):
    df = rt_ctx.sql("SELECT a, count(*) FROM t WHERE b > 0 GROUP BY a")
    s = plan_to_sql(df.logical_plan())
    assert s.startswith("SELECT") and "GROUP BY" in s and "WHERE" in s
