"""Substrait round-trip: plan -> substrait JSON -> plan gives identical rows
(reference: datafusion-substrait roundtrip_logical_plan tests)."""
import json

import numpy as np
import pytest

import datafusion_tpu as df
from datafusion_tpu.substrait import plan_to_substrait, substrait_to_plan

QUERIES = [
    "SELECT a, b FROM t WHERE a > 2",
    "SELECT a + 1, upper(s) FROM t",
    "SELECT a, count(*), sum(b) FROM t GROUP BY a",
    "SELECT count(DISTINCT a) FROM t",
    "SELECT t.a, u.d FROM t JOIN u ON t.a = u.a",
    "SELECT t.a FROM t LEFT JOIN u ON t.a = u.a AND t.b > u.d",
    "SELECT a FROM t ORDER BY b DESC NULLS FIRST LIMIT 5",
    "SELECT a FROM t UNION ALL SELECT a FROM u",
    "SELECT a FROM t UNION SELECT a FROM u",
    "SELECT DISTINCT a FROM t",
    "SELECT CASE WHEN a > 2 THEN 'x' ELSE 'y' END FROM t",
    "SELECT cast(a AS DOUBLE) FROM t WHERE s LIKE 'a%' OR b < 0",
    "SELECT t.a, t.b FROM t CROSS JOIN u LIMIT 3",
]


@pytest.fixture()
def st_ctx(ctx):
    rng = np.random.default_rng(5)
    ctx.register_arrays("t", {
        "a": rng.integers(0, 6, 40),
        "b": rng.integers(-10, 50, 40),
        "s": rng.choice(["ab", "cd", "ax"], 40).astype(object)})
    ctx.register_arrays("u", {
        "a": rng.integers(0, 6, 25), "d": rng.integers(-5, 20, 25)})
    return ctx


def _rows(batch):
    cols = [batch.column(i).to_pylist(batch.num_rows)
            for i in range(len(batch.schema.fields))]
    return sorted(zip(*cols)) if cols else []


@pytest.mark.parametrize("sql", QUERIES)
def test_roundtrip(st_ctx, sql):
    d0 = st_ctx.sql(sql)
    expected = _rows(d0.collect_batch())
    proto = plan_to_substrait(d0.logical_plan())
    proto = json.loads(json.dumps(proto))      # must be pure JSON
    plan2 = substrait_to_plan(proto, st_ctx)
    from datafusion_tpu.api.dataframe import DataFrame
    got = _rows(DataFrame(st_ctx, plan2).collect_batch())
    assert got == expected


def test_output_names_preserved(st_ctx):
    d0 = st_ctx.sql("SELECT a AS x, sum(b) AS total FROM t GROUP BY a")
    proto = plan_to_substrait(d0.logical_plan())
    plan2 = substrait_to_plan(proto, st_ctx)
    assert [f.name for f in plan2.schema.fields] == ["x", "total"]


def test_version_and_extensions_present(st_ctx):
    proto = plan_to_substrait(st_ctx.sql("SELECT a + 1 FROM t").logical_plan())
    assert proto["version"]["producer"] == "datafusion-tpu"
    names = [e["extensionFunction"]["name"] for e in proto["extensions"]]
    assert "add" in names
