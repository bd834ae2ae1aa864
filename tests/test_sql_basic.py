"""End-to-end SQL: projection, filter, sort, limit, expressions, NULLs.

Modeled on the reference's sqllogictest corpus style (SURVEY.md §4.2):
run SQL through a fresh SessionContext, compare normalized results.
"""
import numpy as np
import pytest


def q(ctx, sql):
    return ctx.sql(sql).to_pydict()


def test_select_literal(ctx):
    assert q(ctx, "SELECT 1 AS a, 'x' AS s, 1.5 AS f") == \
        {"a": [1], "s": ["x"], "f": [pytest.approx(1.5)]}


def test_arithmetic(ctx):
    out = q(ctx, "SELECT 2+3 a, 7/2 b, 7.0/2 c, 7%3 d, -5 e, 2*3 f")
    assert out["a"] == [5]
    assert out["b"] == [3]          # integer division truncates
    assert out["c"] == [pytest.approx(3.5)]
    assert out["d"] == [1]
    assert out["e"] == [-5]
    assert out["f"] == [6]


def test_filter_and_project(emp_ctx):
    out = q(emp_ctx, "SELECT id, sal * 1.1 AS s FROM emp WHERE sal >= 300 ORDER BY id")
    assert out["id"] == [3, 4, 5]
    assert out["s"] == [pytest.approx(330.0), pytest.approx(440.0), pytest.approx(550.0)]


def test_order_by_desc_nulls(ctx):
    ctx.register_arrays("t", {"a": np.array([3.0, 1.0, 2.0])})
    ctx.sql("SELECT a FROM t ORDER BY a DESC").to_pydict()["a"] == [3.0, 2.0, 1.0]


def test_order_by_multi_key(emp_ctx):
    out = q(emp_ctx, "SELECT dept, id FROM emp ORDER BY dept DESC, id ASC")
    assert out["dept"] == ["c", "b", "b", "a", "a"]
    assert out["id"] == [4, 2, 5, 1, 3]


def test_limit_offset(emp_ctx):
    out = q(emp_ctx, "SELECT id FROM emp ORDER BY id LIMIT 2 OFFSET 1")
    assert out["id"] == [2, 3]


def test_null_semantics(ctx):
    ctx.register_arrays("t", {"a": np.array([1.0, 2.0, 3.0])})
    out = q(ctx, "SELECT NULL IS NULL AS a, 1 = NULL AS b, "
                 "NULL AND false AS c, NULL OR true AS d, "
                 "coalesce(NULL, 7) AS e")
    assert out["a"] == [True]
    assert out["b"] == [None]
    assert out["c"] == [False]     # Kleene AND
    assert out["d"] == [True]      # Kleene OR
    assert out["e"] == [7]


def test_between_in_like(emp_ctx):
    out = q(emp_ctx, "SELECT id FROM emp WHERE sal BETWEEN 200 AND 400 ORDER BY id")
    assert out["id"] == [2, 3, 4]
    out = q(emp_ctx, "SELECT id FROM emp WHERE dept IN ('a','c') ORDER BY id")
    assert out["id"] == [1, 3, 4]
    out = q(emp_ctx, "SELECT count(*) AS c FROM emp WHERE dept LIKE '%a%'")
    assert out["c"] == [2]
    out = q(emp_ctx, "SELECT count(*) AS c FROM emp WHERE dept NOT LIKE 'a%'")
    assert out["c"] == [3]


def test_case_expr(emp_ctx):
    out = q(emp_ctx, "SELECT CASE WHEN sal > 250 THEN 'hi' ELSE 'lo' END AS b "
                     "FROM emp ORDER BY id")
    assert out["b"] == ["lo", "lo", "hi", "hi", "hi"]
    out = q(emp_ctx, "SELECT CASE dept WHEN 'a' THEN 1 WHEN 'b' THEN 2 END AS k "
                     "FROM emp ORDER BY id")
    assert out["k"] == [1, 2, 1, None, 2]


def test_cast(ctx):
    out = q(ctx, "SELECT CAST('42' AS INT) a, CAST(1.9 AS INT) b, "
                 "CAST(3 AS DOUBLE) c, CAST('true' AS BOOLEAN) d")
    assert out["a"] == [42]
    # 1.9 is Float64 (parse_float_as_decimal=false default); arrow float->
    # int casts truncate toward zero
    assert out["b"] == [1]
    assert out["c"] == [pytest.approx(3.0)]
    assert out["d"] == [True]


def test_is_distinct_from(ctx):
    out = q(ctx, "SELECT NULL IS DISTINCT FROM 1 a, "
                 "NULL IS NOT DISTINCT FROM NULL b, 1 IS DISTINCT FROM 2 c")
    assert out == {"a": [True], "b": [True], "c": [True]}


def test_union_except_intersect(emp_ctx):
    out = q(emp_ctx, "SELECT 1 x UNION ALL SELECT 1 UNION ALL SELECT 2")
    assert sorted(out["x"]) == [1, 1, 2]
    out = q(emp_ctx, "SELECT 1 x UNION SELECT 1 UNION SELECT 2")
    assert sorted(out["x"]) == [1, 2]
    out = q(emp_ctx, "SELECT dept FROM emp INTERSECT SELECT 'a'")
    assert out["dept"] == ["a"]
    out = q(emp_ctx, "SELECT dept FROM emp EXCEPT SELECT 'a'")
    assert sorted(out["dept"]) == ["b", "c"]


def test_distinct(emp_ctx):
    out = q(emp_ctx, "SELECT DISTINCT dept FROM emp ORDER BY dept")
    assert out["dept"] == ["a", "b", "c"]


def test_values(ctx):
    out = q(ctx, "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) AS t(n, s) ORDER BY n")
    assert out == {"n": [1, 2], "s": ["a", "b"]}


def test_cte(emp_ctx):
    out = q(emp_ctx, "WITH big AS (SELECT * FROM emp WHERE sal > 250) "
                     "SELECT count(*) c FROM big")
    assert out["c"] == [3]


def test_recursive_cte(ctx):
    out = q(ctx, "WITH RECURSIVE r(n) AS ("
                 "SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 10) "
                 "SELECT sum(n) s, count(*) c FROM r")
    assert out == {"s": [55], "c": [10]}


def test_scalar_functions(ctx):
    out = q(ctx, "SELECT abs(-3) a, sqrt(9.0) b, upper('ab') c, length('hello') d, "
                 "substr('hello', 2, 3) e, round(2.567, 2) f, power(2, 10) g")
    assert out["a"] == [3]
    assert out["b"] == [pytest.approx(3.0)]
    assert out["c"] == ["AB"]
    assert out["d"] == [5]
    assert out["e"] == ["ell"]
    assert float(out["f"][0]) == pytest.approx(2.57)   # decimal in, decimal out
    assert out["g"] == [pytest.approx(1024.0)]


def test_string_functions(ctx):
    out = q(ctx, "SELECT concat('a', 'b', 'c') a, replace('aaa', 'a', 'b') b, "
                 "trim('  x  ') c, lpad('5', 3, '0') d, split_part('a,b,c', ',', 2) e, "
                 "strpos('hello', 'll') f, reverse('abc') g, initcap('hi there') h")
    assert out == {"a": ["abc"], "b": ["bbb"], "c": ["x"], "d": ["005"],
                   "e": ["b"], "f": [3], "g": ["cba"], "h": ["Hi There"]}


def test_date_functions(ctx):
    out = q(ctx, "SELECT DATE '2024-03-15' + INTERVAL '1' MONTH AS m, "
                 "date_part('month', DATE '2024-03-15') AS mm, "
                 "date_trunc('year', DATE '2024-03-15') AS y")
    import datetime
    assert out["m"] == [datetime.date(2024, 4, 15)]
    assert out["mm"] == [pytest.approx(3.0)]


def test_explain(emp_ctx):
    out = q(emp_ctx, "EXPLAIN SELECT count(*) FROM emp")
    assert out["plan_type"] == ["logical_plan", "physical_plan"]
    assert "Aggregate" in out["plan"][0]


def test_show_and_describe(emp_ctx):
    out = q(emp_ctx, "SHOW TABLES")
    assert "emp" in out["table_name"]
    out = q(emp_ctx, "DESCRIBE emp")
    assert "dept" in out["column_name"]


class TestUnnest:
    """SQL-level UNNEST (reference: sql/src/select.rs try_process_unnest +
    sql/src/relation/mod.rs table-function form)."""

    def test_from_unnest_literal(self, ctx):
        out = ctx.sql("SELECT * FROM unnest([10, 20, 30])").to_pydict()
        assert out == {"unnest": [10, 20, 30]}

    def test_from_unnest_alias(self, ctx):
        out = ctx.sql("SELECT x FROM unnest(['a','b']) AS t(x)").to_pydict()
        assert out == {"x": ["a", "b"]}

    def test_select_unnest_expands_rows(self, ctx):
        ctx.register_arrays("ut", {"id": [1, 2]})
        out = ctx.sql(
            "SELECT id, unnest(make_array(id, id*10)) v FROM ut"
        ).to_pydict()
        assert out == {"id": [1, 1, 2, 2], "v": [1, 10, 2, 20]}

    def test_unnest_in_subquery_aggregated(self, ctx):
        out = ctx.sql(
            "SELECT sum(u) s FROM (SELECT unnest([1,2,3,4]) u)").to_pydict()
        assert out == {"s": [10]}


class TestCatalogSchemas:
    """Schema namespaces (reference: CREATE/DROP SCHEMA + information_schema
    in core/src/catalog/)."""

    def test_schema_lifecycle(self, ctx):
        ctx.sql("CREATE SCHEMA s1")
        ctx.sql("CREATE SCHEMA IF NOT EXISTS s1")
        ctx.sql("CREATE TABLE s1.t AS SELECT 1 a")
        assert ctx.sql("SELECT * FROM s1.t").to_pydict() == {"a": [1]}
        sch = ctx.sql("SELECT * FROM information_schema.schemata").to_pydict()
        assert "s1" in sch["schema_name"]
        st = ctx.sql("SHOW TABLES").to_pydict()
        base = [(s, t) for s, t, ty in zip(
            st["table_schema"], st["table_name"], st["table_type"])
            if ty == "BASE TABLE"]
        assert base == [("s1", "t")]
        import pytest as _pt
        from datafusion_tpu.common.errors import ExecutionError, PlanError
        with _pt.raises(ExecutionError):
            ctx.sql("DROP SCHEMA s1")          # not empty
        ctx.sql("DROP TABLE s1.t")
        ctx.sql("DROP SCHEMA s1")
        ctx.sql("DROP SCHEMA IF EXISTS s1")    # idempotent with IF EXISTS
        with _pt.raises(PlanError):
            ctx.sql("CREATE SCHEMA s1 ") and ctx.sql("CREATE SCHEMA s1")


class TestArrayFunctions:
    """Array function widening (reference: functions-array/src/ +
    functions-table generate_series)."""

    def test_generate_series_table(self, ctx):
        assert ctx.sql("SELECT * FROM generate_series(1, 5)").to_pydict() == \
            {"value": [1, 2, 3, 4, 5]}
        assert ctx.sql("SELECT * FROM range(1, 4)").to_pydict() == \
            {"value": [1, 2, 3]}
        assert ctx.sql(
            "SELECT sum(value) s FROM generate_series(1, 100)").to_pydict() \
            == {"s": [5050]}

    def test_array_transforms(self, ctx):
        out = ctx.sql(
            "SELECT array_slice([1,2,3,4,5], 2, 4) sl, "
            "array_slice([1,2,3,4,5], -2, -1) neg, "
            "array_distinct([1,2,2,3]) d, "
            "array_sort([3,1,2], 'DESC') srt, "
            "array_reverse([1,2,3]) rev").to_pydict()
        assert out == {"sl": [[2, 3, 4]], "neg": [[4, 5]], "d": [[1, 2, 3]],
                       "srt": [[3, 2, 1]], "rev": [[3, 2, 1]]}

    def test_array_set_ops(self, ctx):
        out = ctx.sql(
            "SELECT array_union([1,2],[2,3]) u, array_intersect([1,2],[2,3]) i, "
            "array_except([1,2],[2,3]) e, array_remove([1,2,1], 1) r1, "
            "array_remove_all([1,2,1], 1) ra, array_repeat('x', 2) rep, "
            "array_pop_back([1,2,3]) pb, array_pop_front([1,2,3]) pf, "
            "empty([]) em").to_pydict()
        assert out == {"u": [[1, 2, 3]], "i": [[2]], "e": [[1]],
                       "r1": [[2, 1]], "ra": [[2]], "rep": [["x", "x"]],
                       "pb": [[1, 2]], "pf": [[2, 3]], "em": [True]}


class TestPartialSort:
    """PartialSortExec: input sorted on a key prefix sorts runs
    incrementally (reference: sorts/partial_sort.rs)."""

    def test_partial_sort_matches_full_sort(self, ctx):
        import numpy as np
        from datafusion_tpu.common import dt
        from datafusion_tpu.common.batch import Batch
        from datafusion_tpu.common.column import Column
        from datafusion_tpu.common.schema import Field, Schema
        from datafusion_tpu.physical.expressions import ColumnExpr
        from datafusion_tpu.physical.plan.scan import MemoryExec
        from datafusion_tpu.physical.plan.sort import (
            PartialSortExec, PhysSortExpr, SortExec,
        )
        from datafusion_tpu.runtime import TaskContext

        rng = np.random.default_rng(2)
        a = np.sort(rng.integers(0, 20, 500))      # pre-sorted prefix key
        b = rng.integers(0, 100, 500)
        schema = Schema([Field("a", dt.INT64, False),
                         Field("b", dt.INT64, False)])
        # split into several batches to exercise cross-batch runs
        batches = []
        for lo in range(0, 500, 120):
            hi = min(lo + 120, 500)
            batches.append(Batch(schema, [
                Column(dt.INT64, a[lo:hi].astype(np.int64)),
                Column(dt.INT64, b[lo:hi].astype(np.int64))]))
        from datafusion_tpu.datasource.memory import MemTable
        src = MemoryExec(MemTable(schema, [batches]))
        exprs = [PhysSortExpr(ColumnExpr(0, "a", dt.INT64)),
                 PhysSortExpr(ColumnExpr(1, "b", dt.INT64))]
        ctx_t = TaskContext()
        partial = [bt for bt in PartialSortExec(exprs, src, 1).execute(0, ctx_t)]
        full = [bt for bt in SortExec(exprs, src).execute(0, ctx_t)]
        got = np.concatenate([bt.column(1).data_host() for bt in partial])
        exp = np.concatenate([bt.column(1).data_host() for bt in full])
        np.testing.assert_array_equal(got, exp)
        assert len(partial) > 1    # streamed run-by-run, not one blob

    def test_partial_sort_fetch(self, ctx):
        import numpy as np
        from datafusion_tpu.common import dt
        from datafusion_tpu.common.batch import Batch
        from datafusion_tpu.common.column import Column
        from datafusion_tpu.common.schema import Field, Schema
        from datafusion_tpu.physical.expressions import ColumnExpr
        from datafusion_tpu.physical.plan.scan import MemoryExec
        from datafusion_tpu.physical.plan.sort import (
            PartialSortExec, PhysSortExpr,
        )
        from datafusion_tpu.runtime import TaskContext
        a = np.array([1, 1, 1, 2, 2, 3], np.int64)
        b = np.array([30, 10, 20, 2, 1, 9], np.int64)
        schema = Schema([Field("a", dt.INT64, False),
                         Field("b", dt.INT64, False)])
        from datafusion_tpu.datasource.memory import MemTable
        src = MemoryExec(MemTable(schema, [[Batch(schema, [
            Column(dt.INT64, a), Column(dt.INT64, b)])]]))
        exprs = [PhysSortExpr(ColumnExpr(0, "a", dt.INT64)),
                 PhysSortExpr(ColumnExpr(1, "b", dt.INT64))]
        out = [bt for bt in PartialSortExec(exprs, src, 1, fetch=4)
               .execute(0, TaskContext())]
        got = np.concatenate([bt.column(1).data_host() for bt in out])
        np.testing.assert_array_equal(got, [10, 20, 30, 1])


class TestExplainFormats:
    """EXPLAIN FORMAT graphviz/pgjson (reference: display/{graphviz,pg_json}.rs)."""

    def test_graphviz(self, ctx):
        ctx.register_arrays("ef", {"a": [1, 2]})
        out = ctx.sql("EXPLAIN FORMAT GRAPHVIZ SELECT a FROM ef").to_pydict()
        assert out["plan"][0].startswith("digraph {")
        assert "->" in out["plan"][1]    # physical plan has edges

    def test_pgjson(self, ctx):
        import json
        ctx.register_arrays("ef2", {"a": [1, 2]})
        out = ctx.sql(
            "EXPLAIN FORMAT PGJSON SELECT sum(a) FROM ef2").to_pydict()
        doc = json.loads(out["plan"][0])
        assert doc[0]["Plan"]["Node Type"] == "Projection"


def test_parquet_page_index_pruning(tmp_path):
    """Page-index pruning: only pages whose [min,max] can satisfy the
    predicate are decoded (reference: parquet/page_filter.rs)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datafusion_tpu as df
    n = 120_000
    p = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"a": np.arange(n), "s": np.array(
            [f"k{i // 2000:03d}" for i in range(n)])}),
        p, row_group_size=60_000, data_page_size=8192, write_page_index=True)
    ctx = df.SessionContext()
    ctx.register_parquet("t", p)
    # late-materialization pushdown supersedes the page-index path —
    # disable it here so page pruning itself is exercised
    ctx.sql("SET datafusion.execution.parquet.pushdown_filters = false") \
        .collect_batch()
    out = ctx.sql(
        "SELECT count(*) c, sum(a) s FROM t WHERE a >= 70000 AND a < 70100"
    ).to_pydict()
    assert out == {"c": [100], "s": [sum(range(70000, 70100))]}
    # string predicate pages
    assert ctx.sql("SELECT count(*) c FROM t WHERE s = 'k033'").to_pydict() \
        == {"c": [2000]}
    # the metric proves pages were actually skipped
    txt = "\n".join(ctx.sql(
        "EXPLAIN ANALYZE SELECT count(*) FROM t WHERE a < 5000"
    ).to_pydict()["plan"])
    assert "page_index_rows_pruned" in txt


def test_avro_roundtrip(tmp_path):
    """COPY TO avro + CREATE EXTERNAL TABLE ... STORED AS AVRO through the
    embedded container-file codec (reference: avro_to_arrow + AvroExec)."""
    import numpy as np
    import datafusion_tpu as df
    ctx = df.SessionContext()
    ctx.register_arrays("src", {
        "i": np.arange(100, dtype=np.int64),
        "f": np.arange(100) * 0.5,
        "s": np.array([f"v{i % 7}" for i in range(100)], dtype=object),
    })
    p = str(tmp_path / "out.avro")
    ctx.sql(f"COPY (SELECT * FROM src) TO '{p}'")
    ctx.sql(f"CREATE EXTERNAL TABLE t STORED AS AVRO LOCATION '{p}'")
    out = ctx.sql(
        "SELECT count(*) c, sum(i) si, min(s) mn FROM t WHERE f < 10"
    ).to_pydict()
    assert out == {"c": [20], "si": [sum(range(20))], "mn": ["v0"]}
    # register_avro API + NULLs through the union encoding
    ctx.sql("CREATE TABLE n AS SELECT CASE WHEN i % 2 = 0 THEN i END AS x "
            "FROM src")
    p2 = str(tmp_path / "n.avro")
    ctx.table("n").write_file(p2, "avro")
    ctx.register_avro("t2", p2)
    out2 = ctx.sql("SELECT count(*) c, count(x) cx FROM t2").to_pydict()
    assert out2 == {"c": [100], "cx": [50]}


def test_redundant_sort_elision():
    """EnforceSorting analog: a sort whose input already delivers the
    ordering is removed; with LIMIT it becomes a plain limit."""
    import numpy as np
    import datafusion_tpu as df
    ctx = df.SessionContext()
    ctx.register_arrays("t", {"a": np.array([3, 1, 2, 5, 4]),
                              "b": np.arange(5.0)})
    q = "SELECT * FROM (SELECT a, b FROM t ORDER BY a, b) ORDER BY a"
    txt = "\n".join(ctx.sql("EXPLAIN " + q).to_pydict()["plan"])
    assert txt.count("SortExec") == 1, txt
    assert ctx.sql(q).to_pydict()["a"] == [1, 2, 3, 4, 5]
    # prefix + fetch -> degenerates to limit, same rows
    q2 = "SELECT * FROM (SELECT a, b FROM t ORDER BY a) ORDER BY a LIMIT 3"
    assert ctx.sql(q2).to_pydict()["a"] == [1, 2, 3]
    # different direction must NOT be elided
    q3 = "SELECT * FROM (SELECT a FROM t ORDER BY a) ORDER BY a DESC"
    txt3 = "\n".join(ctx.sql("EXPLAIN " + q3).to_pydict()["plan"])
    assert txt3.count("SortExec") == 2, txt3
    assert ctx.sql(q3).to_pydict()["a"] == [5, 4, 3, 2, 1]


def test_parquet_provider_column_statistics(tmp_path):
    """Parquet provider folds row-group min/max/null stats into
    Statistics (reference: parquet/statistics.rs extraction)."""
    import numpy as np
    import datafusion_tpu as df
    ctx = df.SessionContext()
    ctx.register_arrays("src", {"a": np.arange(1000, dtype=np.int64),
                                "b": np.arange(1000) * 0.5})
    p = str(tmp_path / "t.parquet")
    ctx.sql(f"COPY (SELECT * FROM src) TO '{p}'")
    ctx.register_parquet("t", p)
    st = ctx.get_table("t").statistics()
    assert st.num_rows.get() == 1000
    cs = st.column_statistics[0]
    assert cs.min_value.get() == 0 and cs.max_value.get() == 999
    assert cs.null_count.get() == 0


def test_three_part_table_names():
    """catalog.schema.table resolution with the default catalog
    (reference: resolve_table_references, default catalog `datafusion`,
    default schema `public`)."""
    import datafusion_tpu as df
    ctx = df.SessionContext()
    ctx.sql("CREATE SCHEMA s1")
    ctx.sql("CREATE TABLE s1.t AS SELECT 1 AS a")
    assert ctx.sql("SELECT * FROM datafusion.s1.t").to_pydict() == {"a": [1]}
    ctx.sql("CREATE TABLE plain AS SELECT 5 x")
    assert ctx.sql("SELECT * FROM public.plain").to_pydict() == {"x": [5]}
    assert ctx.sql("SELECT * FROM datafusion.public.plain").to_pydict() \
        == {"x": [5]}


def test_sort_preserving_merge_loser_tree_topk():
    """SPM with fetch pops only k rows via the heap merge instead of
    re-sorting the union (reference: sorts/merge.rs loser tree)."""
    import numpy as np
    from datafusion_tpu.common import dt
    from datafusion_tpu.common.batch import Batch
    from datafusion_tpu.datasource.memory import MemTable
    from datafusion_tpu.physical.expressions import ColumnExpr
    from datafusion_tpu.physical.plan.scan import MemoryExec
    from datafusion_tpu.physical.plan.sort import (
        PhysSortExpr, SortPreservingMergeExec)
    from datafusion_tpu.runtime import TaskContext
    rng = np.random.default_rng(2)
    parts = [[Batch.from_arrays({"v": np.sort(rng.random(500))})]
             for _ in range(4)]
    t = MemTable(parts[0][0].schema, parts)
    spm = SortPreservingMergeExec(
        [PhysSortExpr(ColumnExpr(0, "v", dt.FLOAT64))], MemoryExec(t),
        fetch=23)
    out = list(spm.execute(0, TaskContext()))[0]
    got = out.columns[0].data_host()[:out.num_rows]
    allv = np.concatenate([p[0].columns[0].data_host() for p in parts])
    np.testing.assert_allclose(got, np.sort(allv)[:23])


def test_recursive_cte_with_join(ctx):
    """ADVICE r1 (high): a join inside a recursive term must not reuse the
    first iteration's CollectLeft build across iterations."""
    ctx.register_arrays("edges", {
        "src": np.array([1, 2, 3]), "dst": np.array([2, 3, 4])})
    out = q(ctx, "WITH RECURSIVE r(n) AS ("
                 "SELECT 1 UNION ALL "
                 "SELECT e.dst FROM r JOIN edges e ON e.src = r.n) "
                 "SELECT n FROM r ORDER BY n")
    assert out["n"] == [1, 2, 3, 4]


def test_like_non_ascii(ctx):
    """ADVICE r1 (medium): LIKE '_' is per-character, not per-byte; ILIKE
    folds non-ASCII letters."""
    ctx.register_arrays("s", {"v": np.array(["héllo", "hello", "hxllo"],
                                            dtype=object)})
    out = q(ctx, "SELECT v FROM s WHERE v LIKE 'h_llo' ORDER BY v")
    assert out["v"] == ["hello", "hxllo", "héllo"]   # codepoint collation
    out = q(ctx, "SELECT v FROM s WHERE v ILIKE 'HÉLLO'")
    assert out["v"] == ["héllo"]
