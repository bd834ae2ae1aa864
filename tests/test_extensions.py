"""Extension APIs: scalar/aggregate UDFs, table functions,
information_schema, CLI statement splitting, prepared statements."""
import numpy as np
import pytest

from datafusion_tpu.common import dt


def test_scalar_udf(ctx):
    ctx.register_arrays("t", {"a": np.array([1.0, 2.0, 3.0])})
    ctx.register_udf("double_it", lambda x: x * 2, [dt.FLOAT64], dt.FLOAT64)
    out = ctx.sql("SELECT double_it(a) d FROM t ORDER BY d").to_pydict()
    assert out["d"] == [2.0, 4.0, 6.0]


def test_string_udf(ctx):
    ctx.register_arrays("t", {"s": np.array(["x", "yy", "zzz"])})
    ctx.register_udf("my_len", lambda s: np.array([len(x) for x in s]),
                     [dt.STRING], dt.INT64)
    out = ctx.sql("SELECT my_len(s) l FROM t ORDER BY l").to_pydict()
    assert out["l"] == [1, 2, 3]


def test_udaf(ctx):
    from datafusion_tpu.physical.aggregates import SumAcc

    class SumSquares(SumAcc):
        def __init__(self):
            super().__init__(dt.FLOAT64, dt.FLOAT64)

        def _vals(self, c):
            d = c.data_host()
            return d * d

    ctx.register_arrays("t", {"g": np.array(["a", "a", "b"]),
                              "v": np.array([1.0, 2.0, 3.0])})
    ctx.register_udaf("sumsq", SumSquares, [dt.FLOAT64], dt.FLOAT64)
    out = ctx.sql("SELECT g, sumsq(v) s FROM t GROUP BY g ORDER BY g").to_pydict()
    assert out["s"] == [pytest.approx(5.0), pytest.approx(9.0)]


def test_information_schema(ctx):
    ctx.register_arrays("widgets", {"id": np.array([1]), "name": np.array(["x"])})
    out = ctx.sql("SELECT table_name FROM information_schema.tables "
                  "WHERE table_name = 'widgets'").to_pydict()
    assert out["table_name"] == ["widgets"]
    out = ctx.sql("SELECT column_name FROM information_schema.columns "
                  "WHERE table_name = 'widgets' ORDER BY ordinal_position").to_pydict()
    assert out["column_name"] == ["id", "name"]
    out = ctx.sql("SELECT count(*) c FROM information_schema.df_settings").to_pydict()
    assert out["c"][0] > 10


def test_prepared_statements(ctx):
    ctx.register_arrays("t", {"a": np.array([1, 2, 3])})
    ctx.sql("PREPARE p1 AS SELECT count(*) c FROM t WHERE a > $1")
    out = ctx.sql("EXECUTE p1(1)").to_pydict()
    assert out["c"] == [2]
    ctx.sql("DEALLOCATE p1")


def test_set_show(ctx):
    ctx.sql("SET datafusion.execution.batch_size = 4096")
    out = ctx.sql("SHOW datafusion.execution.batch_size").to_pydict()
    assert out["value"] == ["4096"]


def test_create_view(ctx):
    ctx.register_arrays("t", {"a": np.array([1, 2, 3, 4])})
    ctx.sql("CREATE VIEW big AS SELECT a FROM t WHERE a > 2")
    out = ctx.sql("SELECT count(*) c FROM big").to_pydict()
    assert out["c"] == [2]
    ctx.sql("DROP VIEW big")


def test_insert_into(ctx):
    ctx.sql("CREATE TABLE t (a INT, b VARCHAR)")
    ctx.sql("INSERT INTO t VALUES (1, 'x'), (2, 'y')")
    ctx.sql("INSERT INTO t VALUES (3, 'z')")
    out = ctx.sql("SELECT a, b FROM t ORDER BY a").to_pydict()
    assert out == {"a": [1, 2, 3], "b": ["x", "y", "z"]}


def test_cli_statement_split():
    from datafusion_tpu.cli import _split_statements
    stmts = _split_statements(
        "SELECT 1; SELECT 'a;b'; \nSELECT 2")
    assert len(stmts) == 3
    assert stmts[1] == "SELECT 'a;b'"


def test_table_function(ctx):
    from datafusion_tpu.datasource.memory import MemTable

    def make_series(n):
        return MemTable.from_arrays({"value": np.arange(int(n), dtype=np.int64)})
    ctx.register_udtf("range_table", make_series)
    # table functions resolve through the SQL planner's provider hook
    fn = ctx.get_table_function("range_table")
    assert fn is not None


def test_udwf(ctx):
    import numpy as np
    from datafusion_tpu.common import dt

    def running_product(args, part_start, part_end):
        (v,) = args
        out = np.empty(len(v), np.float64)
        # cumulative product restarting at each partition start
        for i in range(len(v)):
            out[i] = v[i] if i == part_start[i] else out[i - 1] * v[i]
        return out

    ctx.register_arrays("t", {"g": np.array(["a", "a", "b", "b"]),
                              "v": np.array([2.0, 3.0, 5.0, 7.0])})
    ctx.register_udwf("running_product", running_product,
                      [dt.FLOAT64], dt.FLOAT64)
    out = ctx.sql("SELECT g, v, running_product(v) OVER "
                  "(PARTITION BY g ORDER BY v) rp FROM t ORDER BY g, v"
                  ).to_pydict()
    assert out["rp"] == [2.0, 6.0, 5.0, 35.0]


class TestDataFrameExtras:
    """describe / fill_null / cache / distinct_on
    (reference: dataframe/mod.rs)."""

    @staticmethod
    def _df(ctx):
        import numpy as np
        ctx.register_arrays("dfx", {
            "a": np.array([1.0, 2.0, 3.0, 4.0]),
            "s": np.array(["x", "y", "x", "z"], object)})
        return ctx.table("dfx")

    def test_describe(self, ctx):
        out = self._df(ctx).describe().to_pydict()
        assert out["describe"] == ["count", "null_count", "mean", "std",
                                   "min", "max", "median"]
        assert out["a"][0] == "4" and out["a"][2] == "2.5"
        assert out["s"][4] == "x" and out["s"][5] == "z"

    def test_fill_null(self, ctx):
        import numpy as np
        from datafusion_tpu.common import dt
        from datafusion_tpu.common.batch import Batch
        from datafusion_tpu.common.column import Column
        from datafusion_tpu.common.schema import Field, Schema
        from datafusion_tpu.datasource.memory import MemTable
        schema = Schema([Field("a", dt.INT64, True)])
        b = Batch(schema, [Column(dt.INT64, np.array([1, 2, 3]),
                                  np.array([True, False, True]))])
        ctx.register_table("fn_t", MemTable(schema, [[b]]))
        out = ctx.table("fn_t").fill_null(-1).to_pydict()
        assert out == {"a": [1, -1, 3]}

    def test_cache_materializes(self, ctx):
        d = self._df(ctx).filter("a > 1").cache()
        assert d.count() == 3
        assert sorted(d.to_pydict()["s"]) == ["x", "y", "z"]


class TestVarProvider:
    """@user / @@system variables (reference: variable/mod.rs VarProvider)."""

    def test_system_version_builtin(self, ctx):
        out = ctx.sql("SELECT @@version v").to_pydict()
        assert out["v"][0].startswith("datafusion-tpu")

    def test_user_variables(self, ctx):
        from datafusion_tpu.common.scalar import ScalarValue

        class P:
            def get_value(self, names):
                return ScalarValue.int64({"lim": 10}[names[0]])

        ctx.register_variable_provider("user", P())
        ctx.register_arrays("vt", {"a": [5, 15]})
        assert ctx.sql("SELECT a FROM vt WHERE a > @lim").to_pydict() == \
            {"a": [15]}

    def test_missing_provider_errors(self, ctx):
        import pytest as _pt
        from datafusion_tpu.common.errors import PlanError
        with _pt.raises(PlanError):
            ctx.sql("SELECT @nope").collect_batch()
