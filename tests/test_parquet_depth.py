"""Parquet depth: bloom-filter pruning, byte-range splits, schema adapter
(reference: datasource-parquet/src/row_group_filter.rs, mod.rs:629,
schema_adapter.rs)."""
import numpy as np
import pytest

import datafusion_tpu as df


def _metrics_text(ctx, q):
    return "\n".join(ctx.sql("EXPLAIN ANALYZE " + q).to_pydict()["plan"])


def test_bloom_filter_prunes_row_groups(tmp_path):
    """Equality predicate on a high-cardinality column skips row groups
    whose bloom filter excludes the literal, even when min/max overlap
    (reference: row_group_filter.rs bloom pruning)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    rng = np.random.default_rng(11)
    # interleave values so every row group's [min,max] covers the probe
    n = 40_000
    vals = rng.permutation(np.arange(n) * 2)  # evens only
    t = pa.table({"id": vals, "v": rng.normal(size=n)})
    p = str(tmp_path / "b.parquet")
    pq.write_table(t, p, row_group_size=5_000,
                   bloom_filter_options={"id": True})
    ctx = df.SessionContext()
    ctx.register_parquet("t", p)
    # absent value: stats can't prune (range covers), bloom prunes all
    txt = _metrics_text(ctx, "SELECT count(*) c FROM t WHERE id = 12345")
    assert "row_groups_pruned_bloom_filter" in txt, txt
    assert ctx.sql("SELECT count(*) c FROM t WHERE id = 12345"
                   ).to_pydict()["c"] == [0]
    # present value still found
    probe = int(vals[123])
    out = ctx.sql(f"SELECT count(*) c FROM t WHERE id = {probe}").to_pydict()
    assert out["c"] == [1]
    # bloom_filter_on_read=false disables it
    ctx.config.set("datafusion.execution.parquet.bloom_filter_on_read",
                   "false")
    txt2 = _metrics_text(ctx, "SELECT count(*) c FROM t WHERE id = 12345")
    assert "row_groups_pruned_bloom_filter" not in txt2


def test_bloom_string_probe(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    names = [f"user_{i:05d}" for i in range(20_000)]
    t = pa.table({"name": names, "x": list(range(20_000))})
    p = str(tmp_path / "s.parquet")
    pq.write_table(t, p, row_group_size=4_000,
                   bloom_filter_options={"name": True})
    ctx = df.SessionContext()
    ctx.register_parquet("t", p)
    q = "SELECT count(*) c FROM t WHERE name = 'user_99999'"
    assert ctx.sql(q).to_pydict()["c"] == [0]
    assert "row_groups_pruned_bloom_filter" in _metrics_text(ctx, q)
    q2 = "SELECT x FROM t WHERE name = 'user_00042'"
    assert ctx.sql(q2).to_pydict()["x"] == [42]


def test_bloom_filter_on_write_roundtrip(tmp_path):
    """bloom_filter_on_write produces files our reader prunes."""
    import pyarrow.parquet as pq
    ctx = df.SessionContext()
    ctx.config.set("datafusion.execution.parquet.bloom_filter_on_write",
                   "true")
    ctx.register_arrays("src", {"k": np.arange(0, 20_000, 2)})
    p = str(tmp_path / "w.parquet")
    ctx.sql(f"COPY (SELECT * FROM src) TO '{p}'")
    md = pq.ParquetFile(p).metadata.row_group(0).column(0)
    assert md.bloom_filter_offset is not None


def test_intra_file_repartitioning(tmp_path):
    """target_partitions > 1 splits one large parquet file into N
    byte-balanced row-group partitions read in parallel (reference:
    ParquetExec::repartitioned, parquet/mod.rs:629)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    n = 80_000
    t = pa.table({"a": np.arange(n), "b": np.arange(n) * 0.5})
    p = str(tmp_path / "big.parquet")
    pq.write_table(t, p, row_group_size=10_000)   # 8 row groups
    ctx = df.SessionContext()
    ctx.config.set("datafusion.execution.target_partitions", "4")
    ctx.config.set("datafusion.tpu.device_aggregate", "false")
    ctx.register_parquet("t", p)
    q = "SELECT count(*) c, sum(a) s FROM t"
    txt = "\n".join(ctx.sql("EXPLAIN " + q).to_pydict()["plan"])
    assert "partitions=4" in txt, txt
    out = ctx.sql(q).to_pydict()
    assert out["c"] == [n] and out["s"] == [n * (n - 1) // 2]
    # pruning still composes with assignments
    out2 = ctx.sql("SELECT count(*) c FROM t WHERE a < 5000").to_pydict()
    assert out2["c"] == [5000]


def test_schema_adapter_evolving_files(tmp_path):
    """Files written before a column existed scan as null-filled; int32
    files cast up to the table's int64 (reference: schema_adapter.rs
    DefaultSchemaAdapter)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    # newest file defines the table schema (a: int64, b: float64, c: string)
    p1 = str(tmp_path / "part-2.parquet")   # full schema
    pq.write_table(pa.table({"a": pa.array([1, 2], type=pa.int64()),
                             "b": [1.5, 2.5],
                             "c": ["x", "y"]}), p1)
    p2 = str(tmp_path / "part-1.parquet")   # old file: no c, a is int32
    pq.write_table(pa.table({"a": pa.array([3, 4], type=pa.int32()),
                             "b": [3.5, 4.5]}), p2)
    ctx = df.SessionContext()
    ctx.register_parquet("t", str(tmp_path / "part-*.parquet"))
    out = ctx.sql("SELECT a, b, c FROM t ORDER BY a").to_pydict()
    assert out["a"] == [1, 2, 3, 4]
    assert out["b"] == [1.5, 2.5, 3.5, 4.5]
    assert out["c"] == ["x", "y", None, None]
    # aggregates over the adapted column
    got = ctx.sql("SELECT count(c) n, count(*) t FROM t").to_pydict()
    assert got["n"] == [2] and got["t"] == [4]


def test_pushdown_row_filters(tmp_path):
    """Late-materialization pushdown (reference row_filter.rs): the scan
    decodes predicate columns first and emits only surviving rows;
    results identical with the flag off; metrics record the reduction."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datafusion_tpu.api.context import SessionContext

    p = str(tmp_path / "t.parquet")
    rng = np.random.default_rng(0)
    n = 50_000
    pq.write_table(pa.table({
        "a": rng.integers(0, 1000, n),
        "b": rng.standard_normal(n),
        "s": np.array([f"x{i % 50}" for i in range(n)]),
    }), p, row_group_size=5_000)
    ctx = SessionContext()
    ctx.register_parquet("t", p)
    sql = ("SELECT a, s, b FROM t WHERE a < 25 AND s IN ('x3', 'x7') "
           "ORDER BY a, b")
    on = ctx.sql(sql).collect_batch()
    an = ctx.sql("EXPLAIN ANALYZE " + sql).collect_batch() \
        .columns[1].to_pylist(1)[0]
    scan_line = [l for l in an.split("\n") if "ParquetScanExec" in l][0]
    assert "pushdown_rows_matched" in scan_line
    assert "pushdown_rows_filtered" in scan_line
    ctx.sql("SET datafusion.execution.parquet.pushdown_filters = false") \
        .collect_batch()
    off = ctx.sql(sql).collect_batch()
    assert on.num_rows == off.num_rows
    for c1, c2 in zip(on.columns, off.columns):
        assert c1.to_pylist(on.num_rows) == c2.to_pylist(off.num_rows)
