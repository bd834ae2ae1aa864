"""Device window evaluation (device/window.py): the fused
[lexsort -> segment scans -> inverse permutation] program against the
host numpy twin on randomized data, for every function in the device
family. The threshold config drops to 1 so the CPU-backend tests
exercise the device program itself.
"""
import numpy as np
import pytest

import datafusion_tpu as df


def make_pair(seed=0, n=4000, nulls=True):
    rng = np.random.default_rng(seed)
    data = {
        "g": rng.integers(0, 7, n),
        "s": np.array([f"p{i}" for i in rng.integers(0, 5, n)]),
        "v": rng.normal(size=n).round(3),
        "w": rng.integers(0, 100, n).astype(np.int64),
        "i": np.arange(n),
    }
    ctxs = []
    for min_rows in (1, 1 << 40):      # device path vs host path
        ctx = df.SessionContext()
        ctx.sql(f"SET datafusion.tpu.device_window_min_rows = {min_rows}")
        tbl = dict(data)
        ctx.register_arrays("t", tbl)
        if nulls:
            # NULLs via SQL so both ctxs agree
            ctx.sql("CREATE TABLE tn AS SELECT g, s, "
                    "CASE WHEN w % 11 = 3 THEN NULL ELSE v END v, w, i "
                    "FROM t")
        ctxs.append(ctx)
    return ctxs


QUERIES = [
    ("ranks", "SELECT i, row_number() OVER (PARTITION BY g ORDER BY v, i) rn,"
     " rank() OVER (PARTITION BY g ORDER BY w) rk,"
     " dense_rank() OVER (PARTITION BY g ORDER BY w) dr"
     " FROM t ORDER BY i"),
    ("pct", "SELECT i, percent_rank() OVER (PARTITION BY s ORDER BY w) pr,"
     " cume_dist() OVER (PARTITION BY s ORDER BY w) cd,"
     " ntile(4) OVER (PARTITION BY s ORDER BY w, i) nt"
     " FROM t ORDER BY i"),
    ("shift", "SELECT i, lag(v) OVER (PARTITION BY g ORDER BY i) l1,"
     " lead(v, 2) OVER (PARTITION BY g ORDER BY i) l2,"
     " lag(v, 1, -1.0) OVER (PARTITION BY g ORDER BY i) l3"
     " FROM t ORDER BY i"),
    ("runsum", "SELECT i, sum(v) OVER (PARTITION BY g ORDER BY i) rs,"
     " count(v) OVER (PARTITION BY g ORDER BY i) rc,"
     " avg(v) OVER (PARTITION BY g ORDER BY i) ra"
     " FROM t ORDER BY i"),
    ("wholes", "SELECT i, sum(w) OVER (PARTITION BY s) ws,"
     " count(*) OVER (PARTITION BY s) wc"
     " FROM t ORDER BY i"),
    ("rows_frame", "SELECT i, sum(w) OVER (PARTITION BY g ORDER BY i "
     "ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) fs,"
     " count(w) OVER (ORDER BY i ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) fc"
     " FROM t ORDER BY i"),
    ("no_partition", "SELECT i, row_number() OVER (ORDER BY v, i) rn,"
     " sum(v) OVER (ORDER BY v, i) rs FROM t ORDER BY i"),
]


@pytest.mark.parametrize("tag,sql", QUERIES)
def test_device_matches_host(tag, sql):
    dev, host = make_pair()
    a = dev.sql(sql).to_pydict()
    b = host.sql(sql).to_pydict()
    assert set(a) == set(b)
    for k in a:
        av, bv = a[k], b[k]
        if av and isinstance(next((x for x in av if x is not None), 0.0),
                             float):
            assert [x is None for x in av] == [x is None for x in bv], \
                (tag, k)
            np.testing.assert_allclose(
                [x for x in av if x is not None],
                [x for x in bv if x is not None], rtol=1e-9,
                err_msg=f"{tag}/{k}")
        else:
            assert av == bv, (tag, k)


def test_device_window_with_nulls():
    dev, host = make_pair(nulls=True)
    sql = ("SELECT i, sum(v) OVER (PARTITION BY g ORDER BY i) rs,"
           " count(v) OVER (PARTITION BY g ORDER BY i) rc,"
           " lag(v) OVER (PARTITION BY g ORDER BY i) lg"
           " FROM tn ORDER BY i")
    a = dev.sql(sql).to_pydict()
    b = host.sql(sql).to_pydict()
    assert a["rc"] == b["rc"]
    assert [x is None for x in a["rs"]] == [x is None for x in b["rs"]]
    assert [x is None for x in a["lg"]] == [x is None for x in b["lg"]]
    np.testing.assert_allclose([x for x in a["rs"] if x is not None],
                               [x for x in b["rs"] if x is not None],
                               rtol=1e-9)


def test_device_window_decimal_avg():
    """Decimal frame sums/averages stay exact through the int64 lane."""
    for min_rows in (1, 1 << 40):
        ctx = df.SessionContext()
        ctx.sql(f"SET datafusion.tpu.device_window_min_rows = {min_rows}")
        ctx.sql("CREATE TABLE d AS SELECT * FROM (VALUES "
                "(1, 10.25), (2, 0.50), (3, 99.99), (4, 2.00), (5, 3.75)"
                ") v(i, x)")
        ctx.sql("CREATE TABLE d2 AS SELECT i, CAST(x AS DECIMAL(10,2)) x "
                "FROM d")
        out = ctx.sql("SELECT i, sum(x) OVER (ORDER BY i) s, "
                      "avg(x) OVER (ORDER BY i) a FROM d2 ORDER BY i"
                      ).to_pydict()
        if min_rows == 1:
            got = out
        else:
            assert out == got   # device == host, exactly
