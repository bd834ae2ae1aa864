"""Randomized differential suites (reference: core/tests/fuzz_cases —
aggregate_fuzz, join_fuzz, sort_fuzz, window_fuzz; all seeded)."""
import numpy as np
import pandas as pd
import pytest

import datafusion_tpu as df


def _random_table(rng, n, with_nulls=True):
    from datafusion_tpu.common import dt
    from datafusion_tpu.common.batch import Batch
    from datafusion_tpu.common.column import Column
    from datafusion_tpu.common.schema import Field, Schema
    k = rng.integers(-1000, 1000, n)
    v = rng.normal(size=n) * 100
    s = rng.choice(list("pqrstuv"), n).astype(object)
    kv = rng.random(n) < 0.1 if with_nulls else np.zeros(n, bool)
    cols = [
        Column(dt.INT64, k.astype(np.int64), ~kv if kv.any() else None),
        Column(dt.FLOAT64, v),
    ]
    from datafusion_tpu.common.column import Dictionary
    codes, nv, dic = Dictionary.build(s)
    cols.append(Column(dt.STRING, codes, nv, dic))
    schema = Schema([Field("k", dt.INT64, True), Field("v", dt.FLOAT64, False),
                     Field("s", dt.STRING, False)])
    return Batch(schema, cols), pd.DataFrame({
        "k": np.where(kv, np.nan, k), "v": v, "s": s})


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_sort_fuzz(seed):
    from datafusion_tpu.datasource.memory import MemTable
    rng = np.random.default_rng(seed)
    batch, pdf = _random_table(rng, 3000)
    ctx = df.SessionContext()
    ctx.register_table("t", MemTable(batch.schema, [[batch]]))
    for order, asc, nf in [("k", True, False), ("k", False, True),
                           ("v", True, False), ("s", False, False)]:
        sql = (f"SELECT k, v, s FROM t ORDER BY {order} "
               f"{'ASC' if asc else 'DESC'} "
               f"{'NULLS FIRST' if nf else 'NULLS LAST'}, v")
        out = ctx.sql(sql).to_pandas()
        exp = pdf.sort_values([order, "v"], ascending=[asc, True],
                              na_position="first" if nf else "last")
        np.testing.assert_allclose(out["v"].to_numpy(), exp["v"].to_numpy())


@pytest.mark.parametrize("seed", [5, 6])
def test_window_fuzz(seed):
    from datafusion_tpu.datasource.memory import MemTable
    rng = np.random.default_rng(seed)
    batch, pdf = _random_table(rng, 2000, with_nulls=False)
    ctx = df.SessionContext()
    ctx.register_table("t", MemTable(batch.schema, [[batch]]))
    out = ctx.sql(
        "SELECT s, v, row_number() OVER (PARTITION BY s ORDER BY v) rn, "
        "sum(v) OVER (PARTITION BY s ORDER BY v) running, "
        "sum(v) OVER (PARTITION BY s) total FROM t ORDER BY s, v").to_pandas()
    pdf = pdf.sort_values(["s", "v"]).reset_index(drop=True)
    exp_rn = pdf.groupby("s").cumcount() + 1
    exp_run = pdf.groupby("s")["v"].cumsum()
    exp_tot = pdf.groupby("s")["v"].transform("sum")
    np.testing.assert_array_equal(out["rn"].to_numpy(), exp_rn.to_numpy())
    np.testing.assert_allclose(out["running"].to_numpy(), exp_run.to_numpy(),
                               rtol=1e-9)
    np.testing.assert_allclose(out["total"].to_numpy(), exp_tot.to_numpy(),
                               rtol=1e-9)


@pytest.mark.parametrize("seed", [9, 10])
def test_join_types_fuzz(seed):
    """All join types vs pandas on random keyed data with NULL keys."""
    from datafusion_tpu.datasource.memory import MemTable
    rng = np.random.default_rng(seed)
    bl, pl = _random_table(rng, 800)
    br, pr = _random_table(rng, 700)
    ctx = df.SessionContext()
    ctx.register_table("l", MemTable(bl.schema, [[bl]]))
    ctx.register_table("r", MemTable(br.schema, [[br]]))
    pl = pl.rename(columns={"v": "lv", "s": "ls"})
    pr = pr.rename(columns={"v": "rv", "s": "rs"})
    for how, sql_t in [("inner", "JOIN"), ("left", "LEFT JOIN"),
                       ("right", "RIGHT JOIN"), ("outer", "FULL JOIN")]:
        got = ctx.sql(f"SELECT count(*) c FROM l {sql_t} r ON l.k = r.k"
                      ).to_pydict()["c"][0]
        exp = len(pd.merge(pl.dropna(subset=[]), pr, on="k", how=how))
        # pandas merges NaN==NaN; SQL does not — correct for it
        nan_l = int(pl.k.isna().sum())
        nan_r = int(pr.k.isna().sum())
        if how == "inner":
            exp = len(pd.merge(pl.dropna(subset=["k"]),
                               pr.dropna(subset=["k"]), on="k"))
        elif how == "left":
            exp = len(pd.merge(pl.dropna(subset=["k"]),
                               pr.dropna(subset=["k"]), on="k")) + nan_l + \
                len(pl.dropna(subset=["k"])) - len(
                    pd.merge(pl.dropna(subset=["k"]),
                             pr.dropna(subset=["k"]), on="k", how="left")
                    .dropna(subset=["rv"]).k.index) + 0
            # simpler: recompute via semi logic
            inner = pd.merge(pl.dropna(subset=["k"]).reset_index(),
                             pr.dropna(subset=["k"]), on="k")
            matched = inner["index"].nunique()
            exp = len(inner) + (len(pl) - matched - nan_l) + nan_l
        elif how == "right":
            inner = pd.merge(pr.dropna(subset=["k"]).reset_index(),
                             pl.dropna(subset=["k"]), on="k")
            matched = inner["index"].nunique()
            exp = len(inner) + (len(pr) - matched - nan_r) + nan_r
        else:
            inner_l = pd.merge(pl.dropna(subset=["k"]).reset_index(),
                               pr.dropna(subset=["k"]), on="k")
            inner_r = pd.merge(pr.dropna(subset=["k"]).reset_index(),
                               pl.dropna(subset=["k"]), on="k")
            exp = len(inner_l) + (len(pl) - inner_l["index"].nunique()) + \
                (len(pr) - inner_r["index"].nunique())
        assert got == exp, (how, got, exp)
