"""TPC-H: all 22 queries execute; key queries validated against a pandas
oracle computed from the same generated data (the reference validates
against dbgen answer files — SURVEY.md §6; our generator is seeded random,
so the oracle is recomputed)."""
import datetime

import numpy as np
import pandas as pd
import pytest

import datafusion_tpu as df
from datafusion_tpu.tpch import QUERIES, generate_tpch, register_tpch

SF = 0.01
SEED = 1


@pytest.fixture(scope="module")
def tpch():
    ctx = df.SessionContext()
    register_tpch(ctx, sf=SF, seed=SEED)
    data = generate_tpch(sf=SF, seed=SEED)
    frames = {k: pd.DataFrame(v) for k, v in data.items()}
    return ctx, frames


@pytest.mark.parametrize("n", sorted(QUERIES))
def test_tpch_runs(tpch, n):
    ctx, _ = tpch
    batch = ctx.sql(QUERIES[n]).collect_batch()
    assert batch.num_rows >= 0   # executes without error


def _dates(f, col):
    return f[col].to_numpy().astype("datetime64[D]")


def test_q1_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[1]).to_pandas()
    li = f["lineitem"]
    m = _dates(li, "l_shipdate") <= np.datetime64("1998-09-02")
    g = li[m].assign(
        disc_price=lambda d: d.l_extendedprice * (1 - d.l_discount),
        charge=lambda d: d.l_extendedprice * (1 - d.l_discount) * (1 + d.l_tax),
    ).groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        sum_qty=("l_quantity", "sum"),
        sum_base_price=("l_extendedprice", "sum"),
        sum_disc_price=("disc_price", "sum"),
        sum_charge=("charge", "sum"),
        avg_qty=("l_quantity", "mean"),
        avg_price=("l_extendedprice", "mean"),
        avg_disc=("l_discount", "mean"),
        count_order=("l_quantity", "size"),
    ).sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    assert list(out["l_returnflag"]) == list(g["l_returnflag"])
    np.testing.assert_allclose(out["sum_qty"].astype(float), g["sum_qty"], rtol=1e-9)
    np.testing.assert_allclose(out["sum_disc_price"].astype(float), g["sum_disc_price"], rtol=1e-9)
    np.testing.assert_allclose(out["sum_charge"].astype(float), g["sum_charge"], rtol=1e-9)
    # decimal avg rounds at scale+4 (reference avg(decimal) semantics)
    np.testing.assert_allclose(out["avg_disc"].astype(float), g["avg_disc"], rtol=1e-4)
    np.testing.assert_array_equal(out["count_order"], g["count_order"])


def test_q3_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[3]).to_pandas()
    cust = f["customer"][f["customer"].c_mktsegment == "BUILDING"]
    orders = f["orders"][_dates(f["orders"], "o_orderdate") < np.datetime64("1995-03-15")]
    li = f["lineitem"][_dates(f["lineitem"], "l_shipdate") > np.datetime64("1995-03-15")]
    j = cust.merge(orders, left_on="c_custkey", right_on="o_custkey") \
            .merge(li, left_on="o_orderkey", right_on="l_orderkey")
    j["revenue"] = j.l_extendedprice * (1 - j.l_discount)
    g = j.groupby(["l_orderkey", "o_orderdate", "o_shippriority"],
                  as_index=False).revenue.sum() \
        .sort_values(["revenue", "o_orderdate"],
                     ascending=[False, True]).head(10).reset_index(drop=True)
    assert list(out["l_orderkey"]) == list(g["l_orderkey"])
    np.testing.assert_allclose(out["revenue"].astype(float), g["revenue"], rtol=1e-9)


def test_q4_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[4]).to_pandas()
    o = f["orders"]
    od = _dates(o, "o_orderdate")
    o = o[(od >= np.datetime64("1993-07-01")) & (od < np.datetime64("1993-10-01"))]
    li = f["lineitem"]
    li = li[_dates(li, "l_commitdate") < _dates(li, "l_receiptdate")]
    sel = o[o.o_orderkey.isin(li.l_orderkey)]
    g = sel.groupby("o_orderpriority", as_index=False).agg(
        order_count=("o_orderkey", "size")).sort_values("o_orderpriority")
    assert list(out["o_orderpriority"]) == list(g["o_orderpriority"])
    np.testing.assert_array_equal(out["order_count"], g["order_count"])


def test_q5_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[5]).to_pandas()
    o = f["orders"]
    od = _dates(o, "o_orderdate")
    o = o[(od >= np.datetime64("1994-01-01")) & (od < np.datetime64("1995-01-01"))]
    j = f["customer"].merge(o, left_on="c_custkey", right_on="o_custkey") \
        .merge(f["lineitem"], left_on="o_orderkey", right_on="l_orderkey") \
        .merge(f["supplier"], left_on="l_suppkey", right_on="s_suppkey")
    j = j[j.c_nationkey == j.s_nationkey]
    j = j.merge(f["nation"], left_on="s_nationkey", right_on="n_nationkey") \
         .merge(f["region"], left_on="n_regionkey", right_on="r_regionkey")
    j = j[j.r_name == "ASIA"]
    j["revenue"] = j.l_extendedprice * (1 - j.l_discount)
    g = j.groupby("n_name", as_index=False).revenue.sum() \
        .sort_values("revenue", ascending=False).reset_index(drop=True)
    assert list(out["n_name"]) == list(g["n_name"])
    np.testing.assert_allclose(out["revenue"].astype(float), g["revenue"], rtol=1e-9)


def test_q6_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[6]).to_pydict()
    li = f["lineitem"]
    sd = _dates(li, "l_shipdate")
    m = ((sd >= np.datetime64("1994-01-01")) & (sd < np.datetime64("1995-01-01"))
         & (li.l_discount >= 0.05) & (li.l_discount <= 0.07)
         & (li.l_quantity < 24))
    expected = float((li[m].l_extendedprice * li[m].l_discount).sum())
    assert float(out["revenue"][0]) == pytest.approx(expected, rel=1e-9)


def test_q12_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[12]).to_pandas()
    li = f["lineitem"]
    rd = _dates(li, "l_receiptdate")
    m = (li.l_shipmode.isin(["MAIL", "SHIP"])
         & (_dates(li, "l_commitdate") < rd)
         & (_dates(li, "l_shipdate") < _dates(li, "l_commitdate"))
         & (rd >= np.datetime64("1994-01-01")) & (rd < np.datetime64("1995-01-01")))
    j = li[m].merge(f["orders"], left_on="l_orderkey", right_on="o_orderkey")
    hi = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    g = j.assign(h=hi.astype(int), l=(~hi).astype(int)) \
        .groupby("l_shipmode", as_index=False).agg(
            high_line_count=("h", "sum"), low_line_count=("l", "sum")) \
        .sort_values("l_shipmode")
    assert list(out["l_shipmode"]) == list(g["l_shipmode"])
    np.testing.assert_array_equal(out["high_line_count"], g["high_line_count"])
    np.testing.assert_array_equal(out["low_line_count"], g["low_line_count"])


def test_q14_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[14]).to_pydict()
    li = f["lineitem"]
    sd = _dates(li, "l_shipdate")
    m = (sd >= np.datetime64("1995-09-01")) & (sd < np.datetime64("1995-10-01"))
    j = li[m].merge(f["part"], left_on="l_partkey", right_on="p_partkey")
    rev = j.l_extendedprice * (1 - j.l_discount)
    promo = rev[j.p_type.str.startswith("PROMO")].sum()
    expected = 100.0 * promo / rev.sum()
    assert float(out["promo_revenue"][0]) == pytest.approx(expected, rel=1e-9)


def test_q18_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[18]).to_pandas()
    li = f["lineitem"]
    big = li.groupby("l_orderkey").l_quantity.sum()
    big = set(big[big > 300].index)
    j = f["customer"].merge(f["orders"], left_on="c_custkey", right_on="o_custkey") \
        .merge(li, left_on="o_orderkey", right_on="l_orderkey")
    j = j[j.o_orderkey.isin(big)]
    g = j.groupby(["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                   "o_totalprice"], as_index=False).l_quantity.sum() \
        .sort_values(["o_totalprice", "o_orderdate"],
                     ascending=[False, True]).head(100)
    assert len(out) == len(g)
    if len(out):
        np.testing.assert_array_equal(out["o_orderkey"].to_numpy(),
                                      g["o_orderkey"].to_numpy())


def test_q19_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[19]).to_pydict()
    li = f["lineitem"].merge(f["part"], left_on="l_partkey", right_on="p_partkey")
    common = li.l_shipmode.isin(["AIR", "AIR REG"]) & \
        (li.l_shipinstruct == "DELIVER IN PERSON")
    b1 = ((li.p_brand == "Brand#12")
          & li.p_container.isin(["SM CASE", "SM BOX", "SM PACK", "SM PKG"])
          & (li.l_quantity >= 1) & (li.l_quantity <= 11)
          & (li.p_size >= 1) & (li.p_size <= 5))
    b2 = ((li.p_brand == "Brand#23")
          & li.p_container.isin(["MED BAG", "MED BOX", "MED PKG", "MED PACK"])
          & (li.l_quantity >= 10) & (li.l_quantity <= 20)
          & (li.p_size >= 1) & (li.p_size <= 10))
    b3 = ((li.p_brand == "Brand#34")
          & li.p_container.isin(["LG CASE", "LG BOX", "LG PACK", "LG PKG"])
          & (li.l_quantity >= 20) & (li.l_quantity <= 30)
          & (li.p_size >= 1) & (li.p_size <= 15))
    m = common & (b1 | b2 | b3)
    expected = float((li[m].l_extendedprice * (1 - li[m].l_discount)).sum())
    got = out["revenue"][0]
    got = 0.0 if got is None else float(got)
    assert got == pytest.approx(expected, rel=1e-9, abs=1e-9)


def test_q21_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[21]).to_pandas()
    li = f["lineitem"]
    late = li[_dates(li, "l_receiptdate") > _dates(li, "l_commitdate")]
    # orders with >1 distinct supplier
    multi = li.groupby("l_orderkey").l_suppkey.nunique()
    multi = set(multi[multi > 1].index)
    # orders where ONLY one supplier was late
    late_supp = late.groupby("l_orderkey").l_suppkey.nunique()
    single_late = set(late_supp[late_supp == 1].index)
    ordf = f["orders"][f["orders"].o_orderstatus == "F"]
    j = late.merge(ordf, left_on="l_orderkey", right_on="o_orderkey") \
        .merge(f["supplier"], left_on="l_suppkey", right_on="s_suppkey") \
        .merge(f["nation"], left_on="s_nationkey", right_on="n_nationkey")
    j = j[(j.n_name == "SAUDI ARABIA")
          & j.l_orderkey.isin(multi) & j.l_orderkey.isin(single_late)]
    g = j.groupby("s_name", as_index=False).agg(numwait=("l_orderkey", "size")) \
        .sort_values(["numwait", "s_name"], ascending=[False, True]).head(100)
    assert len(out) == len(g)
    if len(out):
        np.testing.assert_array_equal(out["s_name"].to_numpy(),
                                      g["s_name"].to_numpy())
        np.testing.assert_array_equal(out["numwait"].to_numpy(),
                                      g["numwait"].to_numpy())


def test_q2_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[2]).to_pandas()
    eu = f["nation"].merge(f["region"], left_on="n_regionkey",
                           right_on="r_regionkey")
    eu = eu[eu.r_name == "EUROPE"]
    sup = f["supplier"].merge(eu, left_on="s_nationkey",
                              right_on="n_nationkey")
    ps = f["partsupp"].merge(sup, left_on="ps_suppkey", right_on="s_suppkey")
    mincost = ps.groupby("ps_partkey").ps_supplycost.min()
    pt = f["part"]
    pt = pt[(pt.p_size == 15) & pt.p_type.str.endswith("BRASS")]
    j = ps.merge(pt, left_on="ps_partkey", right_on="p_partkey")
    j = j[j.ps_supplycost == j.ps_partkey.map(mincost)]
    g = j.sort_values(["s_acctbal", "n_name", "s_name", "p_partkey"],
                      ascending=[False, True, True, True]).head(100)
    assert len(out) == len(g)
    if len(out):
        np.testing.assert_array_equal(out["p_partkey"].to_numpy(),
                                      g["p_partkey"].to_numpy())
        np.testing.assert_allclose(out["s_acctbal"].astype(float),
                                   g["s_acctbal"].to_numpy(), rtol=1e-9)


def test_q7_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[7]).to_pandas()
    li = f["lineitem"]
    li = li[(_dates(li, "l_shipdate") >= np.datetime64("1995-01-01"))
            & (_dates(li, "l_shipdate") <= np.datetime64("1996-12-31"))]
    j = li.merge(f["supplier"], left_on="l_suppkey", right_on="s_suppkey") \
        .merge(f["orders"], left_on="l_orderkey", right_on="o_orderkey") \
        .merge(f["customer"], left_on="o_custkey", right_on="c_custkey") \
        .merge(f["nation"].rename(columns=lambda c: c + "_1"),
               left_on="s_nationkey", right_on="n_nationkey_1") \
        .merge(f["nation"].rename(columns=lambda c: c + "_2"),
               left_on="c_nationkey", right_on="n_nationkey_2")
    m = ((j.n_name_1 == "FRANCE") & (j.n_name_2 == "GERMANY")) | \
        ((j.n_name_1 == "GERMANY") & (j.n_name_2 == "FRANCE"))
    j = j[m].assign(
        l_year=lambda d: d.l_shipdate.dt.year,
        volume=lambda d: d.l_extendedprice * (1 - d.l_discount))
    g = j.groupby(["n_name_1", "n_name_2", "l_year"], as_index=False) \
        .volume.sum().sort_values(["n_name_1", "n_name_2", "l_year"])
    assert len(out) == len(g)
    if len(out):
        np.testing.assert_array_equal(out["supp_nation"].to_numpy(),
                                      g["n_name_1"].to_numpy())
        np.testing.assert_allclose(out["revenue"].astype(float),
                                   g["volume"].to_numpy(), rtol=1e-9)


def test_q8_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[8]).to_pandas()
    am = f["nation"].merge(f["region"], left_on="n_regionkey",
                           right_on="r_regionkey")
    am = am[am.r_name == "AMERICA"]
    pt = f["part"][f["part"].p_type == "ECONOMY ANODIZED STEEL"]
    od = f["orders"]
    od = od[(_dates(od, "o_orderdate") >= np.datetime64("1995-01-01"))
            & (_dates(od, "o_orderdate") <= np.datetime64("1996-12-31"))]
    j = f["lineitem"].merge(pt, left_on="l_partkey", right_on="p_partkey") \
        .merge(f["supplier"], left_on="l_suppkey", right_on="s_suppkey") \
        .merge(od, left_on="l_orderkey", right_on="o_orderkey") \
        .merge(f["customer"], left_on="o_custkey", right_on="c_custkey") \
        .merge(am[["n_nationkey"]], left_on="c_nationkey",
               right_on="n_nationkey") \
        .merge(f["nation"][["n_nationkey", "n_name"]].rename(
            columns={"n_nationkey": "nk2", "n_name": "nation"}),
            left_on="s_nationkey", right_on="nk2")
    j = j.assign(o_year=lambda d: d.o_orderdate.dt.year,
                 volume=lambda d: d.l_extendedprice * (1 - d.l_discount))
    g = j.groupby("o_year").apply(
        lambda d: (d.volume * (d.nation == "BRAZIL")).sum() / d.volume.sum()
        if d.volume.sum() else 0.0, include_groups=False).sort_index()
    assert len(out) == len(g)
    if len(out):
        np.testing.assert_allclose(out["mkt_share"].astype(float),
                                   g.to_numpy(), rtol=1e-9)


def test_q9_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[9]).to_pandas()
    pt = f["part"][f["part"].p_name.str.contains("green")]
    j = f["lineitem"].merge(pt, left_on="l_partkey", right_on="p_partkey") \
        .merge(f["supplier"], left_on="l_suppkey", right_on="s_suppkey") \
        .merge(f["partsupp"], left_on=["l_partkey", "l_suppkey"],
               right_on=["ps_partkey", "ps_suppkey"]) \
        .merge(f["orders"], left_on="l_orderkey", right_on="o_orderkey") \
        .merge(f["nation"], left_on="s_nationkey", right_on="n_nationkey")
    j = j.assign(o_year=lambda d: d.o_orderdate.dt.year,
                 amount=lambda d: d.l_extendedprice * (1 - d.l_discount)
                 - d.ps_supplycost * d.l_quantity)
    g = j.groupby(["n_name", "o_year"], as_index=False).amount.sum() \
        .sort_values(["n_name", "o_year"], ascending=[True, False])
    assert len(out) == len(g)
    if len(out):
        np.testing.assert_array_equal(out["nation"].to_numpy(),
                                      g["n_name"].to_numpy())
        np.testing.assert_allclose(out["sum_profit"].astype(float),
                                   g["amount"].to_numpy(), rtol=1e-9)


def test_q10_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[10]).to_pandas()
    od = f["orders"]
    od = od[(_dates(od, "o_orderdate") >= np.datetime64("1993-10-01"))
            & (_dates(od, "o_orderdate") < np.datetime64("1994-01-01"))]
    li = f["lineitem"][f["lineitem"].l_returnflag == "R"]
    j = f["customer"].merge(od, left_on="c_custkey", right_on="o_custkey") \
        .merge(li, left_on="o_orderkey", right_on="l_orderkey") \
        .merge(f["nation"], left_on="c_nationkey", right_on="n_nationkey")
    j = j.assign(rev=lambda d: d.l_extendedprice * (1 - d.l_discount))
    g = j.groupby(["c_custkey", "c_name", "c_acctbal", "c_phone", "n_name",
                   "c_address", "c_comment"], as_index=False).rev.sum() \
        .sort_values("rev", ascending=False).head(20)
    assert len(out) == len(g)
    if len(out):
        np.testing.assert_allclose(out["revenue"].astype(float),
                                   g["rev"].to_numpy(), rtol=1e-9)


def test_q11_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[11]).to_pandas()
    de = f["nation"][f["nation"].n_name == "GERMANY"]
    sup = f["supplier"].merge(de, left_on="s_nationkey",
                              right_on="n_nationkey")
    ps = f["partsupp"].merge(sup, left_on="ps_suppkey", right_on="s_suppkey")
    ps = ps.assign(value=lambda d: d.ps_supplycost * d.ps_availqty)
    g = ps.groupby("ps_partkey", as_index=False).value.sum()
    thr = ps.value.sum() * 0.0001
    g = g[g.value > thr].sort_values("value", ascending=False)
    assert len(out) == len(g)
    if len(out):
        np.testing.assert_array_equal(out["ps_partkey"].to_numpy(),
                                      g["ps_partkey"].to_numpy())
        np.testing.assert_allclose(out["value"].astype(float),
                                   g["value"].to_numpy(), rtol=1e-9)


def test_q13_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[13]).to_pandas()
    od = f["orders"]
    od = od[~od.o_comment.str.contains("special.*requests", regex=True)]
    cnt = od.groupby("o_custkey").o_orderkey.size()
    c_count = f["customer"].c_custkey.map(cnt).fillna(0).astype(int)
    g = c_count.value_counts().reset_index()
    g.columns = ["c_count", "custdist"]
    g = g.sort_values(["custdist", "c_count"],
                      ascending=[False, False]).reset_index(drop=True)
    assert len(out) == len(g)
    np.testing.assert_array_equal(out["c_count"].to_numpy().astype(int),
                                  g["c_count"].to_numpy())
    np.testing.assert_array_equal(out["custdist"].to_numpy().astype(int),
                                  g["custdist"].to_numpy())


def test_q15_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[15]).to_pandas()
    li = f["lineitem"]
    li = li[(_dates(li, "l_shipdate") >= np.datetime64("1996-01-01"))
            & (_dates(li, "l_shipdate") < np.datetime64("1996-04-01"))]
    rev = (li.l_extendedprice * (1 - li.l_discount)) \
        .groupby(li.l_suppkey).sum()
    top = rev[rev == rev.max()]
    g = f["supplier"][f["supplier"].s_suppkey.isin(top.index)] \
        .sort_values("s_suppkey")
    assert len(out) == len(g)
    if len(out):
        np.testing.assert_array_equal(out["s_suppkey"].to_numpy(),
                                      g["s_suppkey"].to_numpy())


def test_q16_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[16]).to_pandas()
    bad = f["supplier"][f["supplier"].s_comment.str.contains(
        "Customer.*Complaints", regex=True)].s_suppkey
    pt = f["part"]
    pt = pt[(pt.p_brand != "Brand#45")
            & ~pt.p_type.str.startswith("MEDIUM POLISHED")
            & pt.p_size.isin([49, 14, 23, 45, 19, 3, 36, 9])]
    j = f["partsupp"].merge(pt, left_on="ps_partkey", right_on="p_partkey")
    j = j[~j.ps_suppkey.isin(set(bad))]
    g = j.groupby(["p_brand", "p_type", "p_size"], as_index=False) \
        .ps_suppkey.nunique().rename(columns={"ps_suppkey": "supplier_cnt"}) \
        .sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"],
                     ascending=[False, True, True, True])
    assert len(out) == len(g)
    if len(out):
        np.testing.assert_array_equal(
            out["supplier_cnt"].to_numpy().astype(int),
            g["supplier_cnt"].to_numpy())


def test_q17_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[17]).to_pydict()
    pt = f["part"]
    pt = pt[(pt.p_brand == "Brand#23") & (pt.p_container == "MED BOX")]
    li = f["lineitem"]
    avg_q = li.groupby("l_partkey").l_quantity.mean()
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    j = j[j.l_quantity < 0.2 * j.l_partkey.map(avg_q)]
    expected = float(j.l_extendedprice.sum()) / 7.0
    got = out["avg_yearly"][0]
    got = 0.0 if got is None else float(got)
    assert got == pytest.approx(expected, rel=1e-9, abs=1e-9)


def test_q20_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[20]).to_pandas()
    forest = f["part"][f["part"].p_name.str.startswith("forest")].p_partkey
    li = f["lineitem"]
    li = li[(_dates(li, "l_shipdate") >= np.datetime64("1994-01-01"))
            & (_dates(li, "l_shipdate") < np.datetime64("1995-01-01"))]
    qty = li.groupby(["l_partkey", "l_suppkey"]).l_quantity.sum()
    ps = f["partsupp"][f["partsupp"].ps_partkey.isin(set(forest))].copy()
    key = list(zip(ps.ps_partkey, ps.ps_suppkey))
    ps["half"] = [0.5 * qty.get(k, np.nan) for k in key]
    ps = ps[ps.ps_availqty > ps.half]   # NaN compares False, like SQL NULL
    sup = f["supplier"].merge(
        f["nation"][f["nation"].n_name == "CANADA"],
        left_on="s_nationkey", right_on="n_nationkey")
    g = sup[sup.s_suppkey.isin(set(ps.ps_suppkey))].sort_values("s_name")
    assert len(out) == len(g)
    if len(out):
        np.testing.assert_array_equal(out["s_name"].to_numpy(),
                                      g["s_name"].to_numpy())


def test_q22_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[22]).to_pandas()
    cu = f["customer"].copy()
    cu["cntrycode"] = cu.c_phone.str[:2]
    codes = ["13", "31", "23", "29", "30", "18", "17"]
    cu = cu[cu.cntrycode.isin(codes)]
    avg_bal = cu[cu.c_acctbal > 0.0].c_acctbal.mean()
    has_orders = set(f["orders"].o_custkey)
    cu = cu[(cu.c_acctbal > avg_bal) & ~cu.c_custkey.isin(has_orders)]
    g = cu.groupby("cntrycode", as_index=False).agg(
        numcust=("c_acctbal", "size"), totacctbal=("c_acctbal", "sum")) \
        .sort_values("cntrycode")
    assert len(out) == len(g)
    if len(out):
        np.testing.assert_array_equal(out["cntrycode"].to_numpy(),
                                      g["cntrycode"].to_numpy())
        np.testing.assert_array_equal(out["numcust"].to_numpy().astype(int),
                                      g["numcust"].to_numpy())
        np.testing.assert_allclose(out["totacctbal"].astype(float),
                                   g["totacctbal"].to_numpy(), rtol=1e-9)
