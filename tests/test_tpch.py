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

SF = 0.002
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
    np.testing.assert_allclose(out["sum_qty"], g["sum_qty"], rtol=1e-9)
    np.testing.assert_allclose(out["sum_disc_price"], g["sum_disc_price"], rtol=1e-9)
    np.testing.assert_allclose(out["sum_charge"], g["sum_charge"], rtol=1e-9)
    np.testing.assert_allclose(out["avg_disc"], g["avg_disc"], rtol=1e-9)
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
    np.testing.assert_allclose(out["revenue"], g["revenue"], rtol=1e-9)


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
    np.testing.assert_allclose(out["revenue"], g["revenue"], rtol=1e-9)


def test_q6_oracle(tpch):
    ctx, f = tpch
    out = ctx.sql(QUERIES[6]).to_pydict()
    li = f["lineitem"]
    sd = _dates(li, "l_shipdate")
    m = ((sd >= np.datetime64("1994-01-01")) & (sd < np.datetime64("1995-01-01"))
         & (li.l_discount >= 0.05) & (li.l_discount <= 0.07)
         & (li.l_quantity < 24))
    expected = float((li[m].l_extendedprice * li[m].l_discount).sum())
    assert out["revenue"][0] == pytest.approx(expected, rel=1e-12)


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
