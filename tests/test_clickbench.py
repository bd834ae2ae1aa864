"""ClickBench: all 43 canonical statements execute; spot oracles.

Query text follows /root/reference/benchmarks/queries/clickbench/queries.sql
(1-indexed here: QUERIES[k] is line k of that file).
"""
import numpy as np
import pandas as pd
import pytest

import datafusion_tpu as df
from datafusion_tpu.clickbench import (QUERIES, decode_hits, generate_hits,
                                       register_hits)

N = 50_000


@pytest.fixture(scope="module")
def cb():
    ctx = df.SessionContext()
    register_hits(ctx, n=N, seed=3)
    frame = pd.DataFrame(decode_hits(generate_hits(N, seed=3)))
    return ctx, frame


def test_all_43_present():
    assert sorted(QUERIES) == list(range(1, 44))


@pytest.mark.parametrize("n", sorted(QUERIES))
def test_clickbench_runs(cb, n):
    ctx, _ = cb
    batch = ctx.sql(QUERIES[n]).collect_batch()
    assert batch.num_rows >= 0


def test_cb2_oracle(cb):
    ctx, f = cb
    out = ctx.sql(QUERIES[2]).to_pydict()
    assert out[list(out)[0]] == [int((f.AdvEngineID != 0).sum())]


def test_cb5_distinct_users(cb):
    ctx, f = cb
    out = ctx.sql(QUERIES[5]).to_pydict()
    assert out[list(out)[0]] == [f.UserID.nunique()]


def test_cb13_top_phrases(cb):
    ctx, f = cb
    out = ctx.sql(QUERIES[13]).to_pandas()
    exp = f[f.SearchPhrase != ""].groupby("SearchPhrase").size() \
        .sort_values(ascending=False).head(10)
    np.testing.assert_array_equal(out["c"].to_numpy(), exp.to_numpy())


def test_cb16_heavy_users(cb):
    ctx, f = cb
    out = ctx.sql(QUERIES[16]).to_pandas()
    exp = f.groupby("UserID").size().sort_values(ascending=False).head(10)
    np.testing.assert_array_equal(out.iloc[:, 1].to_numpy(), exp.to_numpy())


def test_cb21_url_like(cb):
    ctx, f = cb
    out = ctx.sql(QUERIES[21]).to_pydict()
    assert out[list(out)[0]] == [int(f.URL.str.contains("google").sum())]


def test_cb23_not_like(cb):
    ctx, f = cb
    out = ctx.sql(QUERIES[23]).to_pandas()
    mask = (f.Title.str.contains("Google")
            & ~f.URL.str.contains(".google.", regex=False)
            & (f.SearchPhrase != ""))
    exp = f[mask].groupby("SearchPhrase").size() \
        .sort_values(ascending=False).head(10)
    np.testing.assert_array_equal(out["c"].to_numpy(), exp.to_numpy())


def test_cb29_referer_domain(cb):
    ctx, f = cb
    out = ctx.sql(QUERIES[29].replace("100000", "100")).to_pandas()
    ref = f[f.Referer != ""].copy()
    ref["k"] = ref.Referer.str.replace(
        r"^https?://(?:www\.)?([^/]+)/.*$", r"\1", regex=True)
    g = ref.groupby("k").agg(l=("Referer", lambda s: s.str.len().mean()),
                             c=("Referer", "size"))
    exp = g[g.c > 100].sort_values("l", ascending=False).head(25)
    # ORDER BY l DESC has no tiebreaker: compare (l, k) pairs re-sorted
    got = sorted(zip(out["l"].round(9), out["k"]))
    want = sorted(zip(exp["l"].round(9), exp.index))
    assert got == want


def test_cb37_range_filter(cb):
    ctx, f = cb
    out = ctx.sql(QUERIES[37]).to_pandas()
    d0 = pd.Timestamp("2013-07-01").value // 10 ** 9 // 86400
    d1 = pd.Timestamp("2013-07-31").value // 10 ** 9 // 86400
    mask = ((f.CounterID == 62) & (f.EventDate >= d0) & (f.EventDate <= d1)
            & (f.DontCountHits == 0) & (f.IsRefresh == 0) & (f.URL != ""))
    exp = f[mask].groupby("URL").size().sort_values(ascending=False).head(10)
    np.testing.assert_array_equal(
        out["pageviews"].to_numpy(), exp.to_numpy())


def test_cb41_in_list(cb):
    ctx, f = cb
    # drop the OFFSET so the small sample still produces rows to check
    out = ctx.sql(QUERIES[41].replace(" OFFSET 100", "")).to_pandas()
    d0 = pd.Timestamp("2013-07-01").value // 10 ** 9 // 86400
    d1 = pd.Timestamp("2013-07-31").value // 10 ** 9 // 86400
    mask = ((f.CounterID == 62) & (f.EventDate >= d0) & (f.EventDate <= d1)
            & (f.IsRefresh == 0) & f.TraficSourceID.isin([-1, 6])
            & (f.RefererHash == 3594120000172545465))
    exp = f[mask].groupby(["URLHash", "EventDate"]).size() \
        .sort_values(ascending=False).head(10)
    np.testing.assert_array_equal(
        out["pageviews"].to_numpy(), exp.to_numpy())


def test_cb43_date_trunc(cb):
    ctx, f = cb
    out = ctx.sql(QUERIES[43].replace(" OFFSET 1000", "")).to_pandas()
    d0 = pd.Timestamp("2013-07-14").value // 10 ** 9 // 86400
    d1 = pd.Timestamp("2013-07-15").value // 10 ** 9 // 86400
    mask = ((f.CounterID == 62) & (f.EventDate >= d0) & (f.EventDate <= d1)
            & (f.IsRefresh == 0) & (f.DontCountHits == 0))
    minute = (f.EventTime[mask] // 60) * 60
    exp = minute.value_counts().sort_index().head(10)
    np.testing.assert_array_equal(out["pageviews"].to_numpy(), exp.to_numpy())
