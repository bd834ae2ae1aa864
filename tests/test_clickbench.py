"""ClickBench query subset: all statements execute; spot oracles."""
import numpy as np
import pandas as pd
import pytest

import datafusion_tpu as df
from datafusion_tpu.clickbench import QUERIES, generate_hits, register_hits

N = 50_000


@pytest.fixture(scope="module")
def cb():
    ctx = df.SessionContext()
    register_hits(ctx, n=N, seed=3)
    frame = pd.DataFrame(generate_hits(N, seed=3))
    return ctx, frame


@pytest.mark.parametrize("n", sorted(QUERIES))
def test_clickbench_runs(cb, n):
    ctx, _ = cb
    batch = ctx.sql(QUERIES[n]).collect_batch()
    assert batch.num_rows >= 0


def test_cb1_oracle(cb):
    ctx, f = cb
    out = ctx.sql(QUERIES[1]).to_pydict()
    assert out[list(out)[0]] == [int((f.AdvEngineID != 0).sum())]


def test_cb4_distinct_users(cb):
    ctx, f = cb
    out = ctx.sql(QUERIES[4]).to_pydict()
    assert out[list(out)[0]] == [f.UserID.nunique()]


def test_cb12_top_phrases(cb):
    ctx, f = cb
    out = ctx.sql(QUERIES[12]).to_pandas()
    exp = f[f.SearchPhrase != ""].groupby("SearchPhrase").size() \
        .sort_values(ascending=False).head(10)
    np.testing.assert_array_equal(out["c"].to_numpy(), exp.to_numpy())


def test_cb15_heavy_users(cb):
    ctx, f = cb
    out = ctx.sql(QUERIES[15]).to_pandas()
    exp = f.groupby("UserID").size().sort_values(ascending=False).head(10)
    np.testing.assert_array_equal(out.iloc[:, 1].to_numpy(), exp.to_numpy())


def test_cb20_url_like(cb):
    ctx, f = cb
    out = ctx.sql(QUERIES[20]).to_pydict()
    assert out[list(out)[0]] == [int(f.URL.str.contains("page42").sum())]
