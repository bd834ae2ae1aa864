"""Native C kernels: correctness vs the Python fallbacks."""
import numpy as np
import pytest

from datafusion_tpu.native import fnv1a64_bulk, get, like_bulk
from datafusion_tpu.physical.hashing import _fnv1a64


@pytest.mark.skipif(get() is None, reason="C compiler unavailable")
def test_fnv_matches_python():
    vals = ["", "a", "hello world", "ünïcode", "x" * 1000]
    got = fnv1a64_bulk(vals)
    exp = [_fnv1a64(v.encode()) for v in vals]
    assert got.tolist() == exp


@pytest.mark.skipif(get() is None, reason="C compiler unavailable")
def test_like_matches_python():
    import re
    from datafusion_tpu.physical.kernels import like_pattern_to_regex
    vals = ["apple pie", "Banana", "cherry", "", "a_b%c", "aXbYc"]
    for pat in ["%an%", "a%", "%c", "a_b%", "%", "_", "a%c", "%pie"]:
        for ci in (False, True):
            got = like_bulk(vals, pat, ci)
            flags = re.DOTALL | (re.IGNORECASE if ci else 0)
            rx = re.compile(like_pattern_to_regex(pat), flags)
            exp = [rx.match(v) is not None for v in vals]
            assert got.tolist() == exp, (pat, ci)


def test_like_through_sql(ctx):
    ctx.register_arrays("t", {"s": np.array(
        ["alpha", "beta", "ALPHA", "alphabet", "x"])})
    out = ctx.sql("SELECT count(*) c FROM t WHERE s LIKE 'alpha%'").to_pydict()
    assert out["c"] == [2]
    out = ctx.sql("SELECT count(*) c FROM t WHERE s ILIKE 'alpha%'").to_pydict()
    assert out["c"] == [3]
