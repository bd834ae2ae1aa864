"""TPC-H SLT corpus: plan snapshots + pinned results, STRICT mode.

The reference pins TPC-H plans and dbgen answers in
`sqllogictest/test_files/tpch/q*.slt.part`; dbgen is unavailable
offline, so these files pin the engine's answers over its deterministic
generator — every value cross-validated by the pandas oracles in
tests/test_tpch.py. Any plan change or result drift fails here
(regenerate deliberately with tools_gen_tpch_slt.py).
"""
import glob
import os

import pytest

import datafusion_tpu as df
from datafusion_tpu.slt import SltRunner
from datafusion_tpu.tpch import register_tpch

HERE = os.path.join(os.path.dirname(__file__), "slt", "tpch")
FILES = sorted(glob.glob(os.path.join(HERE, "q*.slt")),
               key=lambda p: int(os.path.basename(p)[1:-4]))


@pytest.fixture(scope="module")
def ctx():
    c = df.SessionContext()
    register_tpch(c, sf=0.01, seed=1)
    return c


@pytest.mark.parametrize(
    "path", FILES, ids=[os.path.basename(p) for p in FILES])
def test_tpch_slt(ctx, path):
    # strict (plans + ints/text/dates pinned exactly); float cells within
    # 1e-9 relative — XLA:CPU parallel reductions are not bit-stable
    r = SltRunner(ctx, lenient_errors=False, float_rel_tol=1e-9)
    n = r.run_file(path)
    assert n > 0
