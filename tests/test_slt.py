"""sqllogictest corpus runner (reference: datafusion/sqllogictest)."""
import glob
import os

import pytest

from datafusion_tpu.slt import run_slt_file

SLT_DIR = os.path.join(os.path.dirname(__file__), "slt")
FILES = sorted(glob.glob(os.path.join(SLT_DIR, "*.slt")))
# files ported from the reference corpus (see tests/slt/ref/PORT.md):
# expected results are the reference engine's output = differential oracle
REF_FILES = sorted(glob.glob(os.path.join(SLT_DIR, "ref", "*.slt")))


@pytest.mark.parametrize("path", FILES, ids=[os.path.basename(f) for f in FILES])
def test_slt_file(path):
    checked = run_slt_file(path)
    assert checked > 0


@pytest.mark.parametrize("path", REF_FILES,
                         ids=[os.path.basename(f) for f in REF_FILES])
def test_ref_slt_file(path):
    checked = run_slt_file(path, lenient_errors=True)
    assert checked > 0
