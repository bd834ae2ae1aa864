"""sqllogictest-style runner.

Reference parity: `datafusion/sqllogictest` (the reference's primary
correctness harness — 85 .slt files; SURVEY.md §4.2). Supports the core
record types:

    statement ok
    statement error [message substring]
    query <typestring> [sort|rowsort|valuesort]
    ----
    expected rows (space-separated; NULL literal; floats normalized)

Type string letters: I (integer), R (real), T (text), B (bool) — used for
normalization, matching the reference's engines/conversion.rs rules:
reals printed with 12 significant digits, empty strings as (empty).
"""
from __future__ import annotations

import math
import re
from typing import List, Optional, Tuple


class SltError(AssertionError):
    pass


def _normalize_value(v, t: str) -> str:
    if v is None:
        return "NULL"
    if t == "I":
        return str(int(v))
    if t == "R":
        f = float(v)
        if math.isnan(f):
            return "NaN"
        # reference normalizes via BigDecimal/12-digit rounding
        s = f"{f:.12g}"
        return s
    if t == "B":
        return "true" if v else "false"
    s = str(v)
    return "(empty)" if s == "" else s


def _rows_to_lines(batch, types: str) -> List[str]:
    cols = [c.to_pylist(batch.num_rows) for c in batch.columns]
    out = []
    for row in zip(*cols) if cols else []:
        out.append(" ".join(
            _normalize_value(v, types[i] if i < len(types) else "T")
            for i, v in enumerate(row)))
    return out


def parse_slt(text: str) -> List[dict]:
    records = []
    lines = text.split("\n")
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        if line.startswith("statement"):
            parts = line.split(None, 2)
            expect_err = len(parts) > 1 and parts[1] == "error"
            err_sub = parts[2] if expect_err and len(parts) > 2 else None
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip():
                sql_lines.append(lines[i])
                i += 1
            records.append({"kind": "statement", "sql": "\n".join(sql_lines),
                            "error": expect_err, "error_substring": err_sub})
        elif line.startswith("query"):
            parts = line.split()
            types = parts[1] if len(parts) > 1 else ""
            sort_mode = parts[2] if len(parts) > 2 else None
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() != "----" and \
                    lines[i].strip():
                sql_lines.append(lines[i])
                i += 1
            expected = []
            if i < len(lines) and lines[i].strip() == "----":
                i += 1
                while i < len(lines) and lines[i].strip():
                    expected.append(lines[i].rstrip())
                    i += 1
            records.append({"kind": "query", "sql": "\n".join(sql_lines),
                            "types": types, "sort": sort_mode,
                            "expected": expected})
        else:
            raise SltError(f"unrecognized slt line: {line!r}")
    return records


def run_slt_text(text: str, ctx=None) -> int:
    """Run slt records against a fresh (or given) SessionContext; returns
    the number of records checked. Raises SltError on any mismatch."""
    import datafusion_tpu as df
    ctx = ctx or df.SessionContext()
    checked = 0
    for rec in parse_slt(text):
        checked += 1
        if rec["kind"] == "statement":
            try:
                ctx.sql(rec["sql"]).collect_batch()
                if rec["error"]:
                    raise SltError(
                        f"expected error but statement succeeded:\n{rec['sql']}")
            except SltError:
                raise
            except Exception as e:  # noqa: BLE001
                if not rec["error"]:
                    raise SltError(
                        f"statement failed:\n{rec['sql']}\n{type(e).__name__}: {e}")
                if rec["error_substring"] and \
                        rec["error_substring"] not in str(e):
                    raise SltError(
                        f"error message mismatch: wanted "
                        f"{rec['error_substring']!r} in {e}")
            continue
        # query
        try:
            batch = ctx.sql(rec["sql"]).collect_batch()
        except Exception as e:  # noqa: BLE001
            raise SltError(f"query failed:\n{rec['sql']}\n{type(e).__name__}: {e}")
        got = _rows_to_lines(batch, rec["types"])
        expected = rec["expected"]
        if rec["sort"] in ("sort", "rowsort"):
            got = sorted(got)
            expected = sorted(expected)
        elif rec["sort"] == "valuesort":
            got = sorted(" ".join(got).split())
            expected = sorted(" ".join(expected).split())
        if got != expected:
            raise SltError(
                "result mismatch for:\n" + rec["sql"] +
                "\nexpected:\n" + "\n".join(expected) +
                "\ngot:\n" + "\n".join(got))
    return checked


def run_slt_file(path: str, ctx=None) -> int:
    with open(path) as f:
        return run_slt_text(f.read(), ctx)
