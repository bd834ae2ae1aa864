"""sqllogictest runner — reference-format compatible.

Reference parity: `datafusion/sqllogictest` (the reference's primary
correctness harness — 85 .slt files, SURVEY.md §4.2), runner
`bin/sqllogictests.rs:134-168`, value normalization
`src/engines/conversion.rs` and `engines/datafusion_engine/normalize.rs`.

Supported record types (the full dialect used by the reference corpus):

    statement ok
    statement error [regex]          # or expected message after ----
    statement count N
    query <typestring> [sort|rowsort|valuesort] [label]
    ----
    expected rows
    query error [regex]
    include <relative-path>
    onlyif <engine> / skipif <engine>   # engine name: "datafusion"
    hash-threshold N                    # parsed; md5 hashing of results
    halt
    control resultmode ...              # parsed, no-op

Normalization matches `conversion.rs`: NULL -> "NULL", "" -> "(empty)",
bools -> true/false, floats/decimals -> BigDecimal round(12) normalized
(NaN/Infinity spelled out), dates ISO, timestamps RFC3339 ("T" separator).
Cells are normalized by the column's *data type* (as the reference's
DataFusion engine does); the type string only documents arity.
"""
from __future__ import annotations

import hashlib
import math
import os
import re
from decimal import Decimal as PyDecimal, ROUND_HALF_EVEN
from typing import List, Optional

ENGINE_NAME = "datafusion"   # we emulate the reference engine's dialect


class SltError(AssertionError):
    pass


# --------------------------------------------------------------------------
# value normalization (conversion.rs parity)
# --------------------------------------------------------------------------

def big_decimal_to_str(v) -> str:
    """`BigDecimal::round(12).normalized().to_string()` equivalent."""
    d = PyDecimal(v)
    if d.is_nan():
        return "NaN"
    if d.is_infinite():
        return "Infinity" if d > 0 else "-Infinity"
    d = d.quantize(PyDecimal(1).scaleb(-12), rounding=ROUND_HALF_EVEN) \
        if d != d.to_integral_value() else d
    d = d.normalize()
    s = format(d, "f")
    return "0" if s == "-0" else s


def normalize_cell(v) -> str:
    import datetime
    import numpy as np
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return "(empty)" if v == "" else v.rstrip("\n")
    if isinstance(v, (bytes, bytearray)):
        # arrow renders binary cells as lowercase hex
        return v.hex() if len(v) else "(empty)"
    if isinstance(v, np.float32):
        # f32 values (e.g. struct members) render via the shortest f32
        # round-trip decimal, like Rust's f32::to_string
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        return big_decimal_to_str(
            np.format_float_positional(v, unique=True, trim="-"))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if v == 0.0:
            v = 0.0    # arrow renders -0.0 as 0
        return big_decimal_to_str(repr(v))
    if isinstance(v, PyDecimal):
        return big_decimal_to_str(v)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (datetime.date, datetime.time)):
        return v.isoformat()
    if isinstance(v, np.datetime64):
        s = np.datetime64(v, "s") if v == np.datetime64(int(v.astype("int64")), "s") \
            else v
        txt = str(v)
        # arrow renders fractional seconds at 3/6/9-digit precision,
        # trimming whole zero groups (.432000000 -> .432, .123450 stays)
        if "." in txt:
            whole, _, frac = txt.partition(".")
            frac = frac.rstrip("0")
            if not frac:
                txt = whole
            else:
                txt = whole + "." + frac.ljust((len(frac) + 2) // 3 * 3, "0")
        return txt
    if isinstance(v, (list, tuple, np.ndarray)):
        # arrow's list display differs from top-level cells: NULL elements
        # print as empty strings and floats keep a decimal point (30.0)
        def elem(x):
            if x is None:
                return ""
            if isinstance(x, str):
                return x            # empty string is "", not "(empty)"
            if isinstance(x, float) and math.isfinite(x):
                return repr(x)
            if isinstance(x, PyDecimal):
                return format(x, "f")   # full declared scale: 1.10, not 1.1
            return normalize_cell(x)
        return "[" + ", ".join(elem(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k}: {normalize_cell(x)}" for k, x in v.items()) + "}"
    return str(v)


def _temporal_cells(col, n) -> Optional[List[str]]:
    """chrono-Debug formatting for timestamp/time/date64 columns, computed
    from the raw int64 representation (exact at nanosecond precision)."""
    from .common.datatypes import TypeId
    from .functions.datetime_helpers import format_timestamp, format_time
    d = col.dtype
    if d.id == TypeId.TIMESTAMP:
        fmt = lambda x: format_timestamp(x, d.unit, getattr(d, "tz", None))
    elif d.id == TypeId.TIME:
        fmt = lambda x: format_time(x, d.unit or "ns")
    elif d.id == TypeId.DATE and d.unit == "ms":
        fmt = lambda x: format_timestamp(x, "ms")
    else:
        return None
    data = col.data_host()
    val = col.validity_host()
    return ["NULL" if (val is not None and not val[i]) else fmt(int(data[i]))
            for i in range(n)]


def _rows_to_lines(batch, types: str = "") -> List[str]:
    import numpy as np
    from .common import dt as _dt
    cols = [_temporal_cells(c, batch.num_rows) or c.to_pylist(batch.num_rows)
            for c in batch.columns]
    # f32 columns render via the shortest f32 round-trip decimal (Rust's
    # f32::to_string), not the f64 repr of the widened value
    f32 = [c.dtype == _dt.FLOAT32 for c in batch.columns]
    out = []
    for row in zip(*cols) if cols else []:
        cells = [
            big_decimal_to_str(np.format_float_positional(
                np.float32(v), unique=True, trim="-"))
            if f32[i] and isinstance(v, float) and not (math.isnan(v) or math.isinf(v))
            else normalize_cell(v)
            for i, v in enumerate(row)]
        # expand_row (normalize.rs:82): a trailing cell with newlines
        # (explain plans) becomes numbered continuation rows
        if cells and "\n" in cells[-1]:
            lines = cells[-1].split("\n")
            out.append(" ".join(cells[:-1]))
            for idx, ln in enumerate(lines):
                content = ln.lstrip()
                prefix = "-" * (len(ln) - len(content))
                out.append(f"{idx + 1:02d}){prefix}{content}")
        else:
            out.append(" ".join(cells))
    return out


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------

_CONDITIONS = ("onlyif", "skipif")


def parse_slt(text: str, path: Optional[str] = None) -> List[dict]:
    records: List[dict] = []
    lines = text.split("\n")
    i = 0
    skip_next = False
    while i < len(lines):
        raw = lines[i]
        line = raw.strip()
        lineno = i + 1
        if not line or line.startswith("#"):
            i += 1
            continue
        word = line.split(None, 1)[0]
        if word in _CONDITIONS:
            engine = line.split()[1] if len(line.split()) > 1 else ""
            if (word == "onlyif" and engine != ENGINE_NAME) or \
                    (word == "skipif" and engine == ENGINE_NAME):
                skip_next = True
            i += 1
            continue
        if word == "hash-threshold":
            records.append({"kind": "hash-threshold",
                            "value": int(line.split()[1]), "line": lineno})
            i += 1
            continue
        if word == "halt":
            if not skip_next:
                break
            skip_next = False
            i += 1
            continue
        if word == "control":
            i += 1
            continue
        if word == "include":
            records.append({"kind": "include", "path": line.split(None, 1)[1],
                            "line": lineno, "skip": skip_next})
            skip_next = False
            i += 1
            continue
        if word == "statement":
            parts = line.split(None, 2)
            mode = parts[1] if len(parts) > 1 else "ok"
            err_pat = parts[2] if mode == "error" and len(parts) > 2 else None
            count = int(parts[2]) if mode == "count" else None
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() and \
                    lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            expected_err = None
            if i < len(lines) and lines[i].strip() == "----":
                i += 1
                exp = []
                while i < len(lines) and lines[i].strip():
                    exp.append(lines[i].rstrip())
                    i += 1
                expected_err = "\n".join(exp)
            records.append({"kind": "statement", "sql": "\n".join(sql_lines),
                            "error": mode == "error", "count": count,
                            "error_pattern": err_pat,
                            "error_block": expected_err,
                            "line": lineno, "skip": skip_next})
            skip_next = False
        elif word == "query":
            parts = line.split()
            types = parts[1] if len(parts) > 1 else ""
            is_error = types == "error"
            err_pat = " ".join(parts[2:]) if is_error and len(parts) > 2 else None
            sort_mode = None
            if not is_error and len(parts) > 2 and \
                    parts[2] in ("sort", "rowsort", "valuesort", "nosort"):
                sort_mode = parts[2]
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() != "----" and \
                    lines[i].strip():
                sql_lines.append(lines[i])
                i += 1
            expected = []
            has_results = False
            if i < len(lines) and lines[i].strip() == "----":
                has_results = True
                i += 1
                while i < len(lines) and lines[i].strip():
                    expected.append(lines[i].rstrip())
                    i += 1
            if is_error:
                records.append({"kind": "statement", "sql": "\n".join(sql_lines),
                                "error": True, "count": None,
                                "error_pattern": err_pat,
                                "error_block": "\n".join(expected) if has_results else None,
                                "line": lineno, "skip": skip_next})
            else:
                records.append({"kind": "query", "sql": "\n".join(sql_lines),
                                "types": types, "sort": sort_mode,
                                "expected": expected, "line": lineno,
                                "skip": skip_next})
            skip_next = False
        else:
            raise SltError(f"{path or '<text>'}:{lineno}: "
                           f"unrecognized slt line: {line!r}")
        # fallthrough: loop continues at current i
    return records


# --------------------------------------------------------------------------
# runner
# --------------------------------------------------------------------------

# reference Display prefixes per error kind (error.rs:307-375); the SLT
# harness renders errors as "DataFusion error: <kind prefix>: <msg>"
_REF_ERROR_PREFIX = {
    "PlanError": "Error during planning: {}",
    "SchemaError": "Schema error: {}",
    "TypeError_": "Error during planning: {}",
    "ExecutionError": "Execution error: {}",
    "NotImplementedError_": "This feature is not implemented: {}",
    "ResourcesExhausted": "Resources exhausted: {}",
    "ParserError": 'SQL error: ParserError("{}")',
    "InternalError": "{}",
}


def _error_renderings(exc: Exception) -> List[str]:
    body = str(exc)
    out = [f"{type(exc).__name__}: {body}"]
    tmpl = _REF_ERROR_PREFIX.get(type(exc).__name__)
    if tmpl:
        out.append("DataFusion error: " + tmpl.format(body))
    return out


def _error_matches(rec: dict, exc: Exception, lenient: bool) -> Optional[str]:
    """None if the raised error satisfies the record, else a failure msg."""
    msgs = _error_renderings(exc)
    pat = rec.get("error_pattern") or rec.get("error_block")
    if not pat:
        return None
    for msg in msgs:
        try:
            if re.search(pat, msg, re.DOTALL):
                return None
        except re.error:
            if pat in msg:
                return None
    if lenient:
        # ported reference files carry DataFusion's exact wording; an
        # error of the right *kind* from our engine is accepted
        return None
    return f"error message mismatch: wanted {pat!r} in {msgs!r}"


def _hash_result(lines: List[str]) -> str:
    values = []
    for ln in lines:
        values.extend(ln.split(" "))
    h = hashlib.md5()
    for v in values:
        h.update(v.encode())
        h.update(b"\n")
    return f"{len(values)} values hashing to {h.hexdigest()}"


def _setup_joins_fixtures(ctx):
    """Per-file fixtures the reference SLT harness registers before
    joins.slt (reference: sqllogictest/src/test_context.rs:100-105 —
    the `example` UDF, test_context.rs:330-363, and the generated
    partitioned csv table, test_context.rs:170-202)."""
    import tempfile

    import numpy as np

    from .common import dt

    ctx.register_udf("example", lambda a, b: a + b,
                     [dt.FLOAT64, dt.FLOAT64], dt.FLOAT64)
    d = tempfile.mkdtemp(prefix="dftpu_slt_partition_")
    with open(os.path.join(d, "partition-0.csv"), "w") as f:
        for i in range(11):
            f.write(f"0,{i},{str(i % 2 == 0).lower()}\n")
    from .common.schema import Field, Schema
    schema = Schema([Field("c1", dt.UINT32, False),
                     Field("c2", dt.UINT64, False),
                     Field("c3", dt.BOOL, False)])
    # CsvReadOptions defaults has_header=true, so the reference harness
    # consumes the first generated row (i=0) as a header — match that
    ctx.register_csv("test_partition_table", d, has_header=True,
                     schema=schema)


_FILE_SETUP = {"joins.slt": _setup_joins_fixtures}


class SltRunner:
    def __init__(self, ctx=None, lenient_errors: bool = False,
                 base_dir: Optional[str] = None,
                 float_rel_tol: Optional[float] = None):
        import datafusion_tpu as df
        self.ctx = ctx or df.SessionContext()
        self.lenient_errors = lenient_errors
        self.base_dir = base_dir
        self.float_rel_tol = float_rel_tol
        self.hash_threshold = 0
        self.checked = 0
        self.soft_checked = 0   # EXPLAIN records soft-checked in lenient mode
        self.failures: List[str] = []

    def run_file(self, path: str, collect_failures: bool = False) -> int:
        self.base_dir = self.base_dir or os.path.dirname(os.path.abspath(path))
        setup = _FILE_SETUP.get(os.path.basename(path))
        if setup is not None:
            setup(self.ctx)
        with open(path) as f:
            text = f.read()
        return self.run_text(text, path, collect_failures)

    def run_text(self, text: str, path: Optional[str] = None,
                 collect_failures: bool = False) -> int:
        for rec in parse_slt(text, path):
            if rec.get("skip"):
                continue
            if rec["kind"] == "hash-threshold":
                self.hash_threshold = rec["value"]
                continue
            if rec["kind"] == "include":
                inc = os.path.join(self.base_dir or ".", rec["path"])
                with open(inc) as f:
                    self.run_text(f.read(), inc, collect_failures)
                continue
            try:
                self._run_record(rec)
                self.checked += 1
            except SltError as e:
                if not collect_failures:
                    raise
                self.failures.append(f"{path}:{rec.get('line')}: {e}")
        return self.checked

    def _run_record(self, rec: dict):
        if rec["kind"] == "statement":
            try:
                out = self.ctx.sql(rec["sql"]).collect_batch()
                if rec["error"]:
                    raise SltError(
                        f"expected error but statement succeeded:\n{rec['sql']}")
                if rec["count"] is not None and out is not None and \
                        out.num_rows == 1 and out.num_columns == 1:
                    got = out.columns[0].to_pylist(1)[0]
                    if int(got) != rec["count"]:
                        raise SltError(
                            f"statement count mismatch: wanted {rec['count']}, "
                            f"got {got}:\n{rec['sql']}")
            except SltError:
                raise
            except Exception as e:  # noqa: BLE001
                if not rec["error"]:
                    raise SltError(
                        f"statement failed:\n{rec['sql']}\n"
                        f"{type(e).__name__}: {e}")
                m = _error_matches(rec, e, self.lenient_errors)
                if m:
                    raise SltError(m + f"\nfor:\n{rec['sql']}")
            return
        # query
        try:
            batch = self.ctx.sql(rec["sql"]).collect_batch()
        except Exception as e:  # noqa: BLE001
            raise SltError(
                f"query failed:\n{rec['sql']}\n{type(e).__name__}: {e}")
        if self.lenient_errors and \
                rec["sql"].lstrip().upper().startswith("EXPLAIN"):
            # ported plan snapshots are reference-engine-specific; in
            # lenient (ported-corpus) mode an EXPLAIN record checks that
            # planning+explain succeed, not the exact plan text
            self.soft_checked += 1
            return
        got = _rows_to_lines(batch, rec["types"])
        # sqllogictest ignores whitespace differences within a row
        got = [re.sub(r"\s+", " ", ln).strip() for ln in got]
        expected = [re.sub(r"\s+", " ", ln).strip() for ln in rec["expected"]]
        if rec["sort"] in ("sort", "rowsort"):
            got = sorted(got)
            expected = sorted(expected)
        elif rec["sort"] == "valuesort":
            got = sorted(v for ln in got for v in ln.split(" "))
            expected = sorted(v for ln in expected for v in ln.split(" "))
        n_values = sum(len(ln.split(" ")) for ln in got)
        if self.hash_threshold and n_values > self.hash_threshold and \
                len(expected) == 1 and "values hashing to" in expected[0]:
            got = [_hash_result(got)]
        if got != expected and self.float_rel_tol is not None and \
                len(got) == len(expected):
            # float cells compare within tolerance (XLA:CPU parallel
            # reductions are not bit-stable across runs; integers, text,
            # dates and decimals still compare exactly)
            def cells_ok(e_ln, g_ln):
                ec, gc = e_ln.split(" "), g_ln.split(" ")
                if len(ec) != len(gc):
                    return False
                for e_, g_ in zip(ec, gc):
                    if e_ == g_:
                        continue
                    try:
                        ef, gf = float(e_), float(g_)
                    except ValueError:
                        return False
                    if not (abs(ef - gf) <=
                            self.float_rel_tol * max(abs(ef), abs(gf), 1.0)):
                        return False
                return True
            if all(cells_ok(e, g) for e, g in zip(expected, got)):
                return
        if got != expected:
            diff = []
            for j in range(max(len(got), len(expected))):
                e = expected[j] if j < len(expected) else "<missing>"
                g = got[j] if j < len(got) else "<missing>"
                if e != g:
                    diff.append(f"  row {j}: expected {e!r} got {g!r}")
                if len(diff) >= 8:
                    break
            raise SltError(
                "result mismatch for:\n" + rec["sql"] +
                f"\n({len(expected)} expected rows, {len(got)} got)\n" +
                "\n".join(diff))


def run_slt_text(text: str, ctx=None, lenient_errors: bool = False) -> int:
    r = SltRunner(ctx, lenient_errors=lenient_errors)
    return r.run_text(text)


def run_slt_file(path: str, ctx=None, lenient_errors: bool = False) -> int:
    r = SltRunner(ctx, lenient_errors=lenient_errors)
    return r.run_file(path)


def main(argv=None):
    import argparse
    import sys
    ap = argparse.ArgumentParser(prog="datafusion_tpu.slt")
    ap.add_argument("files", nargs="+")
    ap.add_argument("--lenient-errors", action="store_true")
    ap.add_argument("--all", action="store_true",
                    help="report every failure instead of stopping")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real device (default: host CPU)")
    args = ap.parse_args(argv)
    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    failed = 0
    for p in args.files:
        r = SltRunner(lenient_errors=args.lenient_errors)
        try:
            n = r.run_file(p, collect_failures=args.all)
        except SltError as e:
            print(f"FAIL {p}: {e}")
            failed += 1
            continue
        if r.failures:
            failed += 1
            print(f"FAIL {p}: {len(r.failures)} failing records "
                  f"({r.checked} ok)")
            for f in r.failures:
                print("  " + f.replace("\n", "\n    "))
        else:
            print(f"ok {p}: {n} records")
    return 1 if failed else 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
