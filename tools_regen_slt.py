"""Regenerate expected outputs of a ported .slt file with THIS engine.

Used for plan-pinning files (explain.slt) whose reference expectations
are engine-specific plan text: the queries stay the reference's, the
expected blocks become OUR plans — a plan-regression surface, exactly
like tests/slt/tpch (see PORT.md).

Run: JAX_PLATFORMS=cpu python tools_regen_slt.py tests/slt/ref/wip/explain.slt tests/slt/ref/explain.slt
"""
import re
import sys

import datafusion_tpu as df
from datafusion_tpu.slt import _rows_to_lines, parse_slt


def main():
    src, dst = sys.argv[1], sys.argv[2]
    text = open(src).read()
    recs = parse_slt(text, src)
    ctx = df.SessionContext()
    out = ["# Ported from the reference corpus (see PORT.md). Source:",
           "# datafusion/sqllogictest/test_files/explain.slt",
           "# Expected plans REGENERATED against this engine (the",
           "# reference's plan text is engine-specific); queries are the",
           "# reference's. Regenerate: python tools_regen_slt.py", ""]
    n_ok = n_skip = 0
    for rec in recs:
        sql = rec["sql"].strip()
        if rec["kind"] == "statement":
            try:
                ctx.sql(sql).collect_batch()
                out += ["statement ok", sql, ""]
                n_ok += 1
            except Exception as e:  # noqa: BLE001
                if rec.get("error"):
                    out += ["statement error", sql, ""]
                    n_ok += 1
                else:
                    out += [f"# PORT-SKIP(unsupported statement: "
                            f"{type(e).__name__}):"]
                    out += ["# " + ln for ln in sql.splitlines()] + [""]
                    n_skip += 1
            continue
        try:
            batch = ctx.sql(sql).collect_batch()
            types = rec.get("types") or "T" * len(batch.columns)
            if len(types) != len(batch.columns):
                types = "T" * len(batch.columns)
            lines = _rows_to_lines(batch, types)
            out += [f"query {types}", sql, "----"]
            out += [re.sub(r"\s+$", "", ln) for ln in lines] + [""]
            n_ok += 1
        except Exception as e:  # noqa: BLE001
            if rec.get("error"):
                out += ["query error", sql, ""]
                n_ok += 1
            else:
                out += [f"# PORT-SKIP(unsupported: {type(e).__name__}):"]
                out += ["# " + ln for ln in sql.splitlines()] + [""]
                n_skip += 1
    open(dst, "w").write("\n".join(out) + "\n")
    print(f"{dst}: {n_ok} records regenerated, {n_skip} skipped")


if __name__ == "__main__":
    main()
