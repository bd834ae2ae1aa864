"""Mechanical porter: copy a reference slt file, rewriting data LOCATIONs."""
import re, sys, os

REF = "/root/reference/datafusion/sqllogictest/test_files"
OUT = "/root/repo/tests/slt/ref"

def port(name):
    src = os.path.join(REF, name)
    text = open(src).read()
    # strip the 16-line ASF license header comment
    lines = text.split("\n")
    i = 0
    while i < len(lines) and (lines[i].startswith("#") or not lines[i].strip()):
        i += 1
    body = "\n".join(lines[i:])
    # scratch dirs (COPY TO ... then re-read) keep their relative layout
    body = body.replace("test_files/scratch/", "tests/slt/ref/scratch/")
    body = re.sub(r"LOCATION '(?!tests/slt/ref/)[^']*/([^/']+)'",
                  r"LOCATION 'tests/slt/ref/data/\1'", body)
    header = ("# Ported from the reference corpus (see PORT.md). Source:\n"
              f"# datafusion/sqllogictest/test_files/{name}\n\n")
    out = os.path.join(OUT, name)
    open(out, "w").write(header + body)
    print("ported", name, len(body.split(chr(10))), "lines")

for name in sys.argv[1:]:
    port(name)
