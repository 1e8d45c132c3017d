#!/usr/bin/env python3
"""Split a concatenated `sbt "runMain graft.tools.Explain q1" ...` log into
per-query plan files.

Usage: split_explains.py <log> <outdir> <suffix>
Writes <outdir>/<query>_<suffix>.txt for each query seen in the log.
"""
import re
import sys

log, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
text = open(log, errors="replace").read()
# sbt prints: [info] running (fork) graft.tools.Explain <name> [args...]
parts = re.split(r"\[info\] running \(fork\) graft\.tools\.Explain (\S+)", text)
# parts = [preamble, name1, body1, name2, body2, ...]
for i in range(1, len(parts), 2):
    name, body = parts[i], parts[i + 1]
    m = re.search(r"== Physical Plan ==.*?(?=\n\[(?:info|success|error)\]|\Z)",
                  body, re.S)
    if not m:
        print(f"WARN: no physical plan found for {name}", file=sys.stderr)
        continue
    out = f"{outdir}/{name}_{suffix}.txt"
    with open(out, "w") as f:
        f.write(m.group(0).rstrip() + "\n")
    print(f"wrote {out}")
