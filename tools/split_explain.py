#!/usr/bin/env python3
"""Split an EXPLAIN.md (graft.Explain output) into per-query plan files.

Usage: split_explain.py EXPLAIN.md OUTDIR SUFFIX q1,q2,...
Writes OUTDIR/<query>_<SUFFIX>.txt for each requested query.
"""
import re
import sys
from pathlib import Path


def main() -> None:
    src, outdir, suffix, names = sys.argv[1:5]
    wanted = set(names.split(","))
    text = Path(src).read_text()
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    sections = re.split(r"^## ", text, flags=re.M)[1:]
    written = set()
    for sec in sections:
        name, _, body = sec.partition("\n")
        name = name.strip()
        if name not in wanted:
            continue
        m = re.search(r"```\n(.*?)```", body, re.S)
        if not m:
            continue
        (out / f"{name}_{suffix}.txt").write_text(m.group(1))
        written.add(name)
    missing = wanted - written
    if missing:
        print(f"MISSING: {sorted(missing)}")
        sys.exit(1)
    print(f"wrote {len(written)} files to {outdir}")


if __name__ == "__main__":
    main()
