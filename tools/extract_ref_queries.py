#!/usr/bin/env python3
"""Regenerate src/test/resources/ref_query_corpus.json from the reference.

Extraction recipe (deterministic): every Go backtick raw-string literal in
/root/reference/query/*_test.go (sorted filename order, first-occurrence
dedup) that contains both `func:` and `{` — i.e. every DQL query document
the reference's own query-package tests run. Yields 765 queries.

Usage: python3 tools/extract_ref_queries.py [ref_query_dir] [out.json]
"""
import glob
import json
import re
import sys

ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/query"
out = (sys.argv[2] if len(sys.argv) > 2
       else "src/test/resources/ref_query_corpus.json")

queries, seen = [], set()
for f in sorted(glob.glob(ref + "/*_test.go")):
    src = open(f).read()
    for m in re.finditer(r"`([^`]*)`", src):
        t = m.group(1)
        if "func:" in t and "{" in t and t not in seen:
            seen.add(t)
            queries.append(t)

with open(out, "w") as fh:
    json.dump(queries, fh, indent=0)
print(f"wrote {len(queries)} queries to {out}")
