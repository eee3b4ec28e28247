#!/usr/bin/env python3
"""Merge recorded exec result hashes into the committed sweep ledger.

Usage:
  GRAFT_SWEEP_RECORD=1 sbt "testOnly graft.CorpusSweepSpec"   # writes
      target/ref_corpus_ledger_observed.json
  python3 tools/merge_ledger_hashes.py                        # merges rh

Only the `rh` field moves; outcomes, adjudications, and pinned error
messages in the committed ledger stay authoritative. Refuses to merge if
an observed outcome disagrees with the ledger (re-adjudicate first).
"""
import json
import sys

LEDGER = "src/test/resources/ref_corpus_ledger.json"
OBSERVED = "target/ref_corpus_ledger_observed.json"


def main():
    with open(LEDGER) as f:
        ledger = json.load(f)
    with open(OBSERVED) as f:
        observed = json.load(f)
    obs = {o["h"]: o for o in observed}
    drift, merged = [], 0
    for entry in ledger:
        o = obs.get(entry["h"])
        if o is None:
            drift.append(f"{entry['h']}: not observed")
            continue
        if o["outcome"] != entry["outcome"]:
            drift.append(
                f"{entry['h']}: ledger={entry['outcome']} observed={o['outcome']}")
            continue
        if entry["outcome"] == "exec" and o.get("rh"):
            entry["rh"] = o["rh"]
            merged += 1
    if drift:
        print("OUTCOME DRIFT — re-adjudicate before merging hashes:")
        print("\n".join(drift[:20]))
        sys.exit(1)
    with open(LEDGER, "w") as f:
        json.dump(ledger, f, indent=1)
        f.write("\n")
    print(f"merged rh into {merged} exec entries of {len(ledger)}")


if __name__ == "__main__":
    main()
