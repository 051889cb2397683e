#!/usr/bin/env python3
"""Rebuild REHEARSAL_10X.json from a full 10x bench detail file
(BENCH_10X_DETAIL.json) paired with the committed clean sf0.1 close
(BENCH_CLEAN.json). Both sides are 2-rep lower medians from the same
session window, so every ratio is warm/warm like-for-like (the round-13
methodology). Existing per-row notes are preserved."""
import json
import sys


def medians(path):
    d = json.load(open(path))
    return ({k: (v["median"] if isinstance(v, dict) else v)
             for k, v in d["queries"].items()}, d)


def main():
    q10, d10 = medians("BENCH_10X_DETAIL.json")
    q01, _ = medians("BENCH_CLEAN.json")
    old = json.load(open("REHEARSAL_10X.json"))
    notes = {k: v.get("note") for k, v in old["queries"].items()
             if isinstance(v, dict) and v.get("note")}
    rows = {}
    for k in sorted(q10):
        if k not in q01 or q01[k] <= 0:
            continue
        row = {"sec_10x": round(q10[k], 3),
               "sec_sf01_median": round(q01[k], 4),
               "ratio": round(q10[k] / q01[k], 2)}
        if k in notes:
            row["note"] = notes[k]
        rows[k] = row
    out = {
        "metric": "rehearsal_10x",
        "unit": "sec",
        "factor": 10,
        "sf_base": "/root/testdata/sf0.1",
        "reps": "2-rep lower medians BOTH sides, same session window",
        "value": round(sum(q10.values()), 1),
        "n": len(rows),
        "failed": d10.get("failed", []),
        "note": ("round-14 full refresh: every row re-measured in one "
                 "window (10x cold-start asymmetries of earlier rounds "
                 "eliminated - both sides are 2-rep warm medians); "
                 "per-row notes carried over where still relevant."),
        "queries": rows,
    }
    json.dump(out, open("REHEARSAL_10X.json", "w"), indent=1)
    bad = sorted(((v["ratio"], k) for k, v in rows.items()), reverse=True)
    print("total_10x:", out["value"], "n:", out["n"],
          "failed:", out["failed"])
    print("worst ratios:", [(k, r) for r, k in bad[:8]])


if __name__ == "__main__":
    sys.exit(main())
