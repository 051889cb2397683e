#!/usr/bin/env python3
"""Assemble REHEARSAL_10X.json from a 10x bench detail file and the
clean sf0.1 close (both 2-rep lower medians, same-session window).

Usage: assemble_rehearsal.py <detail_10x.json> <bench_clean.json>
         <out.json> <note>
Carries over per-row `note` fields from the existing out file when the
query still exists."""
import json
import sys


def med(entry):
    return entry["median"] if isinstance(entry, dict) else entry


def main():
    detail_10x, clean, out_path, note = sys.argv[1:5]
    d10 = json.load(open(detail_10x))
    dcl = json.load(open(clean))
    old = {}
    try:
        old = json.load(open(out_path)).get("queries", {})
    except Exception:
        pass
    rows = {}
    for q, e in sorted(d10["queries"].items()):
        base = dcl["queries"].get(q)
        if base is None:
            continue
        s10, s01 = med(e), med(base)
        row = {"sec_10x": round(s10, 3), "sec_sf01_median": round(s01, 4),
               "ratio": round(s10 / s01, 2)}
        if q in old and "note" in old[q]:
            row["note"] = old[q]["note"]
        rows[q] = row
    res = {
        "metric": "rehearsal_10x", "unit": "sec", "factor": 10,
        "sf_base": "/root/testdata/sf0.1",
        "reps": "2-rep lower medians BOTH sides, same session window",
        "value": round(sum(med(e) for e in d10["queries"].values()), 1),
        "n": len(rows), "failed": d10.get("failed", []),
        "canary_10x": d10.get("canary"),
        "canary_sf01": dcl.get("canary"),
        "note": note,
        "queries": rows,
    }
    json.dump(res, open(out_path, "w"), indent=1)
    worst = sorted(rows.items(), key=lambda kv: -kv[1]["ratio"])[:8]
    print("total", res["value"], "n", res["n"], "failed", res["failed"])
    for q, r in worst:
        print(f"{q:36s} {r['ratio']:6.2f}x  {r['sec_10x']:8.3f}s")


if __name__ == "__main__":
    main()
