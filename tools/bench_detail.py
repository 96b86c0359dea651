#!/usr/bin/env python3
"""Assemble BENCH_DETAIL.json from a graft.Bench run's stdout.

Usage: python3 tools/bench_detail.py <bench_stdout_file> [out_json]

Collects the per_query_converged / per_query_first / per_query_reps /
cache_builds metric lines plus the headline into ONE committed JSON
object, so the full per-query detail survives the driver artifact's
~4 KB tail truncation (the r10 verdict's close-out gap).
InventorySyncSpec asserts the result covers the live query inventory.
"""
import json
import sys


def main() -> None:
    src = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL.json"
    detail = {}
    with open(src) as f:
        for line in f:
            line = line.strip()
            i = line.find('{"metric"')
            if i < 0:
                continue
            try:
                obj = json.loads(line[i:])
            except json.JSONDecodeError:
                continue
            m = obj.get("metric")
            if m == "per_query_converged":
                detail["per_query_converged"] = obj["queries"]
            elif m == "per_query_first":
                detail["per_query_first"] = obj["queries"]
            elif m == "per_query_reps":
                detail["per_query_reps"] = obj["reps"]
            elif m == "cache_builds":
                detail["cache_builds"] = obj
            elif m == "total":
                detail["headline"] = obj
    required = ["per_query_converged", "per_query_first", "per_query_reps"]
    missing = [k for k in required if k not in detail]
    if missing:
        sys.exit(f"bench output lacks metric lines: {missing}")
    n = len(detail["per_query_converged"])
    with open(out, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}: {n} queries, "
          f"total {detail.get('headline', {}).get('value', '?')} s")


if __name__ == "__main__":
    main()
