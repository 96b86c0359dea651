#!/usr/bin/env python3
"""Assemble BENCH_DETAIL.json from one or more graft.Bench stdout files.

Usage: python3 tools/bench_detail.py <bench_stdout>... [out_json]
(The last argument is the output path when it is not an existing input
file; default BENCH_DETAIL.json.)

Collects the per_query_converged / per_query_first / per_query_reps /
per_query_build / cache_builds metric lines plus the headline into ONE
committed JSON object, so the full per-query detail survives the driver
artifact's ~4 KB tail truncation (the r10 verdict's close-out gap).
InventorySyncSpec asserts the result covers the live query inventory.

Sharded runs (SPARK_GRAFT_BENCH_ONLY) are first-class: metric lines from
multiple shards — concatenated into one file or passed as separate files
— MERGE per-query maps instead of overwriting (the r11 ADVICE gap: the
last shard used to win wholesale), cache_builds sum per build name, and
headline scalars sum/concatenate so the merged totals describe the union.
"""
import json
import os
import sys


def merge_headline(acc: dict, obj: dict) -> dict:
    if not acc:
        return dict(obj)
    for k in ("value", "first_run_total", "n_queries", "ingest_build_s",
              "n_failed", "n_rep_spread_suspects", "n_calib_suspects",
              "n_anomalies"):
        if k in obj:
            acc[k] = acc.get(k, 0) + obj[k]
    # full lists arrive via the `suspects` line (r16: the headline carries
    # only bounded count+top-N views so it can never outgrow the driver's
    # tail capture again); pre-r16 headlines carried them inline — merge
    # either shape
    for k in ("failed", "calib_s", "rep_spread_suspects", "calib_suspect_queries"):
        if k in obj:
            acc[k] = acc.get(k, []) + obj[k]
    if "top20_queries" in obj:
        acc.setdefault("top20_queries", {}).update(obj["top20_queries"])
    # a shard merge is polluted if ANY shard is (OR, never last-wins)
    if "steal_polluted" in obj:
        acc["steal_polluted"] = bool(
            acc.get("steal_polluted", False) or obj["steal_polluted"])
    if acc.get("calib_s"):
        cs = sorted(acc["calib_s"])
        acc["calib_median_s"] = cs[len(cs) // 2]
        acc["calib_max_over_min"] = (cs[-1] / cs[0]) if cs[0] > 0 else 1.0
    return acc


def main() -> None:
    args = sys.argv[1:]
    # --round=N stamps the artifact so per-query diffs across rounds need
    # no git archaeology (r13 verdict item 8)
    round_no = None
    for a in list(args):
        if a.startswith("--round="):
            round_no = int(a.split("=", 1)[1])
            args.remove(a)
    if not args:
        sys.exit(__doc__)
    if len(args) > 1 and not os.path.exists(args[-1]):
        srcs, out = args[:-1], args[-1]
    else:
        srcs, out = args, "BENCH_DETAIL.json"
    detail = {}
    headline = {}
    suspects = {}
    anomalies = {}
    for src in srcs:
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
                    detail.setdefault("per_query_converged", {}).update(obj["queries"])
                elif m == "per_query_first":
                    detail.setdefault("per_query_first", {}).update(obj["queries"])
                elif m == "per_query_reps":
                    detail.setdefault("per_query_reps", {}).update(obj["reps"])
                elif m == "per_query_build":
                    detail.setdefault("per_query_build", {}).update(obj["queries"])
                elif m == "cache_builds":
                    cb = detail.setdefault(
                        "cache_builds", {"metric": "cache_builds",
                                         "total_build_s": 0.0, "builds": {}})
                    cb["total_build_s"] = round(
                        cb["total_build_s"] + obj.get("total_build_s", 0.0), 3)
                    for k, v in obj.get("builds", {}).items():
                        cb["builds"][k] = round(cb["builds"].get(k, 0.0) + v, 3)
                elif m == "suspects":
                    for k in ("failed", "rep_spread_suspects",
                              "calib_suspect_queries", "calib_s"):
                        suspects[k] = suspects.get(k, []) + obj.get(k, [])
                elif m == "cross_round_anomalies":
                    anomalies.update(obj.get("anomalies", {}))
                elif m == "total":
                    headline = merge_headline(headline, obj)
    if headline:
        # fold the full (unbounded) lists back into the committed headline
        # under their historical keys — BENCH_DETAIL.json has no line-length
        # hazard, and scale_slopes/mk_scale_input read `failed` from here
        for k, v in suspects.items():
            headline[k] = headline.get(k, []) + v
        if anomalies or "cross_round_anomalies" not in headline:
            headline["cross_round_anomalies"] = {
                **headline.get("cross_round_anomalies", {}), **anomalies}
    if headline:
        # keep only the overall top-20 after a shard merge
        t20 = headline.get("top20_queries", {})
        conv = detail.get("per_query_converged", t20)
        top = sorted(t20.items(), key=lambda kv: -conv.get(kv[0], kv[1]))[:20]
        headline["top20_queries"] = dict(top)
        detail["headline"] = headline
    if round_no is not None:
        detail["round"] = round_no
    required = ["per_query_converged", "per_query_first", "per_query_reps"]
    missing = [k for k in required if k not in detail]
    if missing:
        sys.exit(f"bench output lacks metric lines: {missing}")
    detail.setdefault("per_query_build", {})
    n = len(detail["per_query_converged"])
    with open(out, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}: {n} queries, "
          f"total {detail.get('headline', {}).get('value', '?')} s")


if __name__ == "__main__":
    main()
