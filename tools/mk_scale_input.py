#!/usr/bin/env python3
"""Build a scale_slopes.py input JSON from a graft.Bench stdout capture:
the headline object ("metric":"total") with `queries` replaced by the full
per_query_converged map and top20_queries removed — the round-9 merge
snippet, promoted to a tool so close-outs stop hand-editing JSON.

Usage: python3 tools/mk_scale_input.py <bench_stdout> <out_json>

Dev-only tool (driver-side python; not part of the engine).
"""
import json
import sys


def main(src: str, out: str) -> None:
    headline = None
    conv = None
    suspects = None
    with open(src) as f:
        for line in f:
            i = line.find('{"metric"')
            if i < 0:
                continue
            try:
                obj = json.loads(line[i:].strip())
            except json.JSONDecodeError:
                continue
            m = obj.get("metric")
            if m == "per_query_converged":
                conv = obj.get("queries")
            elif m == "suspects":
                suspects = obj
            elif m == "total":
                headline = obj
    assert headline is not None, f"{src}: no headline ('metric':'total') line"
    assert conv, f"{src}: no per_query_converged line"
    assert "steal_polluted" in headline, (
        f"{src}: headline lacks the steal_polluted stamp - rerun with "
        "current Bench (scale_slopes.py refuses stamp-less inputs)")
    headline = dict(headline)
    headline.pop("top20_queries", None)
    headline["queries"] = conv
    # r16 headlines carry only bounded count+top-N list views; the full
    # lists (scale_slopes reads `failed`) ride the `suspects` line
    if suspects is not None:
        for k in ("failed", "rep_spread_suspects", "calib_suspect_queries",
                  "calib_s"):
            headline[k] = suspects.get(k, [])
    assert "failed" in headline, (
        f"{src}: no failed list (need the suspects line or a pre-r16 headline)")
    with open(out, "w") as f:
        json.dump(headline, f)
    print(f"{out}: {len(conv)} queries, total={headline.get('value')}s, "
          f"steal_polluted={headline.get('steal_polluted')}, "
          f"calib_max_over_min={headline.get('calib_max_over_min')}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
