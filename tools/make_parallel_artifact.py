#!/usr/bin/env python3
"""Assemble the parallelism-scaling artifact (PARALLEL.json) from two
Bench subset runs at different local[N] core counts (copied-aside
BENCH_SUBSET.json files). speedup = t_low_cores / t_high_cores; a query
whose speedup is ~1 on a 4x core increase is funneling through a single
partition (global window, driver loop, one-reducer sort) — the hidden
scale bug this probe exists to flag. Queries faster than the floor are
skipped: at sub-second wall times, fixed per-query setup swamps any
parallel fraction and every speedup reads as ~1.

Usage:
  python3 tools/make_parallel_artifact.py low.json high.json OUT.json \
      [flat_threshold=1.3] [min_low_sec=1.0]
"""
import json
import sys


def main():
    low, high, out = sys.argv[1:4]
    flat_thr = float(sys.argv[4]) if len(sys.argv) > 4 else 1.3
    min_low = float(sys.argv[5]) if len(sys.argv) > 5 else 1.0
    a = json.load(open(low))
    b = json.load(open(high))
    qs = [q for q in a["queries"] if q in b["queries"]]
    speedup = {q: round(a["queries"][q] / b["queries"][q], 2) for q in qs}
    sized = [q for q in qs if a["queries"][q] >= min_low]
    flat = sorted((q for q in sized if speedup[q] < flat_thr),
                  key=lambda q: speedup[q])
    doc = {
        "metric": "core_scaling",
        "description": "same query subset, min-of-N warm, at two "
        "local[N] core counts; speedup = t_low/t_high. Flat speedup on "
        "a query big enough to parallelize indicates a single-partition "
        "funnel.",
        "cores_low": a.get("cpus"), "cores_high": b.get("cpus"),
        "total_low_sec": round(sum(a["queries"][q] for q in qs), 3),
        "total_high_sec": round(sum(b["queries"][q] for q in qs), 3),
        "total_speedup": round(sum(a["queries"][q] for q in qs) /
                               sum(b["queries"][q] for q in qs), 2),
        "n_queries": len(qs),
        "n_sized": len(sized),
        "flat_threshold": flat_thr,
        "min_low_sec": min_low,
        "flat_queries": flat,
        "speedup": dict(sorted(speedup.items(), key=lambda x: x[1])),
        "queries_low": {q: a["queries"][q] for q in qs},
        "queries_high": {q: b["queries"][q] for q in qs},
        "loadavg": {"low_start": a.get("loadavg_start"),
                    "high_start": b.get("loadavg_start")},
    }
    json.dump(doc, open(out, "w"), indent=1)
    print(f"{out}: total speedup {doc['total_speedup']}x over "
          f"{len(qs)} queries; flat (<{flat_thr}x of {len(sized)} sized): "
          f"{flat}")


if __name__ == "__main__":
    main()
