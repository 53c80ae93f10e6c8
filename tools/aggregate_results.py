"""Aggregate demo-run results.json files into a seed-stability summary.

    python tools/aggregate_results.py big-s0 big-s1 big-s2
    python tools/aggregate_results.py --json benchmarks/quality_big.json \
        big-s0 big-s1 big-s2

Reads logs/SurfaceFormer/<version>/results.json for each version and prints
mean +- spread (min..max) per metric; optionally writes the summary JSON
(the artifact README quality tables trace to).
"""

import argparse
import json
import os

METRICS = ("test_precision", "test_recall", "test_type_acc")


def aggregate(versions, log_root="logs/SurfaceFormer"):
    rows = {}
    for v in versions:
        path = os.path.join(log_root, v, "results.json")
        with open(path) as f:
            rows[v] = json.load(f)
    summary = {"versions": rows, "n_seeds": len(versions)}
    for m in METRICS:
        vals = [rows[v][m] for v in versions]
        summary[m] = {
            "mean": round(sum(vals) / len(vals), 4),
            "min": round(min(vals), 4),
            "max": round(max(vals), 4),
        }
    ns = {rows[v]["num_samples"] for v in versions}
    summary["num_samples"] = ns.pop() if len(ns) == 1 else sorted(ns)
    return summary


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("versions", nargs="+")
    parser.add_argument("--json", default=None, help="write summary here")
    args = parser.parse_args(argv)
    summary = aggregate(args.versions)
    for m in METRICS:
        s = summary[m]
        print(f"{m}: {s['mean']:.4f} (min {s['min']:.4f}, max {s['max']:.4f})")
    print(f"num_samples: {summary['num_samples']}, seeds: {summary['n_seeds']}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
