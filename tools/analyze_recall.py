"""Recall by face complexity: where do the models lose faces?

Reads a run's prediction JSONs (written by Harness.test: canonicalized
(type, sorted-unique-edge-set) faces per sample) and buckets LABEL faces
by edge count, reporting per-bucket recall — a label face counts as
recalled when its edge set appears among the sample's predicted faces
(type ignored, exactly like the face-TP match in train/metrics.py /
reference trainer.py:272-280).

    python tools/analyze_recall.py logs/SurfaceFormer/big-s0 \
        [logs/SurfaceFormer/seq2seq-big-s0 ...] [--json out.json]

Backs the README claim that flat-model recall losses concentrate on
complex (many-edge, multi-loop) faces while the anchor-parallel flagship
holds them.
"""

import argparse
import glob
import json
import os

BUCKETS = ((1, 4), (5, 8), (9, 11), (12, 10 ** 9))


def _bucket(n_edges: int) -> str:
    for lo, hi in BUCKETS:
        if lo <= n_edges <= hi:
            return f"{lo}-{hi}" if hi < 10 ** 9 else f"{lo}+"
    return "?"


def analyze(run_dir: str) -> dict:
    per_bucket = {}
    paths = sorted(glob.glob(os.path.join(run_dir, "json", "*.json")))
    for path in paths:
        with open(path) as f:
            rec = json.load(f)
        pred_sets = {tuple(sorted(set(face))) for _t, face in rec["pred_faces"]}
        for _t, face in rec["label_faces"]:
            key = _bucket(len(set(face)))
            hit, total = per_bucket.get(key, (0, 0))
            per_bucket[key] = (hit + (tuple(sorted(set(face))) in pred_sets),
                               total + 1)
    out = {"samples": len(paths), "buckets": {}}
    for (lo, hi) in BUCKETS:
        key = f"{lo}-{hi}" if hi < 10 ** 9 else f"{lo}+"
        hit, total = per_bucket.get(key, (0, 0))
        out["buckets"][key] = {
            "label_faces": total,
            "recall": round(hit / total, 4) if total else None,
        }
    totals = [v for v in per_bucket.values()]
    out["overall_recall"] = round(
        sum(h for h, _ in totals) / max(sum(t for _, t in totals), 1), 4)
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("runs", nargs="+", help="log dirs containing json/")
    parser.add_argument("--json", default=None, help="optional output path")
    args = parser.parse_args(argv)
    report = {}
    for run in args.runs:
        name = os.path.basename(os.path.normpath(run))
        report[name] = analyze(run)
        row = report[name]
        cells = "  ".join(
            f"{k}: {v['recall']} (n={v['label_faces']})"
            for k, v in row["buckets"].items())
        print(f"{name:>24}  overall {row['overall_recall']}  |  {cells}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
