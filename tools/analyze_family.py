"""Per-family quality breakdown for STEP-corpus runs: which geometry is hard?

Reads a run's prediction JSONs (written by Harness.test: canonicalized
(type, edge-index-tuple) faces per sample, the exact face-TP contract of
train/metrics.py / reference trainer.py:272-280) and groups samples by
the corpus family that generated each solid. Families are recovered
exactly: tools/gen_step_solids.py seeds every solid i with
``default_rng(SeedSequence([seed, i]))`` and its FIRST rng draw is the
family choice, so re-drawing with the same seed reproduces the label
without a manifest.

    python tools/analyze_family.py logs/SurfaceFormer/step-native-big-s0 \
        --seed 5 [--json out.json]

Backs the benchmarks/quality_step_native.json ceiling analysis: the
aggregate recall on the 14-family corpus is dominated by the
multi-feature composite/hole classes, not by the curved-surface splitters.
"""

import argparse
import glob
import json
import os

import numpy as np

# The family draw is the FIRST rng.choice a solid's dedicated generator
# makes (gen_step_solids.py::random_step_solid), so re-drawing with the
# same per-solid SeedSequence — and the same --weights, if the corpus
# was reweighted — reproduces it exactly.
try:  # script use (tools/ on sys.path) or package-style import
    from gen_step_solids import (  # noqa: E402
        FAMILIES as KINDS, FAMILY_PROBS as PROBS, parse_weights)
except ImportError:  # pragma: no cover - test-suite import path
    from tools.gen_step_solids import (  # noqa: E402
        FAMILIES as KINDS, FAMILY_PROBS as PROBS, parse_weights)


def family_of(seed: int, index: int, probs=None) -> str:
    rng = np.random.default_rng(np.random.SeedSequence([seed, index]))
    return str(rng.choice(KINDS, p=PROBS if probs is None else probs))


def sample_metrics(rec: dict) -> dict:
    pred = [(t, tuple(sorted(set(face)))) for t, face in rec["pred_faces"]]
    label = [(t, tuple(sorted(set(face)))) for t, face in rec["label_faces"]]
    label_sets = {f for _t, f in label}
    label_types = {}
    for t, f in label:
        label_types.setdefault(f, t)
    tp = sum(1 for _t, f in pred if f in label_sets)
    type_tp = sum(1 for t, f in pred if f in label_sets and label_types[f] == t)
    return {
        "precision": tp / len(pred) if pred else 0.0,
        "recall": sum(1 for _t, f in label
                      if f in {g for _u, g in pred}) / max(len(label), 1),
        "type_acc": type_tp / tp if tp else 0.0,
        "n_pred": len(pred),
        "n_label": len(label),
        "empty_pred": not pred,
    }


def analyze(run_dir: str, seed: int, probs=None) -> dict:
    rows = {}
    paths = sorted(glob.glob(os.path.join(run_dir, "json", "*.json")))
    per_sample = []
    for path in paths:
        idx = int(os.path.splitext(os.path.basename(path))[0])
        with open(path) as f:
            rec = json.load(f)
        m = sample_metrics(rec)
        m["family"] = family_of(seed, idx, probs=probs)
        m["id"] = f"{idx:08d}"
        per_sample.append(m)
    for m in per_sample:
        fam = rows.setdefault(m["family"], [])
        fam.append(m)
    out = {"run": run_dir, "seed": seed, "samples": len(per_sample),
           "overall": {}, "families": {}}
    for key in ("precision", "recall", "type_acc"):
        out["overall"][key] = round(
            float(np.mean([m[key] for m in per_sample])), 4)
    out["overall"]["empty_pred"] = sum(m["empty_pred"] for m in per_sample)
    for fam in sorted(rows):
        ms = rows[fam]
        out["families"][fam] = {
            "n": len(ms),
            "precision": round(float(np.mean([m["precision"] for m in ms])), 4),
            "recall": round(float(np.mean([m["recall"] for m in ms])), 4),
            "type_acc": round(float(np.mean([m["type_acc"] for m in ms])), 4),
            "mean_label_faces": round(
                float(np.mean([m["n_label"] for m in ms])), 2),
            "empty_pred": sum(m["empty_pred"] for m in ms),
            "worst": sorted(ms, key=lambda m: m["recall"])[0]["id"],
        }
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("runs", nargs="+", help="log dirs containing json/")
    parser.add_argument("--seed", type=int, default=5,
                        help="gen_step_solids.py --seed of the corpus")
    parser.add_argument("--weights", type=str, default="",
                        help="gen_step_solids.py --weights of the corpus")
    parser.add_argument("--json", type=str, default=None)
    args = parser.parse_args(argv)
    probs = parse_weights(args.weights) if args.weights else None
    results = [analyze(run, args.seed, probs=probs) for run in args.runs]
    for res in results:
        print(json.dumps(res, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results if len(results) > 1 else results[0], f, indent=1)


if __name__ == "__main__":
    main()
