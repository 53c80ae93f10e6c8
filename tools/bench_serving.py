"""Trained-model serving benchmark: CAD solids decoded per second.

The production shape differs from bench.py's worst-case full-length decode:
early stopping is ON, so a trained model finishes most face rows in a
handful of steps. This tool loads a trained checkpoint and a real test
split, then measures — all INTERLEAVED in the same window (the tunneled
device's throughput swings across a session; only same-window A/Bs are
trustworthy):

  - fused vs causal_cache engines;
  - per-row retirement vs the legacy whole-batch stop (ablation: legacy
    stops only when every row emits a terminator in the SAME step, so one
    straggler row re-emitting junk keeps the whole batch decoding);
  - corpus-order vs complexity-sorted batches (sorting by edge count packs
    same-depth rows together so batch stop steps shrink).

The JSON artifact records raw per-iteration times, a timestamp, and the
exact checkpoint/config/batch so absolute numbers are auditable against
the device phase they were measured in (VERDICT r2 weak #7).

Usage:
    python tools/bench_serving.py \
        [--ckpt logs/SurfaceFormer/big-s0/checkpoints/last] \
        [--config configs/synthetic-big.yml] [--batch 32] [--iters 5]
"""

import argparse
import datetime
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt",
                        default="logs/SurfaceFormer/big-s0/checkpoints/last")
    parser.add_argument("--config", default="configs/synthetic-big.yml")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--num_batches", type=int, default=0,
                        help="test-split batches per measurement pass "
                             "(0 = the whole split)")
    parser.add_argument("--out", default=None, help="optional JSON output path")
    args = parser.parse_args(argv)

    import jax

    from faceformer_tpu.config import load_config
    from faceformer_tpu.data.batching import iter_batches
    from faceformer_tpu.decode import greedy_decode_parallel
    from faceformer_tpu.train.trainer import Harness

    cfg = load_config(args.config)
    harness = Harness(cfg)
    params = harness.load(args.ckpt)["params"]
    ds = harness.dataset("test")

    def batches_in(order):
        idx = list(range(len(ds)))
        if args.num_batches:
            # bound the subset BEFORE ordering so every order measures the
            # SAME solids — sorting first would hand the "sorted" pass the
            # split's shallowest samples and inflate its ratio
            idx = idx[:args.batch * args.num_batches]
        if order == "sorted":
            idx.sort(key=lambda i: ds[i]["num_input"])
        items = [ds[i] for i in idx]
        return [jax.device_put(
            {k: v for k, v in b.items() if not isinstance(v, (list, str))})
            for b in iter_batches(items, args.batch, pad_to_full=True)]

    order_batches = {order: batches_in(order) for order in ("corpus", "sorted")}
    # count REAL solids in the selected batches: a split smaller than
    # batch*num_batches yields fewer (possibly padded) batches, and assuming
    # the full product would overstate throughput
    n_solids = int(sum(np.asarray(b["sample_valid"]).sum()
                       for b in order_batches["corpus"]))

    variants = {
        "fused": dict(mode="fused", retire_rows=True),
        "causal_cache": dict(mode="causal_cache", retire_rows=True),
        "fused_legacy_stop": dict(mode="fused", retire_rows=False),
    }
    fns = {}
    for name, kw in variants.items():
        fns[name] = jax.jit(lambda p, b, _kw=kw: greedy_decode_parallel(
            p, cfg.model, b, precision=cfg.decode.precision,
            anchor_mode=cfg.decode.anchor_mode,  # match deployed serving
            early_stop=True, **_kw)["predict"])

    cases = [(v, "corpus") for v in variants] + [("fused", "sorted")]
    for name, order in cases:  # compile + warmup
        for b in order_batches[order]:
            np.asarray(fns[name](params, b))

    raw = {f"{name}/{order}": [] for name, order in cases}
    for _ in range(args.iters):
        for name, order in cases:  # interleaved A/B in the same window
            t0 = time.perf_counter()
            for b in order_batches[order]:
                np.asarray(fns[name](params, b))
            raw[f"{name}/{order}"].append(time.perf_counter() - t0)

    result = {
        "timestamp_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "git_rev": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True).stdout.strip(),
        "ckpt": args.ckpt, "config": args.config,
        "batch": args.batch, "num_batches": args.num_batches,
        "batches_per_pass": len(order_batches["corpus"]),
        "solids_per_pass": n_solids,
        "raw_pass_seconds": {k: [round(t, 4) for t in v]
                             for k, v in raw.items()},
    }
    for key, ts in raw.items():
        best = min(ts)
        n_batches = len(order_batches[key.split("/")[1]])
        result[key] = {
            "solids_per_sec": round(n_solids / best, 1),
            "ms_per_batch": round(best * 1e3 / n_batches, 1),
        }
        print(f"{key:>24}: {result[key]['solids_per_sec']} solids/s "
              f"({result[key]['ms_per_batch']} ms/batch of {args.batch})")
    result["fused_vs_xla"] = round(
        result["fused/corpus"]["solids_per_sec"]
        / result["causal_cache/corpus"]["solids_per_sec"], 2)
    result["retirement_vs_legacy"] = round(
        result["fused/corpus"]["solids_per_sec"]
        / result["fused_legacy_stop/corpus"]["solids_per_sec"], 2)
    result["sorted_vs_corpus"] = round(
        result["fused/sorted"]["solids_per_sec"]
        / result["fused/corpus"]["solids_per_sec"], 2)
    for k in ("fused_vs_xla", "retirement_vs_legacy", "sorted_vs_corpus"):
        print(f"{k}: {result[k]}x")
    if args.out:
        # append-mode artifact: each measurement window is one entry, so
        # cross-window comparisons (device phase swings) stay auditable
        runs = []
        if os.path.exists(args.out):
            with open(args.out) as f:
                prev = json.load(f)
            runs = prev if isinstance(prev, list) else [prev]
        runs.append(result)
        with open(args.out, "w") as f:
            json.dump(runs, f, indent=1)


if __name__ == "__main__":
    main()
