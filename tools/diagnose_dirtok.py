"""Decompose the direction-token flavor's recall loss (VERDICT r3 #2).

The dirtok flat model's recall trails its precision by ~0.2. This tool
decodes a test split and separates the two possible causes:
  - the model emits too FEW faces (premature EOS / skipped faces), vs
  - the model emits malformed faces whose oriented loops fail the
    enclosedness filter (metrics.py applies the same filter the
    reference's coedge flavor uses at eval, trainer.py:226-231).

For each sample it counts raw predicted faces (straight from the token
stream), faces surviving the oriented-enclosedness filter, label faces,
and how many of the filter-dropped faces would have matched a label as an
undirected edge set (i.e. the face was RIGHT, only its direction bits
were wrong).

    python tools/diagnose_dirtok.py --ckpt <dir> \
        [--config configs/synthetic-dirtok-big.yml] [--out out.json]
"""

import argparse
import datetime
import json
import subprocess

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--config", default="configs/synthetic-dirtok-big.yml")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    from faceformer_tpu.config import load_config
    from faceformer_tpu.data.batching import iter_batches
    from faceformer_tpu.geometry.native import filter_faces_by_encloseness_batch
    from faceformer_tpu.train.metrics import parse_directed_faces
    from faceformer_tpu.train.trainer import Harness, _device_batch

    cfg = load_config(args.config)
    h = Harness(cfg)
    params = h.load(args.ckpt)["params"]
    ds = h.dataset("test")
    decode = h.decode_fn()
    tol = cfg.post_process.enclosedness_tol

    counts = dict(samples=0, pred_raw=0, pred_kept=0, label=0,
                  dropped_but_matches_label=0, kept_matches_label=0)
    for b in iter_batches(list(ds), args.batch, pad_to_full=True):
        out = np.asarray(decode(params, _device_batch(b)))
        for i in range(len(b["sample_valid"])):
            if not b["sample_valid"][i]:
                continue
            raw = ds.raw_datas[b["id"][i]]
            pred, label = parse_directed_faces(
                out[i], np.asarray(b["label"])[i], len(raw["edges"]),
                cfg.model.token)
            kept = filter_faces_by_encloseness_batch(raw["edges"], pred, tol)
            # parse_directed_faces emits flat (edge, orient) pair tuples;
            # the filter's survivors carry loops of pairs
            kept_keys = {tuple(sorted({e for lp in loops for (e, _o) in lp}))
                         for _t, loops in kept}
            label_keys = {tuple(sorted({e for (e, _o) in pairs}))
                          for _t, pairs in label}
            pred_keys = [tuple(sorted({e for (e, _o) in pairs}))
                         for _t, pairs in pred]
            counts["samples"] += 1
            counts["pred_raw"] += len(pred)
            counts["pred_kept"] += len(kept)
            counts["label"] += len(label)
            counts["kept_matches_label"] += sum(
                1 for k in kept_keys if k in label_keys)
            counts["dropped_but_matches_label"] += sum(
                1 for k in pred_keys if k not in kept_keys and k in label_keys)

    result = {
        "timestamp_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "git_rev": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True).stdout.strip(),
        "ckpt": args.ckpt, "config": args.config,
        **counts,
        "filter_drop_rate": round(
            1 - counts["pred_kept"] / max(counts["pred_raw"], 1), 4),
        "note": ("dropped_but_matches_label counts filter-dropped predicted "
                 "faces whose UNDIRECTED edge set equals a label face: the "
                 "face was found, only its direction bits broke the chain."),
    }
    for k, v in result.items():
        print(f"{k}: {v}")
    if args.out:
        runs = []
        import os
        if os.path.exists(args.out):
            with open(args.out) as f:
                prev = json.load(f)
            runs = prev if isinstance(prev, list) else [prev]
        runs.append(result)
        with open(args.out, "w") as f:
            json.dump(runs, f, indent=1)


if __name__ == "__main__":
    main()
