"""Label-free inference CLI: wireframe JSONs -> predicted faces (+ 3D).

The reference can only produce predictions through its test loop, which
requires ground-truth labels in every sample (trainer.py:105-136). This
serves raw wireframes: any JSON with an "edges" list (and, for
reconstruction, "dominant_directions") decodes to pred_faces; --reconstruct
lifts them to PLY wireframes in one pass.

    python -m faceformer_tpu.tools.predict --config configs/ours.yml \
        --ckpt logs/.../checkpoints/last --root <dir with json/> [--reconstruct]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np


def predict_faces(harness, params, raw_samples: Sequence[Dict]) -> List[List]:
    """Decode predicted faces for raw samples (no labels needed).

    Returns per-sample lists of (majority-vote type, sorted unique edge ids),
    post-processed exactly like the test loop."""
    from faceformer_tpu.data.batching import collate
    from faceformer_tpu.data.packing import pack_input_edges
    from faceformer_tpu.parallel.mesh import shard_batch

    cfg = harness.cfg
    decode = harness.decode_fn()
    engine = harness.metrics_engine

    data_axis = harness.mesh.shape["data"]
    batch_size = max(data_axis,
                     (min(cfg.batch_size_valid, len(raw_samples)) // data_axis) * data_axis)

    results: List[List] = []
    for start in range(0, len(raw_samples), batch_size):
        chunk = list(raw_samples[start : start + batch_size])
        valid = len(chunk)
        while len(chunk) < batch_size:
            chunk.append(chunk[-1])
        items = [pack_input_edges(s["edges"], cfg.model) for s in chunk]
        batch = collate(items)
        predict = np.asarray(decode(params, shard_batch(batch, harness.mesh)))

        for i in range(valid):
            # run the metric engine's post-processing with empty labels: the
            # prediction side (parse, enclosedness filter, coedge mapping,
            # majority-vote types) is exactly the test loop's
            grid = predict[i]  # (F, T) parallel / (T,) single-seq
            out = engine.evaluate_sample(grid, np.zeros_like(grid), chunk[i])
            results.append(out["predictions"])
    return results


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(description="label-free face prediction")
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--root", required=True,
                        help="directory containing json/<id>.json wireframes")
    parser.add_argument("--out", default=None,
                        help="output dir (default <root>/pred)")
    parser.add_argument("--reconstruct", action="store_true",
                        help="also lift predictions to PLY wireframes")
    args = parser.parse_args(argv)

    from faceformer_tpu.config import load_config
    from faceformer_tpu.train.trainer import Harness, NumpyJSONEncoder

    cfg = load_config(args.config)
    harness = Harness(cfg)
    state = harness.load(args.ckpt)

    json_dir = os.path.join(args.root, "json")
    names = sorted(os.path.splitext(n)[0] for n in os.listdir(json_dir))
    samples = []
    for name in names:
        with open(os.path.join(json_dir, f"{name}.json")) as f:
            samples.append(json.load(f))

    t0 = time.perf_counter()
    predictions = predict_faces(harness, state["params"], samples)
    dt = time.perf_counter() - t0
    print(f"decoded {len(samples)} samples in {dt:.2f}s "
          f"({dt / max(len(samples), 1):.3f} s/sample)")

    out_dir = args.out or os.path.join(args.root, "pred")
    os.makedirs(os.path.join(out_dir, "json"), exist_ok=True)
    for name, raw, pred in zip(names, samples, predictions):
        record = {
            "edges": raw["edges"],
            "dominant_directions": raw.get("dominant_directions", []),
            "pred_faces": pred,
            "label_faces": [],
        }
        with open(os.path.join(out_dir, "json", f"{name}.json"), "w") as f:
            json.dump(record, f, cls=NumpyJSONEncoder)

    if args.reconstruct:
        from faceformer_tpu.reconstruction.wireframe import reconstruct_file

        os.makedirs(os.path.join(out_dir, "ply"), exist_ok=True)
        done = sum(reconstruct_file(name, out_dir) for name in names)
        print(f"reconstructed {done}/{len(names)} wireframes -> {out_dir}/ply")


if __name__ == "__main__":
    main()
