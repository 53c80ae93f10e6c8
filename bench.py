"""Headline benchmark: anchor-parallel greedy decode throughput on TPU.

Measures face sequences (anchor rows) decoded per second by the flagship
SurfaceFormer_Parallel at the `ours` config dims (L=216 coedges, d=512,
6+6 layers) over synthetic wireframes — the same decode loop the reference
times with cuda-synchronized wall clock at test time (reference:
faceformer/trainer.py:106-112, batch forced to 1, full-prefix re-runs).

Prints ONE JSON line:
  {"metric": "face_seqs_per_sec", "value": N, "unit": "faces/s",
   "vs_baseline": ratio}

vs_baseline compares against the PyTorch-CPU reference-equivalent baseline
stored in benchmarks/baseline_torch_cpu.json (produced by
tools/baseline_torch.py; value is face sequences per second).
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from faceformer_tpu.config import load_config
    from faceformer_tpu.decode import greedy_decode_parallel
    from faceformer_tpu.models.parallel import SurfaceFormerParallel

    from __graft_entry__ import _synthetic_batch

    cfg = load_config(os.path.join(os.path.dirname(__file__), "configs", "ours.yml"))
    model_cfg = cfg.model

    batch_size = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    mode = os.environ.get("BENCH_DECODE_MODE", "fused")

    params = SurfaceFormerParallel.init(jax.random.PRNGKey(0), model_cfg)
    batch = _synthetic_batch(model_cfg, batch_size=batch_size, seed=3)
    params = jax.device_put(params)
    batch = jax.device_put(batch)

    import jax.numpy as jnp

    # early_stop off: random weights would stop after one step; the honest
    # figure is full-length face decoding (worst case, every row decodes the
    # whole token budget). The timed jit reduces the (N, F, T) grid to one
    # scalar INSIDE the computation: np.asarray on the scalar still forces
    # a full device sync (it depends on every grid entry), but avoids
    # timing the ~1 MB grid transfer through the tunnel (~40 ms at the
    # tunnel's 20-40 MB/s — a pure measurement artifact, not decode work).
    decode = jax.jit(
        lambda p, b: jnp.sum(greedy_decode_parallel(
            p, model_cfg, b, precision="bf16", mode=mode,
            early_stop=False)["predict"]))

    # warmup + compile; np.asarray forces a real device->host sync (the
    # tunneled axon platform's block_until_ready can return early)
    np.asarray(decode(params, batch))

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(decode(params, batch))
        times.append(time.perf_counter() - t0)

    best = min(times)
    # every anchor row is a face sequence decoded to completion
    face_seqs = batch_size * model_cfg.num_lines
    value = face_seqs / best

    baseline_path = os.path.join(
        os.path.dirname(__file__), "benchmarks", "baseline_torch_cpu.json")
    vs_baseline = 0.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        if baseline.get("face_seqs_per_sec"):
            vs_baseline = value / float(baseline["face_seqs_per_sec"])

    print(json.dumps({
        "metric": "face_seqs_per_sec",
        "value": round(value, 2),
        "unit": "faces/s",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
