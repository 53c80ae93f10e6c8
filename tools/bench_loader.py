"""Benchmark the native C++ data loader against the Python preload+pack path.

Generates a synthetic dataset on disk (reference JSON layout), then times
dataset construction + full first-epoch packing both ways:
  - native: one threaded C++ pass (native/dataloader.cc)
  - python: json.load preload + per-sample packing (the reference's
    ABCDataset semantics, faceformer/datasets/data.py:48-51)

Usage: python tools/bench_loader.py [--num 2048] [--config configs/ours.yml]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--num", type=int, default=2048)
    parser.add_argument("--config", default="configs/ours.yml")
    parser.add_argument("--root", default=None,
                        help="existing dataset root (skips generation)")
    args = parser.parse_args(argv)

    from faceformer_tpu.config import load_config
    from faceformer_tpu.data.dataset import ABCDatasetParallel
    from faceformer_tpu.geometry import native

    if not (native.build() and native.available()):
        print("native kernel unavailable; nothing to compare")
        return

    cfg = load_config(args.config)

    if args.root:
        root = args.root
    else:
        tmp = tempfile.mkdtemp(prefix="ffbench_loader_")
        from faceformer_tpu.tools.synthetic_data import generate

        print(f"generating {args.num} synthetic samples under {tmp} ...")
        generate(tmp, args.num, seed=11)
        root = tmp

    split = "train.txt" if os.path.exists(os.path.join(root, "train.txt")) else "all.txt"

    def drive(native_on: bool, trials: int = 3) -> float:
        """Best-of-N construction + full first-epoch packing (page cache and
        allocator warm after trial 0; cold-start is I/O-bound either way)."""
        os.environ["FACEFORMER_NATIVE_LOADER"] = "1" if native_on else "0"
        best, n = float("inf"), 0
        for _ in range(trials):
            t0 = time.perf_counter()
            ds = ABCDatasetParallel(root, split, cfg.model)
            for i in range(len(ds)):
                ds[i]
            best = min(best, time.perf_counter() - t0)
            n = len(ds)
        label = "native" if native_on else "python"
        print(f"{label:>7}: {n} samples in {best:.2f} s best-of-{trials} "
              f"({n / best:.0f} samples/s)")
        return best

    t_py = drive(False)
    t_nat = drive(True)
    print(f"speedup: {t_py / t_nat:.1f}x")


if __name__ == "__main__":
    main()
