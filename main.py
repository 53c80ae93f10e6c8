"""CLI entry point — same surface as the reference's main.py.

    python main.py --config-file configs/ours.yml                 # train
    python main.py --config-file ... --test_ckpt  <path>          # test
    python main.py --config-file ... --valid_ckpt <path>          # validate
    python main.py --config-file ... --resume_ckpt <path>         # resume
    ... [key value ...]                                           # overrides

Checkpoint paths ending in .ckpt/.pt are treated as reference PyTorch
checkpoints and converted on load (reference: main.py:24-80).
"""

import argparse

from faceformer_tpu.config import load_config
from faceformer_tpu.train.trainer import Harness


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="SurfaceFormer TPU Training")
    parser.add_argument("--config-file", default="", metavar="FILE",
                        help="path to config file")
    parser.add_argument("--valid_ckpt", default="", help="checkpoint to validate")
    parser.add_argument("--test_ckpt", default="", help="checkpoint to test")
    parser.add_argument("--resume_ckpt", default="",
                        help="checkpoint to resume training from")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="config overrides as key value pairs")
    return parser


def main() -> None:
    args = get_parser().parse_args()
    cfg = load_config(args.config_file, args.opts)
    harness = Harness(cfg)

    if args.test_ckpt:
        state = harness.load(args.test_ckpt)
        harness.test(state["params"])
    elif args.valid_ckpt:
        import jax

        from faceformer_tpu.train.logging import MetricsLogger

        state = harness.load(args.valid_ckpt)
        # one writer in multi-process runs (validate itself is collective)
        logger = (MetricsLogger(harness.log_dir)
                  if jax.process_index() == 0 else None)
        harness.validate(state["params"], logger=logger)
        if logger is not None:
            logger.close()
    elif args.resume_ckpt:
        state = harness.load(args.resume_ckpt)
        harness.fit(state)
    else:
        harness.fit()


if __name__ == "__main__":
    main()
