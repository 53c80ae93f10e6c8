#!/bin/bash
# Sequential demo-training queue for the scaled synthetic corpora.
# One TPU chip -> strictly sequential; each run trains then tests its best
# checkpoint (results land in logs/SurfaceFormer/<version>/results.json).
#
#   bash tools/train_demos.sh flagship-s0     # one named stage
#   bash tools/train_demos.sh flat dirtok     # several stages
set -e
cd "$(dirname "$0")/.."

run_stage() {
  case "$1" in
    flagship-s0|flagship-s1|flagship-s2)
      seed="${1##*-s}"
      python main.py --config-file configs/synthetic-big.yml \
        trainer.version "big-s${seed}" trainer.seed "${seed}"
      python main.py --config-file configs/synthetic-big.yml \
        --test_ckpt "$(python tools/best_ckpt.py logs/SurfaceFormer/big-s${seed})" \
        trainer.version "big-s${seed}" trainer.seed "${seed}"
      ;;
    flat)
      python main.py --config-file configs/synthetic-seq2seq-big.yml
      python main.py --config-file configs/synthetic-seq2seq-big.yml \
        --test_ckpt "$(python tools/best_ckpt.py logs/SurfaceFormer/seq2seq-big-s0)"
      ;;
    dirtok)
      python main.py --config-file configs/synthetic-dirtok-big.yml
      python main.py --config-file configs/synthetic-dirtok-big.yml \
        --test_ckpt "$(python tools/best_ckpt.py logs/SurfaceFormer/dirtok-big-s0)"
      ;;
    *)
      echo "unknown stage $1" >&2; exit 2;;
  esac
}

for stage in "$@"; do
  echo "=== stage ${stage} start $(date -u +%H:%M:%S)"
  run_stage "${stage}"
  echo "=== stage ${stage} done $(date -u +%H:%M:%S)"
done
