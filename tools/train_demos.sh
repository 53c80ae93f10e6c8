#!/bin/bash
# Sequential demo-training queue for the scaled synthetic corpora.
# One TPU chip -> strictly sequential; each stage trains then tests its best
# checkpoint (results land in logs/SurfaceFormer/<version>/results.json).
#
#   bash tools/train_demos.sh flagship-s0          # one named stage
#   bash tools/train_demos.sh flat-s0 dirtok-s0    # several stages
set -e
cd "$(dirname "$0")/.."

run_stage() {
  local family="${1%-s*}" seed="${1##*-s}" config version
  case "$family" in
    flagship) config=configs/synthetic-big.yml;         version="big-s${seed}";;
    flat)     config=configs/synthetic-seq2seq-big.yml; version="seq2seq-big-s${seed}";;
    dirtok)   config=configs/synthetic-dirtok-big.yml;  version="dirtok-big-s${seed}";;
    coedge)   config=configs/synthetic-coedge-big.yml;  version="coedge-big-s${seed}";;
    *) echo "unknown stage $1" >&2; exit 2;;
  esac
  # explicit chaining: `set -e` is suppressed inside an if-condition (the
  # caller runs run_stage in one), so without || return a failed training
  # run would fall through and overwrite results.json from a stale ckpt
  python main.py --config-file "$config" \
    trainer.version "$version" trainer.seed "$seed" || return 1
  local ckpt
  ckpt="$(python tools/best_ckpt.py "logs/SurfaceFormer/${version}")" || return 1
  python main.py --config-file "$config" \
    --test_ckpt "$ckpt" \
    trainer.version "$version" trainer.seed "$seed" || return 1
}

for stage in "$@"; do
  echo "=== stage ${stage} start $(date -u +%H:%M:%S)"
  # a transient device/tunnel failure in one stage must not kill the queue
  if run_stage "${stage}"; then
    echo "=== stage ${stage} done $(date -u +%H:%M:%S)"
  else
    echo "=== stage ${stage} FAILED $(date -u +%H:%M:%S)"
  fi
done
