"""Print the best checkpoint path for a log dir (top-1 by valid_precision,
falling back to `last`). Used by tools/train_demos.sh to chain train->test."""

import json
import os
import sys


def best_ckpt(log_dir: str) -> str:
    ckpt_dir = os.path.abspath(os.path.join(log_dir, "checkpoints"))
    index = os.path.join(ckpt_dir, "index.json")
    with open(index) as f:
        idx = json.load(f)
    # checkpoint weights are gitignored, so an index carried across a round
    # boundary can list entries whose data dirs no longer exist — only pick
    # checkpoints that are actually restorable. Entries were written into
    # this same checkpoints/ directory, so resolve them by basename against
    # it (index paths are relative to the training run's cwd, which need
    # not be ours).
    live = [e for e in idx.get("top", ())
            if os.path.isdir(os.path.join(ckpt_dir, os.path.basename(e[1])))]
    if live:
        best = max(live, key=lambda e: (e[0], e[2] if len(e) > 2 else 0))[1]
        return os.path.join(ckpt_dir, os.path.basename(best))
    return os.path.join(ckpt_dir, os.path.basename(idx["last"]))


if __name__ == "__main__":
    print(best_ckpt(sys.argv[1]))
