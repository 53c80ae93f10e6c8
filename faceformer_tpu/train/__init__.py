"""Training/eval harness: loss, metrics, optimizer, checkpoints, loops."""
