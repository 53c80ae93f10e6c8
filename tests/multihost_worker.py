"""Subprocess worker for the multi-process (multi-host) training test.

Runs the REAL Harness.fit path under jax.distributed with N processes x
2 virtual CPU devices each: per-host stripe loading (data/batching.py),
global-batch assembly via make_array_from_process_local_data
(parallel/mesh.shard_batch), writer-gated logging/checkpointing, and the
unscored multi-process checkpoint cadence.

    python tests/multihost_worker.py <proc_id> <nprocs> <port> <data_root> \
        <log_name> <log_version> <local_devices> <batch_per_host>

Not a pytest module (no test_ prefix); launched by tests/test_multiprocess.py.
"""

import os
import sys


def main() -> None:
    (proc_id, nprocs, port, data_root, name, version,
     local_devices, batch_per_host) = sys.argv[1:9]
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    if int(nprocs) > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=int(nprocs), process_id=int(proc_id))

    from faceformer_tpu.config import load_config
    from faceformer_tpu.train.trainer import Harness

    cfg = load_config(opts=[
        "model_class", "SurfaceFormer_Parallel",
        "dataset_class", "ABCDataset_Parallel",
        "root_dir", data_root,
        "batch_size_train", batch_per_host,  # PER-HOST rows
        "batch_size_valid", batch_per_host,
        "trainer.name", name, "trainer.version", version,
        "trainer.max_epochs", "1", "trainer.checkpoint_period", "1",
        "trainer.lr", "1e-3", "trainer.precision", "fp32",
        "model.num_lines", "64", "model.max_num_faces", "16",
        "model.max_face_length", "16",
        "model.num_model", "64", "model.num_head", "4",
        "model.num_feedforward", "128",
        "model.num_encoder_layers", "1", "model.num_decoder_layers", "1",
        "model.dropout", "0.0",    # keep losses order-invariant across runs
    ])
    harness = Harness(cfg)
    state = harness.fit()  # checkpoint_period=1 -> multi-process validate runs
    results = harness.test(state["params"])  # multi-process test loop
    print("TEST_RESULTS "
          + f"{results['test_precision']:.6f} {results['test_recall']:.6f} "
          + f"{results['num_samples']}", flush=True)
    print(f"WORKER_OK proc={proc_id} global_devices={jax.device_count()}",
          flush=True)
    if int(nprocs) > 1:
        # the atexit shutdown barrier has a short deadline; the writer
        # process (proc 0) trails the others by its checkpoint/log tail,
        # which under host load can exceed it and fail the whole run with
        # DEADLINE_EXCEEDED. Sync on the (deadline-free) collective path
        # first so every process enters the shutdown barrier together.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("worker_done")
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
