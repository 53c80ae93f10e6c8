"""Training/eval harness: the Lightning-module replacement.

Covers the reference Trainer's whole surface (faceformer/trainer.py:16-300):
train/valid/test loops, pointer CE loss, face metrics, prediction JSON dump,
Adam + optional StepLR, NaN-step skipping, checkpoint top-k — re-built
around jitted steps on a device mesh:
  - ONE compiled train step (static shapes; batch sharded over `data`);
  - ONE compiled decode step per eval config (pad_to_full batching);
  - NaN-loss steps keep the previous params on-device (no host sync);
  - metrics are host-side set arithmetic fed by a single device->host copy.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from faceformer_tpu.config import Config
from faceformer_tpu.data.batching import iter_batches
from faceformer_tpu.data.dataset import ABCDataset, ABCDatasetParallel
from faceformer_tpu.models import MODEL_REGISTRY
from faceformer_tpu.parallel.mesh import (
    make_mesh, shard_batch, shard_global_batch, shard_opt_state, shard_params)
from faceformer_tpu.train.checkpoint import CheckpointManager, load_checkpoint
from faceformer_tpu.train.logging import MetricsLogger
from faceformer_tpu.train.loss import pointer_cross_entropy
from faceformer_tpu.train.metrics import FaceMetrics

DATASET_REGISTRY = {
    "ABCDataset": ABCDataset,
    "ABCDataset_Parallel": ABCDatasetParallel,
    "ABCDatasetParallel": ABCDatasetParallel,
}


class NumpyJSONEncoder(json.JSONEncoder):
    """JSON encoder for numpy scalars/arrays (reference uses the
    numpyencoder package, trainer.py:135-136)."""

    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        return super().default(obj)


def _device_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    return {k: v for k, v in batch.items() if not isinstance(v, (list, str))}


def _prefetch_to_device(batches, put):
    """Lookahead-1 device prefetch: the NEXT batch's host->device transfer
    (async under jax.device_put) is issued before the current batch's step
    result is consumed, so the copy overlaps compute. At the `ours` dims a
    batch-32 upload is ~4 MB — a material fraction of the 0.48 s step on a
    network-tunneled device if left synchronous."""
    it = iter(batches)
    try:
        nxt = put(next(it))
    except StopIteration:
        return
    for batch in it:
        cur = nxt
        nxt = put(batch)
        yield cur
    yield nxt


class Harness:
    def __init__(self, cfg: Config, datasets: Optional[Dict[str, Any]] = None):
        self.cfg = cfg
        self.model = MODEL_REGISTRY[cfg.model_class]
        self.dataset_cls = DATASET_REGISTRY[cfg.dataset_class]
        self.mesh = make_mesh(cfg.trainer.num_devices)
        self.metrics_engine = FaceMetrics(cfg.post_process, cfg.model.token)
        self.log_dir = os.path.join("logs", cfg.trainer.name, cfg.trainer.version)
        self._datasets = datasets or {}
        self._decode_fn = None
        self._train_step = None
        self._opt = None

    # -- data ------------------------------------------------------------------

    def dataset(self, split: str):
        if split not in self._datasets:
            splits = getattr(self.cfg, f"datasets_{split}")
            self._datasets[split] = self.dataset_cls(
                self.cfg.root_dir, list(splits), self.cfg.model)
        return self._datasets[split]

    # -- state -----------------------------------------------------------------

    def init_state(self, seed: Optional[int] = None) -> Dict[str, Any]:
        seed = self.cfg.trainer.seed if seed is None else seed
        params = self.model.init(jax.random.PRNGKey(seed), self.cfg.model)
        params = shard_params(params, self.mesh)
        opt_state = self.optimizer.init(params)
        return {"params": params, "opt_state": opt_state, "epoch": 0, "step": 0}

    @property
    def optimizer(self) -> optax.GradientTransformation:
        if self._opt is None:
            tr = self.cfg.trainer
            if tr.lr_step > 0:
                # StepLR(gamma=0.1) stepped per epoch (reference
                # trainer.py:141-149; PL steps schedulers each epoch)
                def schedule(epoch):
                    return tr.lr * (0.1 ** (epoch // tr.lr_step))

                self._epoch_schedule = schedule
                self._opt = optax.inject_hyperparams(optax.adam)(learning_rate=tr.lr)
            else:
                self._epoch_schedule = None
                self._opt = optax.adam(tr.lr)
        return self._opt

    # -- compiled steps ---------------------------------------------------------

    def train_step(self):
        if self._train_step is not None:
            return self._train_step
        model, cfg = self.model, self.cfg
        opt = self.optimizer

        def step(params, opt_state, batch, rng):
            def loss_fn(p):
                out = model.forward_train(
                    p, cfg.model, batch, rng=rng, precision=cfg.trainer.precision,
                    scheduled_sampling_ratio=cfg.trainer.scheduled_sampling)
                return pointer_cross_entropy(out, cfg.model.token)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt_state = opt.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # NaN-loss steps are skipped (reference trainer.py:87-88), but
            # on-device: keep the previous params/opt state
            ok = jnp.isfinite(loss)
            new_params = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_params, params)
            new_opt_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_opt_state, opt_state)
            return new_params, new_opt_state, loss, aux["cls_acc"]

        self._train_step = jax.jit(step, donate_argnums=(0, 1))
        return self._train_step

    def decode_fn(self):
        if self._decode_fn is None:
            model, cfg = self.model, self.cfg
            mode = cfg.decode.mode
            if mode == "fused" and not getattr(model, "is_parallel", False):
                # the flat model has no fused engine; route to its XLA
                # KV-cache engine (per-row EOS retirement keeps grids
                # shard/batch-invariant there, decode.py)
                mode = "causal_cache"
            if mode == "fused" and self.mesh.shape["model"] > 1:
                # the fused kernel holds whole attention rows; it cannot
                # split the feature dim over a tensor-parallel axis — fall
                # back to the equivalent XLA engine (same token grids)
                print("decode.mode=fused does not partition over a model "
                      "axis; using causal_cache")
                mode = "causal_cache"

            def decode(params, batch):
                kwargs = {}
                if getattr(model, "is_parallel", False):
                    kwargs["anchor_mode"] = cfg.decode.anchor_mode
                return model.forward_eval(
                    params, cfg.model, batch, precision=cfg.decode.precision,
                    mode=mode, **kwargs)["predict"]

            if mode == "fused" and self.mesh.devices.size > 1:
                # multi-device fused decode: shard_map over the data axis —
                # each device runs the whole Pallas step on its batch shard
                # (the kernel grid is already per-sample-block). Retired-row
                # grids are invariant to per-shard early stop (decode.py),
                # so outputs equal the single-device engine exactly.
                from jax.sharding import PartitionSpec as P

                mesh = self.mesh

                def sharded(params, batch):
                    in_specs = (jax.tree.map(lambda _: P(), params),
                                jax.tree.map(lambda _: P("data"), batch))
                    return jax.shard_map(
                        decode, mesh=mesh, in_specs=in_specs,
                        out_specs=P("data"), check_vma=False)(params, batch)

                self._decode_fn = jax.jit(sharded)
            else:
                self._decode_fn = jax.jit(decode)
        return self._decode_fn

    # -- loops -------------------------------------------------------------------

    def fit(self, state: Optional[Dict[str, Any]] = None,
            max_epochs: Optional[int] = None) -> Dict[str, Any]:
        cfg = self.cfg
        state = state or self.init_state()
        # multi-process runs: the train state is replicated (every host
        # computes identical values), so exactly one process writes logs
        # and checkpoints — concurrent writers would race on the same files
        is_writer = jax.process_index() == 0
        logger = MetricsLogger(self.log_dir) if is_writer else None
        ckpts = CheckpointManager(
            os.path.join(self.log_dir, "checkpoints"),
            top_k=cfg.trainer.save_top_k) if is_writer else None
        train_ds = self.dataset("train")
        step_fn = self.train_step()
        impl = {"threefry": "threefry2x32"}.get(
            cfg.trainer.rng_impl, cfg.trainer.rng_impl)
        rng = jax.random.key(cfg.trainer.seed + 1, impl=impl)
        max_epochs = max_epochs or cfg.trainer.max_epochs

        params, opt_state = state["params"], state["opt_state"]
        step = state["step"]
        pending = None  # (step, loss, acc) of the previous step, still on device

        def flush_pending(clear: bool = False):
            # lag-1 logging: the previous step's scalars are fetched after
            # the next step is dispatched, so the device->host sync overlaps
            # compute (a per-step blocking float() serializes the loop —
            # costly on network-tunneled devices)
            nonlocal pending
            if pending is not None and pending[0] % cfg.trainer.log_every_n_steps == 0:
                if logger is not None:
                    logger.log_scalars(
                        pending[0],
                        {"train_loss": float(pending[1]),
                         "train_cls_acc": float(pending[2])})
                if clear:
                    pending = None
        for epoch in range(state["epoch"], max_epochs):
            if self._epoch_schedule is not None:
                opt_state.hyperparams["learning_rate"] = jnp.asarray(
                    self._epoch_schedule(epoch), dtype=jnp.float32)
            batches = iter_batches(
                train_ds, cfg.batch_size_train, shuffle=True, drop_last=True,
                seed=cfg.trainer.seed, epoch=epoch,
                # multi-host (DCN) data striping: each process loads a
                # disjoint stripe of the same global permutation and
                # contributes batch_size_train PER-HOST rows to the global
                # batch (shard_batch assembles them via
                # make_array_from_process_local_data); a no-op in
                # single-process runs
                process_index=jax.process_index(),
                process_count=jax.process_count())
            for device_batch in _prefetch_to_device(
                    batches,
                    lambda b: shard_batch(_device_batch(b), self.mesh)):
                rng, sub = jax.random.split(rng)
                params, opt_state, loss, acc = step_fn(
                    params, opt_state, device_batch, sub)
                step += 1
                flush_pending()
                pending = (step, loss, acc)
            flush_pending(clear=True)
            state.update(params=params, opt_state=opt_state, epoch=epoch + 1, step=step)
            tree = {"params": params, "opt_state": opt_state,
                    "epoch": jnp.int32(epoch + 1), "step": jnp.int32(step)}
            # checkpoint on validation epochs plus the final epoch — the
            # reference's cadence (ModelCheckpoint every_n_val_epochs=1 with
            # check_val_every_n_epoch=checkpoint_period, main.py:31-37,75).
            # Saving every epoch pulls the full param+opt tree device->host;
            # on the tunneled TPU that cost 52 s against a 2.6 s epoch.
            if (epoch + 1) % cfg.trainer.checkpoint_period == 0:
                # validate is a collective (every process decodes its rows
                # and joins the metric allreduce); only the writer saves
                results = self.validate(params, logger=logger, step=step)
                if is_writer:
                    ckpts.save(tree, cfg, epoch + 1,
                               metric_value=results["valid_precision"])
            elif epoch + 1 == max_epochs and is_writer:
                ckpts.save(tree, cfg, epoch + 1)
        if logger is not None:
            logger.close()
        return state

    def _eval_batches(self, split: str):
        ds = self.dataset(split)
        batch_size = min(self.cfg.batch_size_valid, max(len(ds), 1))
        # round batch to a multiple of the data axis for even sharding
        data_axis = self.mesh.shape["data"]
        batch_size = max(data_axis, (batch_size // data_axis) * data_axis)
        items = ds
        if self.cfg.decode.sort_eval:
            # complexity-sorted batches: each batch decodes until its
            # deepest row retires, so grouping similar edge counts cuts
            # wasted steps (measured ratio: benchmarks/serving.json,
            # latest full-split window). Samples keep their `id`, so
            # raw-data lookups and prediction JSONs are unaffected.
            order = sorted(range(len(ds)), key=lambda i: ds[i]["num_input"])
            items = [ds[i] for i in order]
        return ds, iter_batches(items, batch_size, pad_to_full=True)

    # -- multi-process eval plumbing ------------------------------------------------
    #
    # Every host iterates the SAME eval batches (the split is on every
    # host's disk); shard_global_batch has each process contribute its own
    # row slice, decode runs as one global SPMD program, each host pulls
    # back only ITS rows (its addressable shards) and scores them, and the
    # final means are allreduced. Single-process runs take the plain path.

    @staticmethod
    def _local_rows(out_grid, n: int):
        """Pull this process's rows of a data-sharded decode output:
        (predict_rows, row_slice). All rows in single-process runs."""
        if jax.process_count() == 1:
            return np.asarray(out_grid), slice(0, n)
        shards = sorted(out_grid.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        local = np.concatenate([np.asarray(s.data) for s in shards])
        per = n // jax.process_count()
        start = jax.process_index() * per
        return local, slice(start, start + per)

    def _eval_decode(self, decode, params, batch):
        """Decode one eval batch; returns (predict_rows, row_slice) local
        to this process — all rows in single-process runs."""
        device_batch = shard_global_batch(_device_batch(batch), self.mesh)
        out = decode(params, device_batch)
        return self._local_rows(out, len(batch["sample_valid"]))

    @staticmethod
    def _global_mean(values: List[float]) -> float:
        """Mean over all processes' per-sample values. Collective: every
        process must call it the same number of times in the same order."""
        if jax.process_count() == 1:
            return float(np.mean(values)) if values else 0.0
        from jax.experimental import multihost_utils

        part = np.array([np.sum(values), len(values)], np.float64)
        total = np.asarray(multihost_utils.process_allgather(part)).sum(axis=0)
        return float(total[0] / total[1]) if total[1] else 0.0

    @staticmethod
    def _global_sum(value: float) -> float:
        if jax.process_count() == 1:
            return float(value)
        from jax.experimental import multihost_utils

        part = np.array([value], np.float64)
        return float(np.asarray(multihost_utils.process_allgather(part)).sum())

    def validate(self, params, logger: Optional[MetricsLogger] = None,
                 step: int = 0) -> Dict[str, float]:
        """Validation loop (reference: trainer.py:91-102)."""
        ds, batches = self._eval_batches("valid")
        decode = self.decode_fn()
        agg: Dict[str, List[float]] = {}
        text_dumps = 0
        for batch in batches:
            predict, rows = self._eval_decode(decode, params, batch)
            raw = [ds.raw_datas[i] for i in batch["id"][rows]]
            out = self.metrics_engine.evaluate_batch(
                predict, np.asarray(batch["label"])[rows], raw,
                batch["sample_valid"][rows])
            for key in ("precision", "recall", "type_acc", "accuracy",
                        "type_acc_coedge_seq"):
                agg.setdefault(key, []).extend(out[key])
            if logger is not None and text_dumps < 4:
                # qualitative pred-vs-label dumps (reference trainer.py:100-101)
                for pred, label, prec in zip(out["predictions"], out["labels"],
                                             out["precision"]):
                    logger.log_text(
                        "result",
                        f"pred: {pred} \n\n label: {label} \n\n precision: {prec}",
                        step + text_dumps)
                    text_dumps += 1
                    if text_dumps >= 4:
                        break
        results = {
            "valid_precision": self._global_mean(agg.get("precision", [])),
            "valid_recall": self._global_mean(agg.get("recall", [])),
            "valid_type_acc": self._global_mean(agg.get("type_acc", [])),
            "valid_accuracy": self._global_mean(agg.get("accuracy", [])),
            "valid_type_acc_coedge_seq": self._global_mean(
                agg.get("type_acc_coedge_seq", [])),
        }
        if logger is not None:
            logger.log_scalars(step, results)
        if jax.process_index() == 0:
            print(" ".join(f"{k}={v:.4f}" for k, v in results.items()))
        return results

    def test(self, params, json_dir: Optional[str] = None) -> Dict[str, float]:
        """Test loop: metrics + per-sample prediction JSONs + decode timing
        (reference: trainer.py:105-136)."""
        ds, batches = self._eval_batches("test")
        decode = self.decode_fn()
        json_dir = json_dir or os.path.join(self.log_dir, "json")
        os.makedirs(json_dir, exist_ok=True)

        agg: Dict[str, List[float]] = {}
        total_time, sample_count = 0.0, 0
        warmed = False
        for batch in batches:
            device_batch = shard_global_batch(_device_batch(batch), self.mesh)
            if not warmed:
                # untimed warm-up on the first batch: the first call pays
                # XLA compilation (tens of seconds at flagship dims) plus
                # the tunneled device's cold-stream settle — timing it
                # would inflate avg_time_per_sample by an order of
                # magnitude (all batches share one static shape, so one
                # compile serves the whole loop)
                jax.block_until_ready(decode(params, device_batch))
                warmed = True
            t0 = time.perf_counter()
            out_grid = jax.block_until_ready(decode(params, device_batch))
            total_time += time.perf_counter() - t0
            predict, rows = self._local_rows(out_grid, len(batch["sample_valid"]))
            sample_valid = batch["sample_valid"][rows]
            sample_count += int(np.sum(sample_valid))

            raw = [ds.raw_datas[i] for i in batch["id"][rows]]
            out = self.metrics_engine.evaluate_batch(
                predict, np.asarray(batch["label"])[rows], raw, sample_valid)
            for key in ("precision", "recall", "type_acc"):
                agg.setdefault(key, []).extend(out[key])

            names = batch["name"][rows.start:rows.stop]
            valid_idx = [i for i, ok in enumerate(sample_valid) if ok]
            for res_i, batch_i in enumerate(valid_idx):
                name = os.path.splitext(os.path.basename(names[batch_i]))[0]
                record = {
                    "edges": raw[batch_i]["edges"],
                    "dominant_directions": raw[batch_i]["dominant_directions"],
                    "pred_faces": out["predictions"][res_i],
                    "label_faces": out["labels"][res_i],
                }
                with open(os.path.join(json_dir, f"{name}.json"), "w") as f:
                    json.dump(record, f, cls=NumpyJSONEncoder)

        global_count = int(self._global_sum(sample_count))
        results = {
            "test_precision": self._global_mean(agg.get("precision", [])),
            "test_recall": self._global_mean(agg.get("recall", [])),
            "test_type_acc": self._global_mean(agg.get("type_acc", [])),
            # wall time covers the GLOBAL step on every host (decode is one
            # collective SPMD program), so divide by the global sample count
            "avg_time_per_sample": total_time / max(global_count, 1),
            "num_samples": global_count,
        }
        if jax.process_index() == 0:
            print("Avg Time", results["avg_time_per_sample"], "seconds.")
            print(" ".join(f"{k}={v:.4f}" for k, v in results.items()
                           if k != "num_samples"))
            # persist: results.json + metrics.jsonl, so quality claims are
            # auditable from checked-in artifacts (not just stdout)
            os.makedirs(self.log_dir, exist_ok=True)
            with open(os.path.join(self.log_dir, "results.json"), "w") as f:
                json.dump(results, f, indent=2)
            logger = MetricsLogger(self.log_dir)
            logger.log_scalars(0, {k: v for k, v in results.items()})
            logger.close()
        return results

    # -- checkpoints ---------------------------------------------------------------

    def load(self, path: str) -> Dict[str, Any]:
        like = self.init_state()
        if path.endswith((".ckpt", ".pt", ".pth")):
            from faceformer_tpu.train.checkpoint import load_torch_checkpoint

            params = load_torch_checkpoint(
                path, self.cfg.model.num_encoder_layers,
                self.cfg.model.num_decoder_layers)
            params = jax.tree.map(jnp.asarray, params)
            like["params"] = shard_params(params, self.mesh)
            return like
        state, _ = load_checkpoint(
            path, {"params": like["params"], "opt_state": like["opt_state"]})
        state["epoch"] = int(state.get("epoch", 0))
        state["step"] = int(state.get("step", 0))
        # the restore yields HOST numpy arrays; without an explicit
        # device_put every jitted call re-uploads the full tree (measured
        # 3.45 s vs 79 ms per eval batch on the tunneled TPU). The opt
        # state shards with the params' specs, not a bare device_put, so
        # resumed multi-device runs don't replicate it (HBM + reshard cost)
        state["params"] = shard_params(state["params"], self.mesh)
        state["opt_state"] = shard_opt_state(
            state["opt_state"], state["params"], self.mesh)
        like.update(state)
        return like
