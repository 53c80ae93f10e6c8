"""Checkpointing: Orbax trees + top-k management + PyTorch ckpt conversion.

Replaces PyTorch-Lightning's ModelCheckpoint (reference: main.py:31-37 —
save_last, top-2 by valid_precision). Unlike the reference, config travels
as a JSON sidecar, not baked into the checkpoint, which removes the
documented root_dir override gotcha (reference README.md:64-66).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from faceformer_tpu.config import Config, config_from_dict, config_to_dict


class CheckpointManager:
    """save-last + keep-top-k-by-metric checkpoint directory manager."""

    def __init__(self, directory: str, top_k: int = 2, metric: str = "valid_precision",
                 tie_refresh_epochs: int = 8):
        self.directory = directory
        self.top_k = top_k
        self.metric = metric
        # on an exact metric tie, refresh the newest tied checkpoint only
        # when it is at least this many epochs stale: keeps the
        # prefer-newer-on-ties policy (bounded staleness) without paying a
        # duplicate top-k DISK write every validation epoch once the metric
        # saturates (e.g. precision pinned at 1.0). Note the device->host
        # pull itself still happens every save() call — it serves the
        # unconditional 'last' write
        self.tie_refresh_epochs = tie_refresh_epochs
        os.makedirs(directory, exist_ok=True)
        self._index_path = os.path.join(directory, "index.json")
        self._index: Dict[str, Any] = {"top": [], "last": None}
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._index = json.load(f)
            # checkpoint weights are large and gitignored, so an index
            # resumed across an environment boundary can list entries whose
            # data dirs no longer exist (only the small .meta.json sidecars
            # survive in git) — restoring such an entry is a guaranteed
            # FileNotFoundError. Drop them, and their orphaned sidecars.
            # Entries are written into this manager's own directory
            # (save() joins self.directory), so resolve them against the
            # index file's directory rather than cwd or the package
            # location — both of which differ from the write-time base
            # when training ran from another cwd or the package is
            # installed.
            index_dir = os.path.dirname(os.path.abspath(self._index_path))

            def _resolve(path: str) -> str:
                if os.path.isabs(path):
                    return path
                return os.path.join(index_dir, os.path.basename(path))

            live, stale = [], []
            for e in self._index.get("top", []):
                (live if os.path.isdir(_resolve(e[1])) else stale).append(e)
            if stale:
                self._index["top"] = live
                for e in stale:
                    full = _resolve(e[1])
                    if os.path.exists(full + ".meta.json"):
                        os.remove(full + ".meta.json")
                with open(self._index_path, "w") as f:
                    json.dump(self._index, f, indent=1)

    # -- low-level tree io ---------------------------------------------------
    #
    # Opt states (optax namedtuples) are flattened to keyed leaves before the
    # orbax save and rebuilt against the caller's tree structure on restore.
    # Restores never pass a target tree: StandardCheckpointer's targeted
    # restore deadlocks once the axon TPU backend is initialized (verified on
    # this platform); the untargeted PyTreeCheckpointer path is safe.

    @staticmethod
    def _freeze(tree: Dict[str, Any]) -> Dict[str, Any]:
        out = dict(tree)
        if "opt_state" in out:
            leaves = jax.tree.leaves(out.pop("opt_state"))
            out["opt_state_leaves"] = {f"{i:05d}": leaf for i, leaf in enumerate(leaves)}
        return out

    @staticmethod
    def _thaw(tree: Dict[str, Any], like: Optional[Dict[str, Any]]) -> Dict[str, Any]:
        out = dict(tree)
        flat = out.pop("opt_state_leaves", None)
        if flat is not None and like is not None and "opt_state" in like:
            leaves = [flat[k] for k in sorted(flat)]
            out["opt_state"] = jax.tree.unflatten(
                jax.tree.structure(like["opt_state"]), leaves)
        elif "opt_state" in out and like is not None and "opt_state" in like:
            # legacy nested-dict save: leaf order matches sorted-key flatten
            out["opt_state"] = jax.tree.unflatten(
                jax.tree.structure(like["opt_state"]), jax.tree.leaves(out["opt_state"]))
        return out

    @staticmethod
    def save_tree(path: str, tree: Dict[str, Any], frozen: bool = False) -> None:
        import orbax.checkpoint as ocp

        if not frozen:
            tree = jax.tree.map(np.asarray, CheckpointManager._freeze(tree))
        if jax.process_count() > 1:
            # multi-process runs: the manager lives on the writer process
            # only (trainer.fit gates it), so scope orbax's coordination
            # barriers to THIS process — the default checkpointer blocks on
            # a cross-process barrier the non-writers never join (verified:
            # a lone-writer PyTreeCheckpointer.save hangs under
            # jax.distributed). Same on-disk format either way.
            opts = ocp.options.MultiprocessingOptions(
                primary_host=jax.process_index(),
                active_processes={jax.process_index()})
            with ocp.Checkpointer(ocp.PyTreeCheckpointHandler(),
                                  multiprocessing_options=opts) as ckptr:
                ckptr.save(os.path.abspath(path), tree, force=True)
            return
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(path), tree, force=True)

    @staticmethod
    def restore_tree(path: str, like: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            raw = ckptr.restore(os.path.abspath(path))
        return CheckpointManager._thaw(raw, like)

    # -- manager API -----------------------------------------------------------

    def save(self, state: Dict[str, Any], cfg: Config, epoch: int,
             metric_value: Optional[float] = None) -> str:
        """Save `last` and, when metric_value ranks in the top-k, a scored
        checkpoint named epoch=N-<metric>=V (reference filename convention,
        main.py:33)."""
        meta = {"epoch": epoch, "config": config_to_dict(cfg),
                self.metric: metric_value}
        # one device->host pull serves both the `last` and top-k writes
        state = jax.tree.map(np.asarray, self._freeze(state))

        last_path = os.path.join(self.directory, "last")
        self._write(last_path, state, meta)
        self._index["last"] = last_path

        # Lightning save_top_k semantics: 0 disables scored saves, negative
        # keeps every scored checkpoint (reference main.py:31-37)
        if metric_value is not None and self.top_k != 0:
            name = f"epoch={epoch}-{self.metric}={metric_value:.4f}"
            path = os.path.join(self.directory, name)
            # entries are [metric, path, epoch]; legacy indexes carry
            # [metric, path] and read back with epoch 0
            entries = [tuple(e) + (0,) * (3 - len(e))
                       for e in self._index["top"]]
            # >= (not >): on metric ties, prefer the NEWER checkpoint — a
            # model that first touches the metric ceiling is often underfit
            # elsewhere (observed: precision 1.0 at epoch 30 with recall
            # 0.78 vs recall 0.99 at epoch 110). Exact ties refresh at most
            # every tie_refresh_epochs (see __init__).
            newest_tied = max((e[2] for e in entries if e[0] == metric_value),
                              default=None)
            tie_fresh = (newest_tied is not None
                         and epoch - newest_tied < self.tie_refresh_epochs)
            floor = min((e[0] for e in entries), default=None)
            if (self.top_k < 0
                    or len(entries) < self.top_k
                    or metric_value > floor
                    or (metric_value >= floor and not tie_fresh)):
                self._write(path, state, meta)
                entries.append((metric_value, path, epoch))
                entries.sort(key=lambda e: (-e[0], -e[2]))
                if self.top_k > 0:
                    for _, stale, _e in entries[self.top_k:]:
                        shutil.rmtree(stale, ignore_errors=True)
                        if os.path.exists(stale + ".meta.json"):
                            os.remove(stale + ".meta.json")
                    entries = entries[: self.top_k]
                self._index["top"] = entries
        with open(self._index_path, "w") as f:
            json.dump(self._index, f, indent=1)
        return self._index["last"]

    def _write(self, path: str, state: Dict[str, Any], meta: Dict) -> None:
        # write-then-rename: the save itself takes seconds at flagship dims
        # (device->host pull + orbax write), and deleting the old tree first
        # would leave NO usable checkpoint if the process dies mid-save —
        # early in training that makes the run unresumable
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        self.save_tree(tmp, state, frozen=True)
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, indent=1)

    def best_path(self) -> Optional[str]:
        return self._index["top"][0][1] if self._index["top"] else self._index["last"]


def load_checkpoint(path: str, like: Optional[Dict[str, Any]] = None):
    """Restore (state, meta). ``like`` provides the target tree structure."""
    state = CheckpointManager.restore_tree(path, like)
    meta_path = path.rstrip("/") + ".meta.json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


# ---------------------------------------------------------------------------
# PyTorch checkpoint conversion
# ---------------------------------------------------------------------------

# torch module-path fragments -> our tree (reference module names from
# faceformer/models/model.py + faceformer/transformer.py)


def convert_torch_state_dict(state_dict: Dict[str, Any], num_layers_enc: int,
                             num_layers_dec: int) -> Dict[str, Any]:
    """Convert a reference PyTorch state_dict to our parameter tree.

    Handles the Lightning 'model.' prefix, torch's (out, in) Linear layout
    (transposed here), and nn.MultiheadAttention's packed in_proj q/k/v
    stacking (reference ckpts store in_proj_weight as [Wq; Wk; Wv]).
    """

    def g(name: str) -> np.ndarray:
        for candidate in (name, "model." + name):
            if candidate in state_dict:
                return np.asarray(state_dict[candidate], dtype=np.float32)
        raise KeyError(f"missing parameter {name!r} in checkpoint")

    def lin(name: str) -> Dict[str, np.ndarray]:
        return {"w": g(name + ".weight").T, "b": g(name + ".bias")}

    def ln(name: str) -> Dict[str, np.ndarray]:
        return {"scale": g(name + ".weight"), "bias": g(name + ".bias")}

    def attn(name: str) -> Dict[str, np.ndarray]:
        in_w = g(name + ".in_proj_weight")
        in_b = g(name + ".in_proj_bias")
        e = in_w.shape[1]
        wq, wk, wv = in_w[:e], in_w[e : 2 * e], in_w[2 * e :]
        bq, bk, bv = in_b[:e], in_b[e : 2 * e], in_b[2 * e :]
        out = lin(name + ".out_proj")
        return {"wq": wq.T, "wk": wk.T, "wv": wv.T, "bq": bq, "bk": bk, "bv": bv,
                "wo": out["w"], "bo": out["b"]}

    def enc_layer(i: int) -> Dict[str, Any]:
        base = f"encoder.layers.{i}"
        return {
            "self_attn": attn(base + ".self_attn"),
            "norm1": ln(base + ".norm1"),
            "norm2": ln(base + ".norm2"),
            "ffn": {"lin1": lin(base + ".linear1"), "lin2": lin(base + ".linear2")},
        }

    def dec_layer(i: int) -> Dict[str, Any]:
        base = f"decoder.layers.{i}"
        return {
            "self_attn": attn(base + ".self_attn"),
            "cross_attn": attn(base + ".multihead_attn"),
            "norm1": ln(base + ".norm1"),
            "norm2": ln(base + ".norm2"),
            "norm3": ln(base + ".norm3"),
            "ffn": {"lin1": lin(base + ".linear1"), "lin2": lin(base + ".linear2")},
        }

    def stack(layers: List[Dict[str, Any]]) -> Dict[str, Any]:
        return jax.tree.map(lambda *xs: np.stack(xs), *layers)

    return {
        "embed": {
            "token_table": g("val_enc.embedding_token.weight"),
            "lin1": lin("val_enc.embedding_value.0"),
            "lin2": lin("val_enc.embedding_value.2"),
        },
        "pos_table": g("pos_enc.pos_embed.weight"),
        "query_pos_table": g("query_pos_enc.pos_embed.weight"),
        "encoder": {
            "layers": stack([enc_layer(i) for i in range(num_layers_enc)]),
            "norm": ln("encoder.norm"),
        },
        "decoder": {
            "layers": stack([dec_layer(i) for i in range(num_layers_dec)]),
            "norm": ln("decoder.norm"),
        },
        "project": lin("project"),
    }


def export_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of convert_torch_state_dict (our tree -> reference layout),
    used for round-trip testing and interop."""
    out: Dict[str, np.ndarray] = {}

    def a(name, arr):
        out["model." + name] = np.asarray(arr, dtype=np.float32)

    def put_lin(name, p):
        a(name + ".weight", np.asarray(p["w"]).T)
        a(name + ".bias", p["b"])

    def put_ln(name, p):
        a(name + ".weight", p["scale"])
        a(name + ".bias", p["bias"])

    def put_attn(name, p):
        a(name + ".in_proj_weight",
          np.concatenate([np.asarray(p["wq"]).T, np.asarray(p["wk"]).T,
                          np.asarray(p["wv"]).T], axis=0))
        a(name + ".in_proj_bias",
          np.concatenate([np.asarray(p["bq"]), np.asarray(p["bk"]), np.asarray(p["bv"])]))
        put_lin(name + ".out_proj", {"w": p["wo"], "b": p["bo"]})

    a("val_enc.embedding_token.weight", params["embed"]["token_table"])
    put_lin("val_enc.embedding_value.0", params["embed"]["lin1"])
    put_lin("val_enc.embedding_value.2", params["embed"]["lin2"])
    a("pos_enc.pos_embed.weight", params["pos_table"])
    a("query_pos_enc.pos_embed.weight", params["query_pos_table"])

    for side, extra in (("encoder", ()), ("decoder", ("norm3",))):
        stacked = params[side]["layers"]
        n = jax.tree.leaves(stacked)[0].shape[0]
        for i in range(n):
            lp = jax.tree.map(lambda x: x[i], stacked)
            base = f"{side}.layers.{i}"
            put_attn(base + ".self_attn", lp["self_attn"])
            if side == "decoder":
                put_attn(base + ".multihead_attn", lp["cross_attn"])
            put_ln(base + ".norm1", lp["norm1"])
            put_ln(base + ".norm2", lp["norm2"])
            for name in extra:
                put_ln(base + f".{name}", lp[name])
            put_lin(base + ".linear1", lp["ffn"]["lin1"])
            put_lin(base + ".linear2", lp["ffn"]["lin2"])
        put_ln(f"{side}.norm", params[side]["norm"])
    put_lin("project", params["project"])
    return out


def load_torch_checkpoint(path: str, num_layers_enc: int, num_layers_dec: int):
    """Load a reference .ckpt (Lightning) or .pt state_dict file and convert."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    state_dict = {k: v.numpy() if hasattr(v, "numpy") else v
                  for k, v in state_dict.items()}
    return convert_torch_state_dict(state_dict, num_layers_enc, num_layers_dec)
