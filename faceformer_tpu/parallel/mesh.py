"""Mesh construction and sharding rules.

Data parallelism: batches shard over the `data` axis; gradients all-reduce
over ICI automatically through sharding propagation.

Tensor parallelism (optional, for scale-out headroom): attention QKV/out
projections and FFN hidden dims shard over the `model` axis — the standard
Megatron split expressed as PartitionSpecs; XLA inserts the all-reduces.
The shipped 512-dim models don't need TP, but the specs make the same code
scale to wider variants (design requirement from the rebuild plan).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, model_axis: int = 1) -> Mesh:
    """1- or 2-axis mesh over the first num_devices local devices.

    model_axis > 1 carves a tensor-parallel axis out of the device count.
    """
    devices = jax.devices()
    n = num_devices if num_devices > 0 else len(devices)
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    grid = np.asarray(devices[:n]).reshape(n // model_axis, model_axis)
    return Mesh(grid, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over `data`."""
    return NamedSharding(mesh, P("data"))


def _attn_specs(shard_model: bool) -> Dict[str, P]:
    if not shard_model:
        return {k: P() for k in ("wq", "wk", "wv", "wo", "bq", "bk", "bv", "bo")}
    # Megatron split: QKV column-parallel (heads over `model`),
    # output row-parallel
    return {
        "wq": P(None, "model"), "wk": P(None, "model"), "wv": P(None, "model"),
        "bq": P("model"), "bk": P("model"), "bv": P("model"),
        "wo": P("model", None), "bo": P(),
    }


def _layer_specs(layer: Dict[str, Any], shard_model: bool) -> Dict[str, Any]:
    specs: Dict[str, Any] = {}
    for name, sub in layer.items():
        if name in ("self_attn", "cross_attn"):
            specs[name] = _attn_specs(shard_model)
        elif name == "ffn":
            if shard_model:
                specs[name] = {
                    "lin1": {"w": P(None, "model"), "b": P("model")},
                    "lin2": {"w": P("model", None), "b": P()},
                }
            else:
                specs[name] = jax.tree.map(lambda _: P(), sub)
        else:  # norms
            specs[name] = jax.tree.map(lambda _: P(), sub)
    return specs


def param_partition_specs(params: Dict[str, Any], shard_model: bool = False) -> Dict[str, Any]:
    """PartitionSpec tree matching the model parameter tree.

    Stacked layer params get their layer axis prepended (replicated — layers
    are scanned, not pipelined, at this scale)."""

    def prepend_layer_axis(spec_tree):
        return jax.tree.map(lambda s: P(None, *s), spec_tree,
                            is_leaf=lambda x: isinstance(x, P))

    specs: Dict[str, Any] = {}
    for name, sub in params.items():
        if name in ("encoder", "decoder"):
            specs[name] = {
                "layers": prepend_layer_axis(_layer_specs(sub["layers"], shard_model)),
                "norm": jax.tree.map(lambda _: P(), sub["norm"]),
            }
        elif name == "project":
            specs[name] = (
                {"w": P(None, "model"), "b": P("model")} if shard_model
                else jax.tree.map(lambda _: P(), sub)
            )
        else:
            specs[name] = jax.tree.map(lambda _: P(), sub)
    return specs


def shard_params(params, mesh: Mesh, shard_model: bool = False):
    specs = param_partition_specs(params, shard_model)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs, is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(params, shardings)


def shard_opt_state(opt_state, params, mesh: Mesh, shard_model: bool = False):
    """Place a restored optimizer state on the mesh with the SAME partition
    specs as the parameters it mirrors (Adam's mu/nu are param-shaped;
    counts/hyperparams replicate). A bare device_put would replicate the
    whole state, costing HBM and a per-step reshard on multi-device meshes.
    """
    specs = param_partition_specs(params, shard_model)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs, is_leaf=lambda x: isinstance(x, P))
    pstruct = jax.tree.structure(params)
    repl = replicated(mesh)

    def is_param_tree_or_leaf(node):
        if isinstance(node, (jax.Array, np.ndarray)):
            return True
        try:
            return jax.tree.structure(node) == pstruct
        except Exception:
            return False

    def place(node):
        if isinstance(node, (jax.Array, np.ndarray)):
            return jax.device_put(node, repl)
        try:
            if jax.tree.structure(node) == pstruct:
                return jax.device_put(node, shardings)  # param-shaped subtree
        except Exception:
            pass
        # scalar / non-param leaf (e.g. a Python hyperparameter): replicate
        # rather than crash against the param-spec tree
        return jax.device_put(node, repl)

    return jax.tree.map(place, opt_state, is_leaf=is_param_tree_or_leaf)


def shard_global_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Move a batch every host holds IN FULL onto the mesh (eval loops: all
    hosts iterate the same split). Each process contributes its own row
    slice as the process-local block, so the assembled global array equals
    the host batch bit-for-bit. Row count must divide evenly by the process
    count (eval batch sizes are rounded to the data-axis width, which is a
    multiple of it)."""
    pc, pi = jax.process_count(), jax.process_index()
    if pc == 1:
        return shard_batch(batch, mesh)
    sh = batch_sharding(mesh)
    out = {}
    for key, val in batch.items():
        if isinstance(val, (list, str)):
            out[key] = val
        else:
            arr = np.asarray(val)
            per = arr.shape[0] // pc
            out[key] = jax.make_array_from_process_local_data(
                sh, arr[pi * per:(pi + 1) * per])
    return out


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Move a host batch onto the mesh, batch axis over `data`. Non-array
    fields (names) stay on host.

    Multi-process meshes treat the host batch as PROCESS-LOCAL data: the
    global batch is the concatenation of every host's stripe
    (jax.make_array_from_process_local_data). A bare device_put would
    instead interpret each host's different stripe as THE global value —
    every host keeps only the row positions it owns from its own batch,
    silently discarding (P-1)/P of the loaded rows."""
    sh = batch_sharding(mesh)
    local = jax.process_count() > 1
    out = {}
    for key, val in batch.items():
        if isinstance(val, (list, str)):
            out[key] = val
        elif local:
            out[key] = jax.make_array_from_process_local_data(
                sh, np.asarray(val))
        else:
            out[key] = jax.device_put(np.asarray(val), sh)
    return out
