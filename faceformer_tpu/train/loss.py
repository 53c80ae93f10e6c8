"""Pointer cross-entropy loss + token accuracy.

Contract (reference: faceformer/trainer.py:60-80 compute_loss):
  - logits = embedding @ pointer^T over every memory row (the class axis is
    the 4+L memory positions; NO padding mask is applied to the logits);
  - cross-entropy ignoring PAD labels, summed then divided by the number of
    non-PAD labels;
  - token accuracy over non-PAD positions.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from faceformer_tpu.config import TokenConfig


def pointer_cross_entropy(
    outputs: Dict[str, jnp.ndarray], token: TokenConfig
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Compute (loss, aux) from a forward_train output dict.

    outputs: embedding (N, S, E), pointer (N, ..., E), label (N, ...).
    Works for both the flat model (pointer (N, T, E)) and the parallel model
    (pointer (N, F, T, E)) — trailing axes are flattened.
    """
    # operands keep their compute dtype (bf16 in training): the logits GEMM
    # accumulates in fp32 either way, and bf16 x bf16 products are exact in
    # fp32 — upcasting first only doubled the GEMM's HBM traffic
    memory = outputs["embedding"]
    pointer = outputs["pointer"]
    labels = outputs["label"].astype(jnp.int32)

    n, s = memory.shape[0], memory.shape[1]
    pointer2 = pointer.reshape(n, -1, pointer.shape[-1])  # (N, R, E)
    labels2 = labels.reshape(n, -1)  # (N, R)

    # (N, R, S) logits over memory rows; fp32 accumulation
    logits = jnp.einsum("nre,nse->nrs", pointer2, memory,
                        preferred_element_type=jnp.float32)

    valid = labels2 != token.PAD
    # CE as logsumexp - picked_logit, with picked selected by a one-hot
    # compare instead of take_along_axis: the gather's backward lowers to a
    # scatter over the (N, R, S) logits, which serializes on TPU (measured
    # 25x the rest of the backward at flagship dims); the one-hot select's
    # backward is an elementwise mask
    onehot = labels2[..., None] == jnp.arange(s, dtype=labels2.dtype)
    picked = jnp.sum(jnp.where(onehot, logits, 0.0), axis=-1)
    logz = jax.nn.logsumexp(logits, axis=-1)
    valid_sum = valid.sum()
    loss = ((logz - picked) * valid).sum() / valid_sum

    pred = jnp.argmax(logits, axis=-1)
    acc_sum = (valid & (pred == labels2)).sum()
    cls_acc = acc_sum / (valid_sum + 1e-10)

    aux = {
        "cls_acc": cls_acc,
        "valid_tokens": valid_sum,
        "predict_tokens": pred.reshape(labels.shape),
    }
    return loss, aux
