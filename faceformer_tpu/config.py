"""Config spine: frozen dataclasses + YAML overlay + CLI key-value overrides.

TPU-first replacement for the reference's fvcore CfgNode system
(reference: faceformer/config.py:7-79). Same option tree, same defaults, same
two-stage merge (YAML file, then ``opts`` key/value remainder), but as typed
frozen dataclasses so the config is hashable and can be closed over by ``jit``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, replace
from typing import Any, Dict, List, Tuple


@dataclass(frozen=True)
class TokenConfig:
    """Special-token table (reference: faceformer/config.py:41-48).

    ``length`` special-token embeddings are prepended to the encoder memory,
    which is what makes pointer logits indexable by token id: memory rows
    0..3 are PAD/SOS/SEP/EOS, rows 4+ are edges, matching the +4 offset
    applied to edge indices in the labels.
    """

    PAD: int = 0
    SOS: int = 1
    SEP: int = 2
    EOS: int = 3
    DIR0: int = 4
    DIR1: int = 5
    # number of special tokens prepended to memory ("token.len" in reference)
    length: int = 4
    # face-type tokens for the parallel decoder start at this offset
    face_type_offset: int = 1


@dataclass(frozen=True)
class ModelConfig:
    """Model hyperparameters (reference: faceformer/config.py:28-48)."""

    num_points_per_line: int = 50  # P
    num_lines: int = 64  # L
    point_dim: int = 2  # D
    label_seq_length: int = 128  # T (single-sequence)
    max_num_faces: int = 42  # F
    max_face_length: int = 34  # T (per face row, parallel)
    num_model: int = 512  # E
    num_head: int = 8
    num_feedforward: int = 1024
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dropout: float = 0.2
    activation: str = "relu"
    normalize_before: bool = True
    # rematerialize per-layer activations in the backward pass
    # (jax.checkpoint over the scanned layer body) — trades FLOPs for HBM
    remat: bool = False
    # remat granularity, lowest memory -> most saved:
    #   "full"     recompute everything (fits batch 32 at flagship dims);
    #   "attn"     save attention block outputs (tagged "attn_out") only;
    #   "attn_ffn" save attention + FFN block outputs;
    #   "dots"     save every matmul output (dots_with_no_batch_dims_saveable;
    #              OOMs at flagship dims, benchmarks/train_decomp.json)
    remat_policy: str = "full"
    token: TokenConfig = field(default_factory=TokenConfig)


@dataclass(frozen=True)
class TrainerConfig:
    """Harness options (reference: faceformer/config.py:18-25)."""

    name: str = "surfaceformer"
    version: str = "baseline"
    # number of data-parallel devices to shard over; 0 = all local devices
    num_devices: int = 0
    # "bf16" (TPU-native mixed precision; reference used fp16) or "fp32"
    precision: str = "bf16"
    checkpoint_period: int = 2  # validate/checkpoint every N epochs
    lr: float = 1e-3
    lr_step: int = 0  # StepLR period in epochs; 0 disables
    max_epochs: int = 1000
    seed: int = 0
    log_every_n_steps: int = 1
    save_top_k: int = 2
    # scheduled-sampling mix ratio for teacher forcing (reference:
    # model.py:122-140 mix_gold_sampled; the reference defaults it off and
    # exposes no config knob — this makes the capability reachable)
    scheduled_sampling: float = 0.0
    # PRNG for the training loop's dropout/sampling keys: "rbg" uses XLA's
    # RngBitGenerator (measured +50% step throughput at the reference's
    # default dropout 0.2 vs threefry, whose per-element counter math also
    # blew HBM at batch 32); "threefry" restores JAX's default
    rng_impl: str = "rbg"


@dataclass(frozen=True)
class PostProcessConfig:
    """Eval-time face filtering (reference: faceformer/config.py:50-52)."""

    enclosedness_tol: float = 2e-4
    is_coedge: bool = True
    # the --direction_token data flavor: labels interleave edge pointers
    # with DIR0/DIR1 orientation tokens (the reference generates this data,
    # prepare_data.py:183-245, but ships no model for it; here the flat
    # model consumes it end-to-end)
    direction_token: bool = False


@dataclass(frozen=True)
class DecodeConfig:
    """Greedy-decode engine options (no reference analogue; the reference
    re-runs the full prefix per step with host-side stop logic,
    models/model.py:193-210).

    mode:
      - "reference": bidirectional full-prefix re-run each step. Exactly
        reproduces the reference eval, which calls the decoder WITHOUT a
        causal mask (reference: models/model.py:199-201), so earlier tokens'
        features change as the prefix grows. Needed for checkpoint-parity.
      - "causal_cache": incremental KV-cache decode with causal semantics
        (matches how the model is *trained*). The fast XLA path.
      - "fused": causal_cache semantics, one fused Pallas kernel per step
        (ops/decode_step.py) — all decoder layers + pointer argmax + the
        next-token gather in a single launch, live-prefix KV-cache reads.
        The fastest path on TPU (parallel model only; equivalence-tested
        against causal_cache, tests/test_fused_decode.py).
    """

    mode: str = "reference"
    # keep decoding in bf16 on TPU; fp32 for bit-stable parity checks
    precision: str = "bf16"
    # order eval/test batches by edge count so each batch groups samples of
    # similar decode depth: a mixed batch decodes until its DEEPEST row
    # finishes, so complexity-sorted batching cuts wasted steps (measured:
    # benchmarks/serving.json sorted_vs_corpus). Metrics are order-invariant
    # under the default engines — per-row EOS/type-token retirement makes
    # each sample's grid a pure function of its own prefix — and prediction
    # JSONs are keyed by name. The reference-parity stops (parallel
    # mode="reference"'s whole-batch stop, retire_rows=False's cumulative
    # EOS count) remain batch-composition-dependent, exactly as the
    # reference is at batch>1; its test loop avoids this with batch=1
    # (trainer.py:51).
    sort_eval: bool = True
    # anchor_mode (parallel model):
    #   - "reference": anchors are raw arange(L) WITHOUT the +4 token offset
    #     (reference model_para.py:201) — anchor row j starts from memory
    #     row j, so rows 0-3 anchor at special tokens and the last 4 edges
    #     get no anchor. Required for prediction parity.
    #   - "aligned": anchor row j starts from edge j's memory row (j + 4),
    #     covering every edge — an opt-in quality improvement.
    anchor_mode: str = "reference"


@dataclass(frozen=True)
class Config:
    """Top-level config (reference: faceformer/config.py:7-16)."""

    model_class: str = "SurfaceFormer"
    dataset_class: str = "ABCDataset"
    root_dir: str = "/root/data"
    batch_size_train: int = 64
    batch_size_valid: int = 128
    datasets_train: Tuple[str, ...] = ("train.txt",)
    datasets_valid: Tuple[str, ...] = ("valid.txt",)
    datasets_test: Tuple[str, ...] = ("test.txt",)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    post_process: PostProcessConfig = field(default_factory=PostProcessConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)


# ---------------------------------------------------------------------------
# merge machinery
# ---------------------------------------------------------------------------

# YAML/CLI key aliases: the reference exposes "token.len"; "len" is a builtin
# so the dataclass field is "length".
_FIELD_ALIASES = {"len": "length"}


def _merge_dataclass(obj: Any, overrides: Dict[str, Any], path: str = "") -> Any:
    """Recursively apply a nested dict of overrides onto a frozen dataclass."""
    if not dataclasses.is_dataclass(obj):
        raise TypeError(f"cannot merge into non-dataclass at {path!r}")
    valid = {f.name: f for f in fields(obj)}
    updates = {}
    for raw_key, value in overrides.items():
        key = _FIELD_ALIASES.get(raw_key, raw_key)
        if key not in valid:
            raise KeyError(f"unknown config key {path + raw_key!r}")
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            updates[key] = _merge_dataclass(current, value, path + key + ".")
        else:
            updates[key] = _coerce(value, valid[key].type, current)
    return replace(obj, **updates)


def _coerce(value: Any, annot: Any, current: Any) -> Any:
    """Coerce YAML/CLI values to the field's existing type."""
    if isinstance(current, tuple):
        if isinstance(value, (list, tuple)):
            return tuple(value)
        if isinstance(value, str):
            # CLI opts arrive as strings: accept a python-literal list
            # ("['a.txt','b.txt']") or treat a bare scalar as a 1-tuple —
            # storing the raw str would be iterated character-by-character
            # downstream (e.g. datasets_test -> per-character split files)
            try:
                import ast
                lit = ast.literal_eval(value)
                if isinstance(lit, (list, tuple)):
                    return tuple(lit)
            except (ValueError, SyntaxError):
                pass
            return (value,)
        return (value,)
    if isinstance(current, bool):
        if isinstance(value, str):
            return value.lower() in ("1", "true", "yes", "on")
        return bool(value)
    if isinstance(current, int) and not isinstance(current, bool):
        return int(value)
    if isinstance(current, float):
        return float(value)
    if isinstance(current, str):
        return str(value)
    return value


def _parse_opt_value(text: str) -> Any:
    """Parse a CLI override value the way fvcore's merge_from_list does:
    try YAML-literal interpretation, fall back to the raw string."""
    import yaml

    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def _set_nested(tree: Dict[str, Any], dotted_key: str, value: Any) -> None:
    node = tree
    parts = dotted_key.split(".")
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


def _normalize_reference_keys(overlay: Dict[str, Any]) -> None:
    """Accept reference-era YAML keys so the reference's configs/*.yml load
    unchanged: trainer.num_gpus (a device-id list, reference config.py:21)
    becomes trainer.num_devices; trainer.precision 16 becomes "bf16"."""
    trainer = overlay.get("trainer")
    if isinstance(trainer, dict):
        if "num_gpus" in trainer:
            # reference YAMLs list device ids (num_gpus: [0]); a scalar is
            # taken as a device COUNT rather than silently collapsing to 1
            ids = trainer.pop("num_gpus")
            trainer["num_devices"] = (
                len(ids) if isinstance(ids, (list, tuple)) else int(ids))
        if isinstance(trainer.get("precision"), int):
            trainer["precision"] = "bf16" if trainer["precision"] == 16 else "fp32"


def load_config(config_file: str = "", opts: List[str] | None = None) -> Config:
    """Build a Config: defaults -> YAML file -> CLI opts.

    Mirrors the reference flow (faceformer/config.py:73-79): ``opts`` is a flat
    ``[key, value, key, value, ...]`` list with dotted keys, e.g.
    ``["model.num_lines", "216"]``.
    """
    import yaml

    cfg = Config()
    if config_file:
        with open(config_file, "r") as f:
            overlay = yaml.safe_load(f) or {}
        _normalize_reference_keys(overlay)
        cfg = _merge_dataclass(cfg, overlay)
    if opts:
        if len(opts) % 2 != 0:
            raise ValueError(f"opts must be key/value pairs, got {opts!r}")
        tree: Dict[str, Any] = {}
        for key, val in zip(opts[0::2], opts[1::2]):
            _set_nested(tree, key, _parse_opt_value(val))
        cfg = _merge_dataclass(cfg, tree)
    if cfg.post_process.direction_token and (
            max(cfg.model.token.DIR0, cfg.model.token.DIR1)
            >= cfg.model.token.length):
        # with the default 4-row table, DIR0/DIR1 (4/5) would alias the
        # first two edges' pointer tokens (0+length, 1+length) — labels
        # would silently train/eval on ambiguous token streams
        raise ValueError(
            "post_process.direction_token requires a 6-row token table "
            "(model.token: {DIR0: 4, DIR1: 5, length: 6} — see "
            "configs/synthetic-dirtok-big.yml)")
    return cfg


def config_to_dict(cfg: Any) -> Dict[str, Any]:
    """Serialize a config tree to plain dicts (for checkpoint metadata)."""
    if dataclasses.is_dataclass(cfg):
        return {f.name: config_to_dict(getattr(cfg, f.name)) for f in fields(cfg)}
    if isinstance(cfg, tuple):
        return list(cfg)  # type: ignore[return-value]
    return cfg


def config_from_dict(tree: Dict[str, Any]) -> Config:
    """Inverse of config_to_dict."""
    return _merge_dataclass(Config(), tree)
