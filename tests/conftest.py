"""Test environment: force JAX onto CPU with 8 virtual devices so sharding
paths are exercised without TPU hardware (the standard JAX fake-backend
trick; the reference has no analogue — it has no test suite at all)."""

import os

# FACEFORMER_TEST_TPU=1 keeps the real backend so the TPU-gated tests
# (compiled-kernel equivalence, trained-checkpoint grid equality) can run:
#   FACEFORMER_TEST_TPU=1 python -m pytest tests/ -q -k "TPU or Trained"
if os.environ.get("FACEFORMER_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("FACEFORMER_TEST_TPU") != "1":
    # the axon sitecustomize pins JAX_PLATFORMS=axon; the config route wins
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from faceformer_tpu.config import Config, ModelConfig, TokenConfig


@pytest.fixture(scope="session")
def tiny_model_cfg() -> ModelConfig:
    """Small dims for fast tests; token table matches the reference."""
    return ModelConfig(
        num_points_per_line=8,
        num_lines=56,  # fits every fixture solid (plate_with_hole: 48 coedges)
        point_dim=2,
        label_seq_length=64,
        max_num_faces=12,
        max_face_length=16,
        num_model=32,
        num_head=4,
        num_feedforward=48,
        num_encoder_layers=2,
        num_decoder_layers=2,
        dropout=0.0,
    )


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
