"""End-to-end: an actual PyTorch-Lightning checkpoint FILE through the CLI.

The round-1 converter tests exercised convert_torch_state_dict against
in-memory state dicts only; this test builds a real Lightning-style blob
(torch.save({'state_dict': OrderedDict(...), 'epoch': ..., ...}) with the
reference's exact module paths — reference main.py:44-51 load format,
trainer "model." key prefix), writes it to disk as .ckpt, and drives
``main.py --config-file tiny.yml --test_ckpt x.ckpt`` — the same CLI path a
user of the reference would take with a released checkpoint.  The produced
prediction JSONs must match the torch reimplementation's decode exactly.
"""

import json
import os
import sys
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from faceformer_tpu.data.batching import collate
from faceformer_tpu.data.dataset import ABCDatasetParallel
from faceformer_tpu.models.parallel import SurfaceFormerParallel
from faceformer_tpu.tools.synthetic_data import generate
from faceformer_tpu.train.checkpoint import export_torch_state_dict
from faceformer_tpu.train.metrics import FaceMetrics

from tests.test_checkpoint_parity import TorchReferenceModel

CONFIG_TEMPLATE = """\
model_class: 'SurfaceFormer_Parallel'
dataset_class: 'ABCDataset_Parallel'
root_dir: "{root}"

batch_size_train: 4
batch_size_valid: 4

trainer:
  name: 'lck'
  version: 'v0'
  num_devices: 1
  precision: 'fp32'

model:
  num_points_per_line: {p}
  num_lines: {lines}
  label_seq_length: {tlabel}
  max_num_faces: {faces}
  max_face_length: {tface}
  num_model: {e}
  num_head: {h}
  num_feedforward: {ffn}
  num_encoder_layers: {enc}
  num_decoder_layers: {dec}
  dropout: 0.0

decode:
  mode: 'reference'
  precision: 'fp32'
"""


def test_lightning_ckpt_through_cli(tmp_path, monkeypatch, tiny_model_cfg):
    cfg = tiny_model_cfg
    root = tmp_path / "data"
    generate(str(root), num=10, seed=3, split=(0.5, 0.2, 0.3))

    yml = tmp_path / "tiny.yml"
    yml.write_text(CONFIG_TEMPLATE.format(
        root=str(root), p=cfg.num_points_per_line, lines=cfg.num_lines,
        tlabel=cfg.label_seq_length, faces=cfg.max_num_faces,
        tface=cfg.max_face_length, e=cfg.num_model, h=cfg.num_head,
        ffn=cfg.num_feedforward, enc=cfg.num_encoder_layers,
        dec=cfg.num_decoder_layers))

    # a Lightning-style checkpoint blob with the reference's exact module
    # names ("model." prefix from the LightningModule attribute, packed
    # in_proj q/k/v, (out,in) Linear layout)
    params = SurfaceFormerParallel.init(jax.random.PRNGKey(5), cfg)
    sd = export_torch_state_dict(params)
    assert all(key.startswith("model.") for key in sd)
    assert "model.encoder.layers.0.self_attn.in_proj_weight" in sd
    blob = {
        "epoch": 7,
        "global_step": 1234,
        "pytorch-lightning_version": "1.3.5",
        "state_dict": OrderedDict(
            (k, torch.tensor(v)) for k, v in sd.items()),
        "callbacks": {},
        "optimizer_states": [],
        "lr_schedulers": [],
    }
    ckpt = tmp_path / "epoch=7-valid_precision=0.9123.ckpt"
    torch.save(blob, str(ckpt))

    # drive the real CLI: main.py --test_ckpt <blob>.ckpt
    import main as cli

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "main.py", "--config-file", str(yml), "--test_ckpt", str(ckpt)])
    cli.main()

    log_dir = tmp_path / "logs" / "lck" / "v0"
    results = json.load(open(log_dir / "results.json"))
    assert results["num_samples"] == 3
    json_files = sorted((log_dir / "json").glob("*.json"))
    assert len(json_files) == 3

    # the torch reimplementation decodes the same split; faces must match
    ds = ABCDatasetParallel(str(root), ["test.txt"], cfg)
    metrics = FaceMetrics(__import__(
        "faceformer_tpu.config", fromlist=["PostProcessConfig"]
    ).PostProcessConfig(), cfg.token)
    model = TorchReferenceModel(cfg, sd)
    expected = {}
    for i in range(len(ds)):
        batch = collate([ds[i]])
        grid = model.decode_parallel(
            torch.tensor(np.asarray(batch["input"])),
            torch.tensor(np.asarray(batch["input_mask"])),
            np.asarray(batch["num_input"])).numpy()
        out = metrics.evaluate_batch(
            grid, np.asarray(batch["label"]),
            [ds.raw_datas[j] for j in batch["id"]], [True])
        name = os.path.splitext(os.path.basename(batch["name"][0]))[0]
        expected[name] = out["predictions"][0]

    for path in json_files:
        record = json.load(open(path))
        name = path.stem
        got = [[t, loops] for t, loops in record["pred_faces"]]
        want = [[int(t), [[int(i) for i in loop] for loop in loops]]
                for t, loops in expected[name]]
        assert got == want, f"prediction mismatch for {name}"
