"""True multi-process (multi-host) training integration test.

Two jax.distributed processes (2 virtual CPU devices each, gloo backend)
run the real Harness.fit over a shared corpus with per-host stripe
loading. The per-step train losses must match a single-process run over
the same global permutation: each multi-host global batch holds the same
sample multiset as the corresponding single-process batch (the stripes
interleave one global shuffle), and with dropout 0 the mean-over-tokens
loss is row-order-invariant. This is the only place the
make_array_from_process_local_data batch assembly actually executes with
process_count > 1 — the bug it guards against (each host's different
stripe interpreted as THE global batch) is silent in single-process runs.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from faceformer_tpu.tools.synthetic_data import generate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker pins its own device layout
    env["JAX_PLATFORMS"] = "cpu"
    # workers run from a tmp cwd so logs/ stays out of the repo tree
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _losses(log_dir: str):
    path = os.path.join(log_dir, "metrics.jsonl")
    out = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "train_loss" in rec:
                out.append((rec["step"], rec["train_loss"]))
    return out


def test_two_process_fit_matches_single_process(tmp_path):
    root = str(tmp_path / "corpus")
    # wide splits so eval actually spans batches/processes (test split 9-10
    # samples); train stays 16 = 2 global batches of 8
    generate(root, num=32, seed=3, split=(0.5, 0.2, 0.3))

    env = _worker_env()
    port = _free_port()

    def run(args, cwd, log_path):
        # file-backed stdout: PIPE + sequential communicate() can deadlock
        # (one coordinated worker blocks on a full pipe while the other is
        # being drained), and a timeout must not orphan live workers
        f = open(log_path, "w")
        p = subprocess.Popen([sys.executable, WORKER, *args],
                             cwd=cwd, env=env, stdout=f,
                             stderr=subprocess.STDOUT, text=True)
        p._log_path, p._log_file = log_path, f
        return p

    def finish(procs, timeout=540):
        outs = []
        try:
            for p in procs:
                p.wait(timeout=timeout)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.wait()
                p._log_file.close()
        for p in procs:
            with open(p._log_path) as f:
                outs.append(f.read())
        return outs

    # logs land under <cwd>/logs/<name>/<version>; run from tmp_path so the
    # repo tree stays clean
    os.makedirs(str(tmp_path / "mh"), exist_ok=True)
    os.makedirs(str(tmp_path / "sp"), exist_ok=True)
    # 2 processes x 2 local devices, 4 rows per host -> global batch 8
    procs = [run([str(i), "2", str(port), root, "mh", "v0", "2", "4"],
                 cwd=str(tmp_path / "mh"), log_path=str(tmp_path / f"mh{i}.log"))
             for i in range(2)]
    outs = finish(procs)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "WORKER_OK" in out
        assert "global_devices=4" in out

    # single-process reference: 1 process x 4 local devices, batch 8 — the
    # same global mesh width and the same global batch multiset
    sp = run(["0", "1", str(_free_port()), root, "sp", "v0", "4", "8"],
             cwd=str(tmp_path / "sp"), log_path=str(tmp_path / "sp.log"))
    sp_out = finish([sp])[0]
    assert sp.returncode == 0, sp_out[-3000:]

    mh = _losses(str(tmp_path / "mh" / "logs" / "mh" / "v0"))
    ref = _losses(str(tmp_path / "sp" / "logs" / "sp" / "v0"))
    assert len(mh) == len(ref) > 0
    for (s1, l1), (s2, l2) in zip(mh, ref):
        assert s1 == s2
        np.testing.assert_allclose(l1, l2, atol=2e-5, rtol=1e-5)

    # exactly one writer: the checkpoint dir exists once, written by proc 0
    ckpt_dir = str(tmp_path / "mh" / "logs" / "mh" / "v0" / "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "last"))

    # multi-process test(): every process reports the same global metrics,
    # equal to the single-process run's (per-sample decode is row-invariant
    # under retirement, and the allreduced means cover the same 16 samples)
    def _test_line(out):
        line = [l for l in out.splitlines() if l.startswith("TEST_RESULTS")][0]
        vals = line.split()[1:]
        return float(vals[0]), float(vals[1]), int(vals[2])

    t0, t1 = _test_line(outs[0]), _test_line(outs[1])
    ts = _test_line(sp_out)
    assert t0 == t1
    assert t0[2] == ts[2] > 1  # the whole test split, counted once
    np.testing.assert_allclose(t0[0], ts[0], atol=1e-6)
    np.testing.assert_allclose(t0[1], ts[1], atol=1e-6)

    # prediction JSONs: the two processes wrote disjoint row sets that
    # together cover the whole split
    json_dir = str(tmp_path / "mh" / "logs" / "mh" / "v0" / "json")
    sp_dir = str(tmp_path / "sp" / "logs" / "sp" / "v0" / "json")
    assert sorted(os.listdir(json_dir)) == sorted(os.listdir(sp_dir))
