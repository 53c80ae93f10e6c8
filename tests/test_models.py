"""Model forward/decode tests: shapes, training signal, and decode-engine
equivalence against naive step-by-step decoders that mirror the reference's
eval loops literally (variable-length prefix re-runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faceformer_tpu.data.batching import collate
from faceformer_tpu.data.dataset import ABCDataset, ABCDatasetParallel
from faceformer_tpu.decode import greedy_decode_parallel, greedy_decode_single
from faceformer_tpu.geometry.fixtures import build_sample, make_box, make_prism
from faceformer_tpu.models import layers as L
from faceformer_tpu.models.common import encode, gather_memory_rows, masked_argmax
from faceformer_tpu.models.parallel import SurfaceFormerParallel
from faceformer_tpu.models.surfaceformer import SurfaceFormer
from faceformer_tpu.train.loss import pointer_cross_entropy


@pytest.fixture(scope="module")
def parallel_batch(tiny_model_cfg):
    samples = [
        build_sample(make_box(), theta=25.0, phi=45.0),
        build_sample(make_prism(5), theta=110.0, phi=30.0),
    ]
    ds = ABCDatasetParallel.from_samples(samples, tiny_model_cfg)
    return collate([ds[0], ds[1]]), samples


@pytest.fixture(scope="module")
def single_batch(tiny_model_cfg):
    samples = [
        build_sample(make_box(), theta=25.0, phi=45.0, coedge=False),
        build_sample(make_prism(5), theta=110.0, phi=30.0, coedge=False),
    ]
    ds = ABCDataset.from_samples(samples, tiny_model_cfg)
    return collate([ds[0], ds[1]]), samples


class TestForwardTrain:
    def test_single_shapes_and_loss(self, tiny_model_cfg, single_batch):
        batch, _ = single_batch
        params = SurfaceFormer.init(jax.random.PRNGKey(0), tiny_model_cfg)
        out = SurfaceFormer.forward_train(params, tiny_model_cfg, batch)
        n, t = batch["label"].shape
        s = tiny_model_cfg.num_lines + 4
        assert out["embedding"].shape == (n, s, tiny_model_cfg.num_model)
        assert out["pointer"].shape == (n, t - 1, tiny_model_cfg.num_model)
        assert out["label"].shape == (n, t - 1)
        loss, aux = pointer_cross_entropy(out, tiny_model_cfg.token)
        assert np.isfinite(float(loss))
        assert 0.0 <= float(aux["cls_acc"]) <= 1.0

    def test_parallel_shapes_and_loss(self, tiny_model_cfg, parallel_batch):
        batch, _ = parallel_batch
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(0), tiny_model_cfg)
        out = SurfaceFormerParallel.forward_train(params, tiny_model_cfg, batch)
        n, f, t = batch["label"].shape
        assert out["pointer"].shape == (n, f, t - 1, tiny_model_cfg.num_model)
        assert out["label"].shape == (n, f, t - 1)
        loss, _ = pointer_cross_entropy(out, tiny_model_cfg.token)
        assert np.isfinite(float(loss))

    def test_loss_decreases(self, tiny_model_cfg, parallel_batch):
        import optax

        batch, _ = parallel_batch
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(1), tiny_model_cfg)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, rng):
            def loss_fn(p):
                out = SurfaceFormerParallel.forward_train(
                    p, tiny_model_cfg, batch, rng=rng)
                return pointer_cross_entropy(out, tiny_model_cfg.token)[0]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state2, loss

        rng = jax.random.PRNGKey(2)
        first = None
        for i in range(30):
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step(params, opt_state, sub)
            if first is None:
                first = float(loss)
        assert float(loss) < 0.5 * first, f"loss {first} -> {float(loss)}"

    def test_dropout_needs_rng_and_is_stochastic(self, tiny_model_cfg, single_batch):
        from dataclasses import replace

        batch, _ = single_batch
        cfg = replace(tiny_model_cfg, dropout=0.3)
        params = SurfaceFormer.init(jax.random.PRNGKey(0), cfg)
        out1 = SurfaceFormer.forward_train(params, cfg, batch, rng=jax.random.PRNGKey(1))
        out2 = SurfaceFormer.forward_train(params, cfg, batch, rng=jax.random.PRNGKey(2))
        assert not np.allclose(np.asarray(out1["pointer"]), np.asarray(out2["pointer"]))
        # no rng -> deterministic eval-style pass
        out3 = SurfaceFormer.forward_train(params, cfg, batch)
        out4 = SurfaceFormer.forward_train(params, cfg, batch)
        np.testing.assert_array_equal(np.asarray(out3["pointer"]), np.asarray(out4["pointer"]))

    @pytest.mark.parametrize("bits", [8, 16, 32])
    def test_dropout_bit_widths(self, bits, monkeypatch):
        """The bit-threshold variants keep dropout's contract: deterministic
        given the key, inverse-scaled survivors, empirical drop rate within
        sampling noise of the (quantized) nominal rate."""
        from faceformer_tpu.models import layers

        monkeypatch.setattr(layers, "DROPOUT_BITS", bits)
        rate = 0.2
        x = jnp.ones((256, 256), jnp.float32)
        key = jax.random.PRNGKey(3)
        a = np.asarray(layers.dropout(x, rate, key))
        b = np.asarray(layers.dropout(x, rate, key))
        np.testing.assert_array_equal(a, b)
        keep = 1.0 - rate
        survivors = a[a != 0.0]
        np.testing.assert_allclose(survivors, 1.0 / keep, rtol=1e-6)
        # quantized keep prob: round(keep * 2^bits) / 2^bits for 8/16
        nominal = (round(keep * (1 << bits)) / (1 << bits)
                   if bits < 32 else keep)
        frac = survivors.size / a.size
        assert abs(frac - nominal) < 0.005, (frac, nominal)


# ---------------------------------------------------------------------------
# naive decoders mirroring the reference eval loops literally
# ---------------------------------------------------------------------------


def naive_decode_single(params, cfg, batch):
    tok = cfg.token
    memory, pos, padded_mask = encode(params, cfg, batch["input"], batch["input_mask"], None)
    n = memory.shape[0]
    t_max = cfg.label_seq_length
    qpos = params["query_pos_table"][None]
    tokens = np.full((n, t_max), tok.PAD, np.int32)
    tokens[:, 0] = tok.SOS
    eos_count, step = 0, 0
    while step < t_max - 1 and eos_count != n:
        prefix = jnp.asarray(tokens[:, : step + 1])
        tgt = gather_memory_rows(memory, prefix)
        out = L.decoder_forward(
            params["decoder"], tgt, memory, qpos[:, : step + 1], pos,
            num_head=cfg.num_head, dropout_rate=0.0,
            memory_key_padding_mask=padded_mask)
        pointer_t = L.linear(params["project"], out[:, -1])
        nxt = np.asarray(masked_argmax(memory, pointer_t, padded_mask))
        tokens[:, step + 1] = nxt
        eos_count += int((nxt == tok.EOS).sum())
        step += 1
    return tokens


def naive_decode_parallel(params, cfg, batch):
    tok = cfg.token
    memory, pos, padded_mask = encode(params, cfg, batch["input"], batch["input_mask"], None)
    n = memory.shape[0]
    f, t_max = cfg.num_lines, cfg.max_face_length
    qpos = params["query_pos_table"][None, None]
    anchors = np.tile(np.arange(f, dtype=np.int32), (n, 1))
    for i, num in enumerate(np.asarray(batch["num_input"])):
        anchors[i, num:] = tok.length - 1
    tokens = np.full((n, f, t_max), tok.PAD, np.int32)
    tokens[:, :, 0] = anchors
    step = 0
    while step < t_max - 1:
        prefix = jnp.asarray(tokens[:, :, : step + 1])
        tgt = gather_memory_rows(memory, prefix)
        out = L.decoder_forward(
            params["decoder"], tgt, memory[:, None], qpos[:, :, : step + 1],
            pos[:, None], num_head=cfg.num_head, dropout_rate=0.0,
            memory_key_padding_mask=padded_mask[:, None])
        pointer_t = L.linear(params["project"], out[:, :, -1])
        nxt = np.asarray(masked_argmax(memory, pointer_t, padded_mask))
        tokens[:, :, step + 1] = nxt
        step += 1
        if np.all(nxt < tok.length):
            break
    return tokens


def naive_causal_decode_single(params, cfg, batch):
    """Causal variant: same loop but WITH the causal mask, matching what the
    causal_cache engine should produce."""
    tok = cfg.token
    memory, pos, padded_mask = encode(params, cfg, batch["input"], batch["input_mask"], None)
    n = memory.shape[0]
    t_max = cfg.label_seq_length
    qpos = params["query_pos_table"][None]
    tokens = np.full((n, t_max), tok.PAD, np.int32)
    tokens[:, 0] = tok.SOS
    eos_count, step = 0, 0
    while step < t_max - 1 and eos_count != n:
        prefix = jnp.asarray(tokens[:, : step + 1])
        tgt = gather_memory_rows(memory, prefix)
        out = L.decoder_forward(
            params["decoder"], tgt, memory, qpos[:, : step + 1], pos,
            num_head=cfg.num_head, dropout_rate=0.0,
            tgt_mask=L.causal_mask(step + 1),
            memory_key_padding_mask=padded_mask)
        pointer_t = L.linear(params["project"], out[:, -1])
        nxt = np.asarray(masked_argmax(memory, pointer_t, padded_mask))
        tokens[:, step + 1] = nxt
        eos_count += int((nxt == tok.EOS).sum())
        step += 1
    return tokens


class TestDecode:
    def test_single_reference_mode_matches_naive(self, tiny_model_cfg, single_batch):
        batch, _ = single_batch
        params = SurfaceFormer.init(jax.random.PRNGKey(3), tiny_model_cfg)
        # naive mimics the reference's cumulative-EOS-count stop
        fast = greedy_decode_single(params, tiny_model_cfg, batch,
                                    mode="reference", retire_rows=False)
        naive = naive_decode_single(params, tiny_model_cfg, batch)
        np.testing.assert_array_equal(np.asarray(fast["predict"]), naive)

    def test_parallel_reference_mode_matches_naive(self, tiny_model_cfg, parallel_batch):
        batch, _ = parallel_batch
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(4), tiny_model_cfg)
        fast = greedy_decode_parallel(params, tiny_model_cfg, batch, mode="reference")
        naive = naive_decode_parallel(params, tiny_model_cfg, batch)
        np.testing.assert_array_equal(np.asarray(fast["predict"]), naive)

    def test_single_causal_cache_matches_naive_causal(self, tiny_model_cfg, single_batch):
        batch, _ = single_batch
        params = SurfaceFormer.init(jax.random.PRNGKey(5), tiny_model_cfg)
        fast = greedy_decode_single(params, tiny_model_cfg, batch,
                                    mode="causal_cache", retire_rows=False)
        naive = naive_causal_decode_single(params, tiny_model_cfg, batch)
        np.testing.assert_array_equal(np.asarray(fast["predict"]), naive)

    def test_parallel_anchor_quirk(self, tiny_model_cfg, parallel_batch):
        """Anchors are raw arange WITHOUT +4; unused rows start at 3."""
        batch, _ = parallel_batch
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(6), tiny_model_cfg)
        out = greedy_decode_parallel(params, tiny_model_cfg, batch, mode="reference")
        grid = np.asarray(out["predict"])
        for i, num in enumerate(np.asarray(batch["num_input"])):
            np.testing.assert_array_equal(grid[i, :num, 0], np.arange(num))
            assert np.all(grid[i, num:, 0] == 3)

    def test_decode_jits(self, tiny_model_cfg, parallel_batch):
        batch, _ = parallel_batch
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(7), tiny_model_cfg)
        fn = jax.jit(
            lambda p, b: greedy_decode_parallel(p, tiny_model_cfg, b, mode="causal_cache")["predict"])
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
        out = fn(params, arrays)
        assert out.shape == (2, tiny_model_cfg.num_lines, tiny_model_cfg.max_face_length)


class TestAnchorModes:
    def test_aligned_anchors(self, tiny_model_cfg, parallel_batch):
        from faceformer_tpu.decode import greedy_decode_parallel

        batch, _ = parallel_batch
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(6), tiny_model_cfg)
        out = greedy_decode_parallel(
            params, tiny_model_cfg, batch, mode="causal_cache",
            anchor_mode="aligned")
        grid = np.asarray(out["predict"])
        tok_len = tiny_model_cfg.token.length
        for i, num in enumerate(np.asarray(batch["num_input"])):
            np.testing.assert_array_equal(
                grid[i, :num, 0], np.arange(num) + tok_len)
            assert np.all(grid[i, num:, 0] == tok_len - 1)


class TestRematPolicies:
    def test_gradients_match_no_remat(self, tiny_model_cfg):
        """remat (full and dots policies) is a pure memory/FLOPs trade —
        gradients must match the non-remat backward to fp tolerance."""
        import dataclasses

        import jax
        import numpy as np

        from faceformer_tpu.data.batching import collate
        from faceformer_tpu.data.dataset import ABCDatasetParallel
        from faceformer_tpu.geometry.fixtures import random_sample
        from faceformer_tpu.models.parallel import SurfaceFormerParallel
        from faceformer_tpu.train.loss import pointer_cross_entropy

        rng = np.random.default_rng(3)
        ds = ABCDatasetParallel.from_samples(
            [random_sample(rng) for _ in range(2)], tiny_model_cfg)
        batch = {k: v for k, v in collate([ds[0], ds[1]]).items()
                 if not isinstance(v, (list, str))}
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(1), tiny_model_cfg)

        grads = {}
        policies = ("full", "dots", "attn", "attn_ffn")
        for name, kw in (("off", dict(remat=False)),
                         *((p, dict(remat=True, remat_policy=p))
                           for p in policies)):
            cfg = dataclasses.replace(tiny_model_cfg, **kw)

            def loss_fn(p, cfg=cfg):
                out = SurfaceFormerParallel.forward_train(p, cfg, batch, rng=None)
                return pointer_cross_entropy(out, cfg.token)[0]

            grads[name] = jax.grad(loss_fn)(params)
        for name in policies:
            for a, b in zip(jax.tree.leaves(grads["off"]),
                            jax.tree.leaves(grads[name])):
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), atol=5e-5, rtol=1e-4)

    def test_gradients_match_with_dropout(self, tiny_model_cfg):
        """With an rng (dropout active), jax.checkpoint must REPLAY the same
        random masks in the recompute — gradients under every remat policy
        must equal the non-remat backward for the same rng."""
        import dataclasses

        import jax
        import numpy as np

        from faceformer_tpu.data.batching import collate
        from faceformer_tpu.data.dataset import ABCDatasetParallel
        from faceformer_tpu.geometry.fixtures import random_sample
        from faceformer_tpu.models.parallel import SurfaceFormerParallel
        from faceformer_tpu.train.loss import pointer_cross_entropy

        rng = np.random.default_rng(4)
        ds = ABCDatasetParallel.from_samples(
            [random_sample(rng) for _ in range(2)], tiny_model_cfg)
        batch = {k: v for k, v in collate([ds[0], ds[1]]).items()
                 if not isinstance(v, (list, str))}
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(1), tiny_model_cfg)
        drop_rng = jax.random.key(7)

        grads = {}
        for name, kw in (("off", dict(remat=False)),
                         ("attn", dict(remat=True, remat_policy="attn")),
                         ("attn_ffn", dict(remat=True, remat_policy="attn_ffn"))):
            cfg = dataclasses.replace(tiny_model_cfg, **kw)

            def loss_fn(p, cfg=cfg):
                out = SurfaceFormerParallel.forward_train(
                    p, cfg, batch, rng=drop_rng)
                return pointer_cross_entropy(out, cfg.token)[0]

            grads[name] = jax.grad(loss_fn)(params)
        for name in ("attn", "attn_ffn"):
            for a, b in zip(jax.tree.leaves(grads["off"]),
                            jax.tree.leaves(grads[name])):
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), atol=5e-5, rtol=1e-4)


class TestRowRetirement:
    """causal_cache/fused parallel engines retire finished rows: positions
    after a row's first terminator stay PAD, making the grid a pure function
    of the per-row prefixes (invariant to how long the loop runs — the
    property the sharded decode engine relies on)."""

    def test_grid_invariant_to_early_stop(self, tiny_model_cfg, parallel_batch):
        batch, _ = parallel_batch
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(8), tiny_model_cfg)
        es = np.asarray(greedy_decode_parallel(
            params, tiny_model_cfg, batch, mode="causal_cache",
            early_stop=True)["predict"])
        full = np.asarray(greedy_decode_parallel(
            params, tiny_model_cfg, batch, mode="causal_cache",
            early_stop=False)["predict"])
        np.testing.assert_array_equal(es, full)

    def test_post_terminator_positions_are_pad(self, tiny_model_cfg, parallel_batch):
        # Engineer every row to emit a face-TYPE token at step 1: zero the
        # projection weight and set its bias to the sample's own memory
        # row 1 (a type token), so pointer logits are memory @ memory_row1,
        # which argmaxes to row 1 (asserted as a precondition). Rows must
        # then be retired: every later position stays PAD.
        from faceformer_tpu.models.common import encode

        batch, _ = parallel_batch
        batch = {k: v[:1] for k, v in batch.items()}  # single sample
        tok = tiny_model_cfg.token
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(9), tiny_model_cfg)
        memory, _, _ = encode(params, tiny_model_cfg, batch["input"],
                              batch["input_mask"], None, jnp.float32)
        c = np.asarray(memory)[0, 1]
        assert int(np.argmax(np.asarray(memory)[0] @ c)) == 1  # precondition
        params = dict(params)
        params["project"] = {"w": jnp.zeros_like(params["project"]["w"]),
                             "b": jnp.asarray(c)}
        grid = np.asarray(greedy_decode_parallel(
            params, tiny_model_cfg, batch, mode="causal_cache")["predict"])
        assert np.all(grid[:, :, 1] == 1)  # every row emits the type token
        assert np.all(grid[:, :, 2:] == tok.PAD)  # ...and is retired after

    def test_pad_does_not_retire_rows(self, tiny_model_cfg, parallel_batch):
        # PAD is not a terminator (reference parse cuts at face-type tokens
        # only, trainer.py:184,197): a head whose argmax is the PAD row must
        # keep its rows alive for the whole token budget, and with no type
        # token ever emitted the grid is all PAD after the anchors — in
        # both the retirement and reference engines.
        batch, _ = parallel_batch
        batch = {k: v[:1] for k, v in batch.items()}
        tok = tiny_model_cfg.token
        params = SurfaceFormerParallel.init(jax.random.PRNGKey(9), tiny_model_cfg)
        params = dict(params)
        # all-equal logits: masked argmax ties to memory row 0 == PAD
        params["project"] = jax.tree.map(jnp.zeros_like, params["project"])
        grids = {m: np.asarray(greedy_decode_parallel(
            params, tiny_model_cfg, batch, mode=m)["predict"])
            for m in ("causal_cache", "reference")}
        for grid in grids.values():
            assert np.all(grid[:, :, 1:] == tok.PAD)

    @pytest.mark.parametrize("mode", ["reference", "causal_cache"])
    def test_single_grid_invariant_to_early_stop(self, tiny_model_cfg,
                                                 single_batch, mode):
        # flat-model retirement: rows past their first EOS write PAD, so
        # the grid no longer depends on when the batch loop stops
        batch, _ = single_batch
        params = SurfaceFormer.init(jax.random.PRNGKey(8), tiny_model_cfg)
        es = np.asarray(greedy_decode_single(
            params, tiny_model_cfg, batch, mode=mode, early_stop=True)["predict"])
        full = np.asarray(greedy_decode_single(
            params, tiny_model_cfg, batch, mode=mode, early_stop=False)["predict"])
        np.testing.assert_array_equal(es, full)

    @pytest.mark.parametrize("mode", ["reference", "causal_cache"])
    def test_single_grid_invariant_to_batchmates(self, tiny_model_cfg,
                                                 single_batch, mode):
        # each sample's retired grid must equal its own batch-of-1 decode —
        # the invariance sort_eval and sharded eval rely on (the reference's
        # cumulative-EOS-count stop does not have this property)
        batch, _ = single_batch
        params = SurfaceFormer.init(jax.random.PRNGKey(3), tiny_model_cfg)
        together = np.asarray(greedy_decode_single(
            params, tiny_model_cfg, batch, mode=mode)["predict"])
        for i in range(together.shape[0]):
            solo = np.asarray(greedy_decode_single(
                params, tiny_model_cfg,
                {k: v[i:i + 1] for k, v in batch.items()},
                mode=mode)["predict"])
            np.testing.assert_array_equal(together[i], solo[0])
