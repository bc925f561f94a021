"""Self-MM algorithm tests: manager pytree, label refinement, train step."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmtpu.config.optim import OptimizerConfig
from mmtpu.models.self_mm import AuViSubNet, Self_MM
from mmtpu.train.managers import ManagerState
from mmtpu.train.optim import build_optimizer
from mmtpu.train.self_mm_step import (
    SelfMMTask,
    init_manager_labels,
    make_self_mm_eval_step,
    make_self_mm_train_step,
)
from mmtpu.train.state import TrainState

RNG = jax.random.PRNGKey(0)


class TinyText(nn.Module):
    """Stand-in for BertTextEncoder: (B, 3, seq) → (B, seq, 16)."""

    @nn.compact
    def __call__(self, text, train=False):
        ids = text[:, 0, :, None].astype(jnp.float32)
        return nn.Dense(16)(ids)


def make_batch(B=6, N=32):
    rng = np.random.default_rng(0)
    labels = rng.uniform(-3, 3, B).astype(np.float32)
    text = np.ones((B, 3, 10), np.float32)
    text[:, 1, :] = 1.0  # full attention mask
    return {
        "audio": jnp.asarray(rng.normal(size=(B, 10, 4)), jnp.float32),
        "video": jnp.asarray(rng.normal(size=(B, 10, 8)), jnp.float32),
        "text": jnp.asarray(text),
        "labels": jnp.asarray(labels),
        "sample_idx": jnp.arange(B, dtype=jnp.int32),
        "pattern_id": jnp.zeros((B,), jnp.int32),
        "sample_mask": jnp.ones((B,)),
    }


def build():
    model = Self_MM(
        audio_encoder=AuViSubNet(4, 8, 12, dropout=0.0),
        video_encoder=AuViSubNet(8, 8, 12, dropout=0.0),
        text_encoder=TinyText(),
        need_data_aligned=False,
        audio_out=12, video_out=12, text_out=16,
        post_fusion_dropout=0.0, post_fusion_dim=24,
        post_text_dropout=0.0, post_text_dim=8,
        post_audio_dropout=0.0, post_audio_dim=8,
        post_video_dropout=0.0, post_video_dim=8,
    )
    batch = make_batch()
    variables = model.init(
        {"params": RNG},
        (batch["audio"], None), (batch["video"], None), batch["text"],
        train=False,
    )
    tx, _ = build_optimizer(
        OptimizerConfig(name="Adam", default_kwargs={"lr": 1e-3}),
        variables["params"],
    )
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx,
    )
    managers = ManagerState.create(
        num_samples=32,
        modality_dims={"multimodal": 24, "audio": 8, "video": 8, "text": 8},
    )
    task = SelfMMTask(model=model, need_data_aligned=False)
    return task, state, managers, batch


def test_auvisubnet_multilayer_bidirectional_wiring():
    """torch nn.LSTM semantics: BOTH directions of layer L consume layer
    L-1's concatenated outputs. Regression: the backward direction of
    layer 1 was being fed layer 1's forward outputs."""
    import flax.linen as nn
    import jax

    B, T, I, H, O = 3, 5, 6, 4, 7
    net = AuViSubNet(I, H, O, num_layers=2, bidirectional=True, dropout=0.0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, I)),
                    jnp.float32)
    lengths = jnp.asarray([5, 3, 4])
    v = net.init(jax.random.PRNGKey(0), x, lengths)
    got = net.apply(v, x, lengths, train=False)

    # reference composition from the SAME params, wired explicitly. The
    # cells are constructed in AuViSubNet.__call__, so their params land in
    # the parent scope as OptimizedLSTMCell_{k} in construction order:
    # l0 fwd, l0 bwd, l1 fwd, l1 bwd.
    p = v["params"]

    def fwd(k, xx):
        rnn = nn.RNN(nn.OptimizedLSTMCell(H), return_carry=True)
        return rnn.apply(
            {"params": {"cell": p[f"OptimizedLSTMCell_{k}"]}},
            xx, seq_lengths=lengths,
        )

    def bwd(k, xx):
        rnn = nn.RNN(nn.OptimizedLSTMCell(H), return_carry=True,
                     reverse=True, keep_order=True)
        return rnn.apply(
            {"params": {"cell": p[f"OptimizedLSTMCell_{k}"]}},
            xx, seq_lengths=lengths,
        )

    (_, h0f), s0f = fwd(0, x)
    (_, h0b), s0b = bwd(1, x)
    l0_out = jnp.concatenate([s0f, s0b], axis=-1)
    (_, h1f), _ = fwd(2, l0_out)
    (_, h1b), _ = bwd(3, l0_out)
    final = jnp.concatenate([h1f, h1b], axis=-1)
    want = final @ p["linear_1"]["kernel"] + p["linear_1"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_forward_output_structure():
    task, state, _, batch = build()
    out = task.apply(state.variables, batch, train=False)
    assert set(out) == {"predictions", "features", "features_pre_activation"}
    assert out["predictions"]["multimodal"].shape == (6, 1)
    assert out["features"]["audio"].shape == (6, 8)


def test_label_init_and_refinement():
    task, state, managers, batch = build()
    managers = managers.init_labels(batch["sample_idx"], batch["labels"])
    np.testing.assert_allclose(
        np.asarray(managers.labels["audio"][:6]), np.asarray(batch["labels"]),
        rtol=1e-6,
    )
    step = make_self_mm_train_step(task)
    # epoch 1: no refinement — unimodal labels stay equal to fusion labels
    state, managers, out = step(state, managers, batch, RNG, jnp.asarray(1))
    np.testing.assert_allclose(
        np.asarray(managers.labels["audio"][:6]),
        np.asarray(managers.labels["multimodal"][:6]),
    )
    # epoch 2: refinement kicks in and diverges unimodal labels
    state, managers, out = step(state, managers, batch, RNG, jnp.asarray(2))
    assert not np.allclose(
        np.asarray(managers.labels["audio"][:6]),
        np.asarray(managers.labels["multimodal"][:6]),
    )
    # clamped to ±H
    assert np.all(np.abs(np.asarray(managers.labels["audio"])) <= task.H + 1e-6)


def test_loss_decreases():
    task, state, managers, batch = build()
    managers = managers.init_labels(batch["sample_idx"], batch["labels"])
    step = make_self_mm_train_step(task)
    first = None
    for k in range(30):
        state, managers, out = step(
            state, managers, batch, jax.random.fold_in(RNG, k), jnp.asarray(1)
        )
        if first is None:
            first = float(out["loss"])
    assert float(out["loss"]) < first


def test_eval_step():
    task, state, managers, batch = build()
    ev = make_self_mm_eval_step(task)
    out = ev(state, batch)
    assert out["preds"].shape == (6,)
    assert np.isfinite(float(out["loss"]))


class TestBertIngestion:
    """Pretrained-BERT ingestion (VERDICT r2 #6): a torch BertModel saved
    HF-style locally must convert through BertTextEncoder's from_pt path
    with forward parity vs torch (reference loads pretrained BERT at
    construction, bert_text_encoder.py:32-33). No network involved."""

    @staticmethod
    def _tiny_config():
        from transformers import BertConfig

        return BertConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64, type_vocab_size=2,
        )

    def _save_torch_bert(self, tmp_path):
        import torch
        from transformers import BertModel

        torch.manual_seed(0)
        model = BertModel(self._tiny_config()).eval()
        model.save_pretrained(tmp_path / "bert_en", safe_serialization=False)
        return model

    def test_from_pt_conversion_forward_parity(self, tmp_path):
        import torch

        tbert = self._save_torch_bert(tmp_path)

        from mmtpu.models.bert_text import BertTextEncoder

        enc = BertTextEncoder(
            pretrained_path=str(tmp_path / "bert_en"),
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        )
        rng = np.random.default_rng(0)
        B, T = 3, 10
        ids = rng.integers(0, 100, (B, T))
        mask = np.ones((B, T), np.int64)
        mask[1, 6:] = 0
        types = np.zeros((B, T), np.int64)
        text = jnp.asarray(np.stack([ids, mask, types], axis=1), jnp.float32)

        params = enc.init({"params": jax.random.PRNGKey(0)}, text)
        ours = enc.apply(params, text)

        with torch.no_grad():
            theirs = tbert(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask),
                token_type_ids=torch.from_numpy(types),
            ).last_hidden_state.numpy()
        assert ours.shape == theirs.shape == (B, T, 32)
        np.testing.assert_allclose(
            np.asarray(ours), theirs, rtol=2e-4, atol=2e-5
        )

    def test_missing_path_falls_back_loudly(self, tmp_path, caplog):
        import logging

        from mmtpu.models.bert_text import BertTextEncoder

        enc = BertTextEncoder(
            pretrained_path=str(tmp_path / "nope"),
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        )
        text = jnp.zeros((2, 3, 8), jnp.float32)
        with caplog.at_level(logging.WARNING):
            params = enc.init({"params": jax.random.PRNGKey(0)}, text)
        assert any("RANDOMLY INITIALIZED" in r.message for r in caplog.records)
        out = enc.apply(params, text)
        assert out.shape == (2, 8, 32)


def test_update_centers_uses_last_modality_labels_quirk():
    """Faithful quirk (reference self_mm.py:421-424): _update_centers
    overwrites EVERY modality's centers once per modality in
    [multimodal, audio, video, text] order, so all centers end up masked by
    the TEXT label bank — not each modality's own labels."""
    m = ManagerState.create(
        num_samples=4, modality_dims={"multimodal": 2, "audio": 2, "text": 2}
    )
    feats = {
        "multimodal": jnp.asarray([[1.0, 0], [2, 0], [3, 0], [4, 0]]),
        "audio": jnp.asarray([[10.0, 0], [20, 0], [30, 0], [40, 0]]),
        "text": jnp.asarray([[5.0, 0], [6, 0], [7, 0], [8, 0]]),
    }
    labels = {
        # audio labels would pick rows {0,1} positive; text picks {2,3}
        "multimodal": jnp.asarray([1.0, 1, -1, -1]),
        "audio": jnp.asarray([1.0, 1, -1, -1]),
        "text": jnp.asarray([-1.0, -1, 1, 1]),
    }
    m = m.replace(features=feats, labels=labels)
    m = m.update_centers()
    # audio centers keyed by TEXT labels: pos = mean(rows 2,3) = 35
    np.testing.assert_allclose(np.asarray(m.centers_pos["audio"])[0], 35.0)
    np.testing.assert_allclose(np.asarray(m.centers_neg["audio"])[0], 15.0)
    np.testing.assert_allclose(np.asarray(m.centers_pos["multimodal"])[0], 3.5)


def test_eval_loss_excludes_padded_rows():
    """Padded tail rows (loader duplicates of the last real sample,
    sample_mask=0) must not count toward the validation L1 — save_metric
    'loss' drives best-checkpoint selection and the plateau LR schedule."""
    task, state, managers, batch = build()
    ev = make_self_mm_eval_step(task)
    real = float(ev(state, batch)["loss"])

    pad = 3
    padded = dict(batch)
    for k in ("audio", "video", "text"):
        padded[k] = jnp.concatenate(
            [batch[k], jnp.repeat(batch[k][-1:], pad, axis=0)]
        )
    # padded labels deliberately WRONG so an unmasked mean would shift
    padded["labels"] = jnp.concatenate(
        [batch["labels"], jnp.full((pad,), 99.0, jnp.float32)]
    )
    padded["sample_idx"] = jnp.concatenate(
        [batch["sample_idx"], jnp.zeros((pad,), jnp.int32)]
    )
    padded["pattern_id"] = jnp.concatenate(
        [batch["pattern_id"], jnp.zeros((pad,), jnp.int32)]
    )
    padded["sample_mask"] = jnp.concatenate(
        [batch["sample_mask"], jnp.zeros((pad,))]
    )
    got = float(ev(state, padded)["loss"])
    np.testing.assert_allclose(got, real, rtol=1e-6)
