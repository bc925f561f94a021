"""Shape/behavior tests for every encoder and fusion primitive.

Golden shapes from the reference: MNISTAudio flatten=4800 → hidden
(models/avmnist.py:74), MNISTImage flatten=3136 (:152), LeNet flatten=400
(lenet.py:48), TextCNN 3*out_channels concat (textcnn.py:60-69)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtpu.config import StandardMultimodalConfig
from mmtpu.models import build_module

RNG = jax.random.PRNGKey(0)
AVMNIST_BASE_YAML = (
    "/root/reference/MML_Suite/configs/avmnist/centralised/train_avmnist.yaml"
)


def _init_apply(mod, *args, train=False, **kwargs):
    variables = mod.init({"params": RNG, "dropout": RNG}, *args, train=train, **kwargs)
    out = mod.apply(
        variables, *args, train=train, rngs={"dropout": RNG}, **kwargs
    )
    return variables, out


class TestEncoders:
    def test_mnist_audio_golden_flatten(self):
        cfg = StandardMultimodalConfig.load(AVMNIST_BASE_YAML, run_id=1)
        enc = cfg.model.kwargs["audio_encoder"].build()
        v, out = _init_apply(enc, jnp.zeros((2, 32, 94, 1)))
        assert out.shape == (2, 64)
        # 64ch * 5 * 15 = 4800 — the reference's precomputed constant.
        assert v["params"]["fc"]["kernel"].shape == (4800, 64)

    def test_mnist_image_golden_flatten(self):
        cfg = StandardMultimodalConfig.load(AVMNIST_BASE_YAML, run_id=1)
        enc = cfg.model.kwargs["image_encoder"].build()
        v, out = _init_apply(enc, jnp.zeros((2, 28, 28, 1)))
        assert out.shape == (2, 128)
        assert v["params"]["fc"]["kernel"].shape == (3136, 128)

    def test_resnet18_audio(self):
        enc = build_module("resnet18", in_channels=1, hidden_dim=64)
        _, out = _init_apply(enc, jnp.zeros((2, 32, 94, 1)))
        assert out.shape == (2, 64)

    def test_resnet34_image(self):
        enc = build_module("resnet34", in_channels=1, hidden_dim=128)
        _, out = _init_apply(enc, jnp.zeros((2, 28, 28, 1)))
        assert out.shape == (2, 128)

    def test_lenet5_golden_flatten(self):
        enc = build_module("lenet5", in_channels=1, hidden_dim=84)
        v, out = _init_apply(enc, jnp.zeros((2, 28, 28, 1)))
        assert out.shape == (2, 84)
        assert v["params"]["fc1"]["kernel"].shape == (400, 120)

    def test_fc_encoder(self):
        enc = build_module("fcencoder", input_dim=64, layers=[128, 32], dropout=0.0)
        _, out = _init_apply(enc, jnp.zeros((2, 64)))
        assert out.shape == (2, 32)

    def test_textcnn(self):
        enc = build_module("textcnn", input_size=768, embd_size=96)
        _, out = _init_apply(enc, jnp.zeros((2, 50, 768)))
        assert out.shape == (2, 96)

    @pytest.mark.parametrize("method", ["last", "attention", "maxpool"])
    def test_lstm_pooling_methods(self, method):
        enc = build_module(
            "lstmencoder", input_size=130, hidden_size=64, embd_method=method
        )
        x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 20, 130)), jnp.float32)
        lengths = jnp.array([20, 7, 1])
        v = enc.init({"params": RNG}, x, lengths)
        out = enc.apply(v, x, lengths)
        assert out.shape == (3, 64)

    def test_lstm_last_respects_lengths(self):
        enc = build_module("lstmencoder", input_size=8, hidden_size=16)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 10, 8)), jnp.float32)
        lengths = jnp.array([4, 10])
        v = enc.init({"params": RNG}, x, lengths)
        full = enc.apply(v, x, lengths)
        # Truncating sample 0 to its true length must not change its output.
        x_trunc = x.at[0, 4:].set(123.0)  # garbage beyond the length
        out_trunc = enc.apply(v, x_trunc, lengths)
        np.testing.assert_allclose(full[0], out_trunc[0], rtol=1e-5)


class TestFusion:
    def test_maxout_matches_naive(self):
        mod = build_module("maxout", input_dim=16, output_dim=8, num_units=3)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 16)), jnp.float32)
        v, out = _init_apply(mod, x)
        kernel = v["params"]["units"]["kernel"]  # (16, 24)
        bias = v["params"]["units"]["bias"]
        naive = (x @ kernel + bias).reshape(4, 3, 8).max(axis=1)
        np.testing.assert_allclose(out, naive, rtol=1e-5)

    def test_gated_bimodal(self):
        mod = build_module(
            "gated_bimodal",
            input_one_dim=64, input_two_dim=128,
            output_one_dim=32, output_two_dim=32,
        )
        _, out = _init_apply(mod, jnp.ones((2, 64)), jnp.ones((2, 128)))
        assert out.shape == (2, 32)

    @pytest.mark.parametrize("kind", ["max", "avg", "sum", "attention", "gated"])
    def test_multimodal_pooling(self, kind):
        mod = build_module(
            "multimodal_pooling",
            input_dim_a=64, input_dim_b=128, output_dim=32, pooling_type=kind,
        )
        _, out = _init_apply(mod, jnp.ones((2, 64)), jnp.ones((2, 128)))
        assert out.shape == (2, 32)


class TestAVMNISTModel:
    def test_full_model_forward_and_batchstats(self):
        cfg = StandardMultimodalConfig.load(AVMNIST_BASE_YAML, run_id=1)
        model = build_module(
            "avmnist",
            audio_encoder=cfg.model.kwargs["audio_encoder"],
            image_encoder=cfg.model.kwargs["image_encoder"],
            hidden_dim=128, dropout=0.5, fusion_fn="concat",
        )
        A, I = jnp.ones((2, 32, 94, 1)), jnp.ones((2, 28, 28, 1))
        v = model.init({"params": RNG}, A, I, train=False)
        logits, updates = model.apply(
            v, A, I, train=True, rngs={"dropout": RNG}, mutable=["batch_stats"]
        )
        assert logits.shape == (2, 10)
        assert "batch_stats" in updates
        # eval path is deterministic
        out1 = model.apply(v, A, I, train=False)
        out2 = model.apply(v, A, I, train=False)
        np.testing.assert_array_equal(out1, out2)

    def test_monomodal_encoder_head(self):
        enc_spec = StandardMultimodalConfig.load(AVMNIST_BASE_YAML, run_id=1)
        mono = build_module(
            "monomodal_encoder",
            encoder=enc_spec.model.kwargs["audio_encoder"],
            output_dim=64, num_classes=10,
        )
        _, out = _init_apply(mono, jnp.zeros((2, 32, 94, 1)))
        assert out.shape == (2, 10)


def test_residual_unet_ae_shapes_and_blocks():
    """ResidualUnetAE (reference autoencoder.py:152-255): mirrored U-Net fc
    stacks with concat/add skip fusion, residual block chaining, and the
    (final, {block: recon}) return shape."""
    import jax
    import jax.numpy as jnp

    from mmtpu.models import build_module

    for fusion in ("concat", "add"):
        ae = build_module(
            "residual_unet_ae", layers=[32, 16, 8], n_blocks=2,
            input_dim=24, dropout=0.0, fusion=fusion,
        )
        x = jnp.ones((4, 24))
        v = ae.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        out, blocks = ae.apply(v, x, train=False)
        assert out.shape == (4, 24)
        assert set(blocks) == {0, 1}
        assert all(b.shape == (4, 24) for b in blocks.values())
        # final ReLU: reconstructions are non-negative (reference quirk)
        import numpy as np

        assert float(np.asarray(out).min()) >= 0.0


def test_avmnist_none_modality_zero_embedding_substitution():
    """Reference parity (avmnist.py:261-262): a None modality with
    is_embd_X=True substitutes a zero embedding of the encoder's width —
    the C-MAM-style substitution path."""
    import jax
    import jax.numpy as jnp

    from mmtpu.models import build_module

    enc_args = dict(
        conv_block_one_one_args={"conv_one_in": 1, "conv_one_out": 4},
        conv_block_one_two_args={"conv_one_in": 4, "conv_one_out": 4},
        conv_block_two_one_args={"conv_one_in": 4, "conv_one_out": 8},
        conv_block_two_two_args={"conv_one_in": 8, "conv_one_out": 8},
    )
    model = build_module(
        "avmnist",
        audio_encoder=build_module("mnist_audio", hidden_dim=6, **enc_args),
        image_encoder=build_module("mnist_image", hidden_dim=10, **enc_args),
        hidden_dim=12, dropout=0.0, fusion_fn="concat",
    )
    g = np.random.default_rng(0)
    a = jnp.asarray(g.normal(size=(3, 32, 94, 1)), jnp.float32)
    i = jnp.asarray(g.normal(size=(3, 28, 28, 1)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, a, i, train=False)

    got = model.apply(variables, A=None, I=i, is_embd_A=True, train=False)
    want = model.apply(
        variables, A=jnp.zeros((3, 6), jnp.float32), I=i, is_embd_A=True,
        train=False,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # and the symmetric case
    got2 = model.apply(variables, A=a, I=None, is_embd_I=True, train=False)
    assert got2.shape == (3, 10)


def test_bert_finetune_enables_dropout_frozen_does_not():
    """Reference parity (bert_text_encoder.py:61-73): with use_finetune the
    torch BERT runs in train mode (dropout active) during training; the
    frozen path is deterministic."""
    import jax
    import jax.numpy as jnp

    from mmtpu.models.bert_text import BertTextEncoder

    text = np.ones((2, 3, 8), np.float32)
    text[:, 0, :] = np.arange(8)  # token ids
    x = jnp.asarray(text)

    def outputs(use_finetune, seed):
        enc = BertTextEncoder(
            use_finetune=use_finetune, pretrained_path=None,
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        )
        v = enc.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        return np.asarray(
            enc.apply(v, x, train=True,
                      rngs={"dropout": jax.random.PRNGKey(seed)})
        )

    frozen_a, frozen_b = outputs(False, 1), outputs(False, 2)
    np.testing.assert_array_equal(frozen_a, frozen_b)  # no dropout
    tuned_a, tuned_b = outputs(True, 1), outputs(True, 2)
    assert not np.array_equal(tuned_a, tuned_b)  # dropout active
