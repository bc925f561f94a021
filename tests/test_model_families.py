"""Shape/training tests for UttFusion (MOSI), MMIMDb, KineticsSounds,
Transformer, and autoencoders."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtpu.models import build_module

RNG = jax.random.PRNGKey(0)


def test_utt_fusion_forward():
    model = build_module(
        "utt_fusion",
        netA=build_module("lstmencoder", input_size=5, hidden_size=32),
        netV=build_module("lstmencoder", input_size=20, hidden_size=32),
        netT=build_module("textcnn", input_size=768, embd_size=64),
        netC=build_module(
            "fcclassifier", input_dim=128, layers=[64], output_dim=3, dropout=0.0
        ),
    )
    A = jnp.ones((2, 50, 5))
    V = jnp.ones((2, 50, 20))
    T = jnp.ones((2, 50, 768))
    v = model.init({"params": RNG, "dropout": RNG}, A, V, T, train=False)
    out = model.apply(v, A, V, T, train=False)
    assert out.shape == (2, 3)


def _small_utt_fusion(embd_method="maxpool", hidden_v=32):
    return build_module(
        "utt_fusion",
        netA=build_module("lstmencoder", input_size=5, hidden_size=32,
                          embd_method=embd_method),
        netV=build_module("lstmencoder", input_size=20, hidden_size=hidden_v,
                          embd_method=embd_method),
        netT=build_module("textcnn", input_size=64, embd_size=16),
        netC=build_module(
            "fcclassifier", input_dim=32 + hidden_v + 16, layers=[32],
            output_dim=3, dropout=0.0,
        ),
    )


def test_utt_fusion_stacked_lstm_parity(monkeypatch):
    """The stacked two-encoder recurrence (one scan) must match the
    per-encoder path exactly — forward AND gradients, for every pooling."""
    from mmtpu.models.utt_fusion import UttFusionModel

    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.normal(size=(4, 12, 5)), jnp.float32)
    V = jnp.asarray(rng.normal(size=(4, 12, 20)), jnp.float32)
    T = jnp.asarray(rng.normal(size=(4, 12, 64)), jnp.float32)

    for method in ("last", "attention", "maxpool"):
        model = _small_utt_fusion(method)
        assert model._can_stack(A, V, False, False)
        v = model.init({"params": RNG, "dropout": RNG}, A, V, T, train=False)
        fast = model.apply(v, A, V, T, train=False)

        def loss(params):
            return jnp.sum(model.apply({**v, "params": params},
                                       A, V, T, train=False) ** 2)

        g_fast = jax.grad(loss)(v["params"])

        with monkeypatch.context() as m:
            m.setattr(UttFusionModel, "_can_stack",
                      lambda self, *a, **k: False)
            slow = model.apply(v, A, V, T, train=False)
            g_slow = jax.grad(loss)(v["params"])

        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   rtol=1e-5, atol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            ),
            g_fast, g_slow,
        )


def test_utt_fusion_stack_dispatch_guards():
    """Mismatched hidden sizes (or embedding inputs) fall back cleanly."""
    model = _small_utt_fusion(hidden_v=16)
    A = jnp.ones((2, 10, 5))
    V = jnp.ones((2, 10, 20))
    T = jnp.ones((2, 10, 64))
    assert not model._can_stack(A, V, False, False)
    assert not _small_utt_fusion()._can_stack(A, None, False, False)
    assert not _small_utt_fusion()._can_stack(A, V, False, True)
    v = model.init({"params": RNG, "dropout": RNG}, A, V, T, train=False)
    assert model.apply(v, A, V, T, train=False).shape == (2, 3)


def test_mmimdb_gmu_and_pooling():
    common = dict(
        image_encoder=build_module(
            "mmimdb_modality_encoder", input_dim=4096, output_dim=512
        ),
        text_encoder=build_module(
            "mmimdb_modality_encoder", input_dim=300, output_dim=512
        ),
        classifier=build_module(
            "mlp_genre_classifier", input_size=512, output_size=23, hidden_size=512
        ),
    )
    gmu = build_module(
        "mmimdb",
        gated_bimodal_network=build_module(
            "gated_bimodal",
            input_one_dim=512, input_two_dim=512,
            output_one_dim=512, output_two_dim=512,
        ),
        **common,
    )
    I, T = jnp.ones((2, 4096)), jnp.ones((2, 300))
    v = gmu.init({"params": RNG, "dropout": RNG}, I, T, train=False)
    assert gmu.apply(v, I, T, train=False).shape == (2, 23)
    # batch_stats must exist (BN in encoders + classifier)
    assert "batch_stats" in v

    pooled = build_module(
        "mmimdb", multimodal_pooling={"pooling_type": "avg"}, **common
    )
    v2 = pooled.init({"params": RNG, "dropout": RNG}, I, T, train=False)
    assert pooled.apply(v2, I, T, train=False).shape == (2, 23)


def test_kinetics_sounds_forward():
    def cb(cin, cout):
        return build_module(
            "conv_block",
            conv_block_one_args={"conv_one_in": cin, "conv_one_out": cout},
            conv_block_two_args={"conv_one_in": cout, "conv_one_out": cout},
        )

    model = build_module(
        "kineticssounds",
        audio_encoder=build_module(
            "kinetics_sounds_audio_encoder",
            conv_block_one=cb(1, 16),
            conv_block_two=cb(16, 32),
            conv_block_three=cb(32, 32),
            fc_one_input_size=128,
        ),
        video_encoder=build_module("kinetics_sounds_video_encoder"),
        hidden_dim_one=128,
        hidden_dim_two=64,
    )
    A = jnp.ones((2, 128, 128, 1))
    V = jnp.ones((2, 400))
    v = model.init({"params": RNG, "dropout": RNG}, A, V, train=False)
    assert model.apply(v, A, V, train=False).shape == (2, 26)


def test_transformer_vae():
    model = build_module("transformer", width=64, layers=2, heads=4, embd_width=32)
    x = jnp.ones((2, 10, 64))
    v = model.init({"params": RNG, "dropout": RNG, "sample": RNG}, x, train=False)
    z, mu, log_var = model.apply(v, x, train=False)
    assert z.shape == mu.shape == log_var.shape == (2, 32)
    # eval-mode z == mu (zero eps)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(mu))
    # train mode samples
    z_t, mu_t, _ = model.apply(
        v, x, train=True, rngs={"dropout": RNG, "sample": RNG}
    )
    assert not np.allclose(np.asarray(z_t), np.asarray(mu_t))


def test_residual_ae_shapes():
    ae = build_module(
        "residual_ae", layers=[32, 16], n_blocks=2, input_dim=64, dropout=0.0
    )
    x = jnp.ones((4, 64))
    v = ae.init({"params": RNG}, x, train=False)
    recon, latents = ae.apply(v, x, train=False)
    assert recon.shape == (4, 64)
    assert latents.shape == (4, 32)  # n_blocks * last layer (2*16)


def test_residual_xe_output_dim():
    xe = build_module(
        "residual_xe", layers=[32], n_blocks=1, input_dim=64, output_dim=48,
        dropout=0.0,
    )
    x = jnp.ones((4, 64))
    v = xe.init({"params": RNG}, x, train=False)
    recon, _ = xe.apply(v, x, train=False)
    assert recon.shape == (4, 48)
