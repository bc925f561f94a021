"""Tests for the dead-in-reference long tail rebuilt in round 3:
variational encoders (lstmvar/textcnnvar/xencoder), domain encoders
(div_encoder/seq_encoder/language_embedding), and the CycleGAN-style
tools helpers (tools.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtpu.modalities import Modality
from mmtpu.models.domain import (
    DIVEncoder,
    LanguageEmbeddingLayer,
    SeqEncoder,
    masked_avg_pool,
)
from mmtpu.models.registry import build_module
from mmtpu.models.variational import (
    LinearVXE,
    VariationalLSTMEncoder,
    VariationalLSTMEncoder2,
    VariationalTextCNN,
)

RNG = jax.random.PRNGKey(0)
RNGS = {"params": RNG, "dropout": RNG, "sample": RNG}


class TestVariational:
    def test_lstm_var_shapes_and_eval_mean(self):
        m = VariationalLSTMEncoder(input_size=5, hidden_size=8)
        x = jnp.ones((4, 10, 5))
        vs = m.init(RNGS, x)
        z, mu, log_var = m.apply(vs, x, train=False)
        assert z.shape == mu.shape == log_var.shape == (4, 8)
        # eval: no sampling — z collapses to the mean
        np.testing.assert_allclose(np.asarray(z), np.asarray(mu))

    def test_lstm_var_train_samples(self):
        m = VariationalLSTMEncoder(input_size=5, hidden_size=8)
        x = jnp.ones((4, 10, 5))
        vs = m.init(RNGS, x)
        z, mu, _ = m.apply(
            vs, x, train=True, rngs={"sample": jax.random.PRNGKey(7)}
        )
        assert not np.allclose(np.asarray(z), np.asarray(mu))

    @pytest.mark.parametrize("method", ["last", "maxpool", "attention"])
    def test_lstm_var_pooling_methods(self, method):
        m = VariationalLSTMEncoder(input_size=5, hidden_size=8, embd_method=method)
        x = jnp.ones((2, 6, 5))
        vs = m.init(RNGS, x)
        z, _, _ = m.apply(vs, x)
        assert z.shape == (2, 8)

    @pytest.mark.parametrize("method", ["attention", "last"])
    def test_lstm_encoder2_relu_attention(self, method):
        # reference LSTMEncoder2 crashes at construction for its own
        # default embd_method (nn.relu(), lstmvar.py:96); works here
        m = VariationalLSTMEncoder2(input_size=5, hidden_size=8, embd_method=method)
        x = jnp.ones((3, 6, 5))
        vs = m.init(RNGS, x)
        out = m.apply(vs, x)
        assert out.shape == (3, 8)

    def test_textcnn_var(self):
        m = VariationalTextCNN(input_size=12, embd_size=16, out_channels=8)
        x = jnp.ones((3, 20, 12))
        vs = m.init(RNGS, x)
        z, mu, log_var = m.apply(vs, x)
        assert z.shape == (3, 16)
        np.testing.assert_allclose(np.asarray(z), np.asarray(mu))

    def test_linear_vxe_roundtrip_shapes(self):
        m = LinearVXE(input_dim=32, output_dim=24, feature_dim=8)
        x = jnp.ones((5, 32))
        vs = m.init(RNGS, x)
        rec, mu, log_var = m.apply(vs, x)
        assert rec.shape == (5, 24)
        assert mu.shape == log_var.shape == (5, 8)


class TestDIVEncoder:
    def _run(self, **kw):
        m = DIVEncoder(in_size=6, out_size=4, **kw)
        t = jnp.asarray(np.random.default_rng(0).normal(size=(3, 7, 6)), jnp.float32)
        o = jnp.asarray(np.random.default_rng(1).normal(size=(3, 7, 6)), jnp.float32)
        lengths = jnp.array([7, 5, 2])
        vs = m.init(RNGS, t, o, lengths)
        return m.apply(vs, t, o, lengths)

    def test_linear_avg(self):
        enc_l, enc_o, d, dl = self._run(prj_type="linear", rdc_type="avg")
        assert enc_l.shape == enc_o.shape == (3, 4)
        assert d is None and dl is None

    def test_linear_no_reduce_keeps_sequence(self):
        enc_l, enc_o, _, _ = self._run(prj_type="linear", rdc_type=None)
        assert enc_l.shape == (3, 7, 4)

    @pytest.mark.parametrize("rnn_type", ["lstm", "gru"])
    @pytest.mark.parametrize("rdc", ["last", "avg"])
    def test_rnn_paths(self, rnn_type, rdc):
        enc_l, enc_o, _, _ = self._run(
            prj_type="rnn", rnn_type=rnn_type, rdc_type=rdc
        )
        assert enc_l.shape == enc_o.shape == (3, 4)

    def test_discriminator_outputs_and_labels(self):
        enc_l, enc_o, d, dl = self._run(
            prj_type="linear", rdc_type="avg", use_disc=True
        )
        assert d.shape == (6,)
        assert np.all((np.asarray(d) >= 0) & (np.asarray(d) <= 1))
        np.testing.assert_array_equal(np.asarray(dl), [0, 0, 0, 1, 1, 1])

    def test_masked_avg_pool_matches_manual(self):
        x = jnp.asarray(np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3))
        lengths = jnp.array([2, 4])
        got = masked_avg_pool(x, lengths)
        want0 = np.asarray(x)[0, :2].mean(0)
        want1 = np.asarray(x)[1, :4].mean(0)
        np.testing.assert_allclose(np.asarray(got), [want0, want1], rtol=1e-6)


class TestSeqEncoder:
    @pytest.mark.parametrize("proj_type", ["linear", "cnn", "lstm", "gru"])
    def test_all_projection_types(self, proj_type):
        m = SeqEncoder(
            orig_dim_a=4, orig_dim_t=6, orig_dim_v=5, attention_dim=8,
            num_enc_layers=2, proj_type=proj_type,
        )
        rng = np.random.default_rng(0)
        t = jnp.asarray(rng.normal(size=(3, 7, 6)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(3, 7, 5)), jnp.float32)
        a = jnp.asarray(rng.normal(size=(3, 7, 4)), jnp.float32)
        lengths = jnp.array([7, 4, 2])
        vs = m.init(RNGS, t, v, a, lengths)
        out = m.apply(vs, t, v, a, lengths)
        assert set(out) == {Modality.TEXT, Modality.VIDEO, Modality.AUDIO}
        for seq, pooled in out.values():
            assert seq.shape == (3, 7, 8)
            assert pooled.shape == (3, 8)


class TestLanguageEmbedding:
    def test_glove_path(self):
        m = LanguageEmbeddingLayer(use_bert=False, vocab_size=50, embedding_dim=16)
        toks = jnp.asarray(np.arange(12).reshape(2, 6) % 50)
        vs = m.init(RNGS, sentences=toks)
        out = m.apply(vs, sentences=toks)
        assert out.shape == (2, 6, 16)

    def test_glove_requires_vocab(self):
        m = LanguageEmbeddingLayer(use_bert=False)
        with pytest.raises(ValueError, match="vocab_size"):
            m.init(RNGS, sentences=jnp.zeros((1, 3), jnp.int32))

    def test_bert_requires_all_inputs(self):
        m = LanguageEmbeddingLayer(use_bert=True)
        with pytest.raises(ValueError, match="BERT inputs"):
            m.init(RNGS, bert_sent=jnp.zeros((1, 3), jnp.int32))


class TestRegistry:
    @pytest.mark.parametrize(
        "name,kwargs",
        [
            ("div_encoder", {"in_size": 4, "out_size": 2}),
            ("seq_encoder", {"orig_dim_a": 2, "orig_dim_t": 2, "orig_dim_v": 2,
                             "attention_dim": 4}),
            ("language_embedding", {"use_bert": False, "vocab_size": 10,
                                    "embedding_dim": 4}),
            ("lstmencodervar", {"input_size": 4, "hidden_size": 4}),
            ("lstmencoder2var", {"input_size": 4, "hidden_size": 4}),
            ("textcnnvar", {"input_size": 4}),
            ("linearvxe", {"input_dim": 8, "output_dim": 8, "feature_dim": 2}),
            ("gated_transformer", {"input_dim": 4, "embed_dim": 8}),
        ],
    )
    def test_registered(self, name, kwargs):
        assert build_module(name, **kwargs) is not None


class TestTools:
    def _params(self):
        import flax.linen as nn

        class Net(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                x = nn.Conv(4, (3, 3), name="conv")(x)
                x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
                x = x.reshape((x.shape[0], -1))
                x = nn.Dense(8, name="fc")(x)
                return nn.Dense(2, name="head")(x)

        net = Net()
        vs = net.init(RNG, jnp.ones((2, 5, 5, 3)))
        return net, vs

    def test_init_weights_normal_stats(self):
        from mmtpu.models.tools import init_weights

        _, vs = self._params()
        new = init_weights(vs["params"], "normal", init_gain=0.5, seed=1,
                           batch_stats=vs["batch_stats"])
        k = np.asarray(new["fc"]["kernel"])
        # std ≈ 0.5, mean ≈ 0 for N(0, 0.5)
        assert 0.3 < k.std() < 0.7
        np.testing.assert_array_equal(np.asarray(new["fc"]["bias"]), 0)
        # BN: scale near 1, bias zero
        s = np.asarray(new["bn"]["scale"])
        assert np.all(np.abs(s - 1.0) < 3)
        np.testing.assert_array_equal(np.asarray(new["bn"]["bias"]), 0)

    def test_init_weights_orthogonal(self):
        from mmtpu.models.tools import init_weights

        _, vs = self._params()
        new = init_weights(vs["params"], "orthogonal", init_gain=1.0, seed=2)
        k = np.asarray(new["fc"]["kernel"])  # (72, 8)
        gram = k.T @ k
        np.testing.assert_allclose(gram, np.eye(8), atol=1e-4)

    def test_init_weights_kaiming_fan_in(self):
        from mmtpu.models.tools import init_weights

        _, vs = self._params()
        new = init_weights(vs["params"], "kaiming", seed=3)
        k = np.asarray(new["conv"]["kernel"])  # (3,3,3,4): fan_in=27
        expect = np.sqrt(2.0 / 27)
        assert abs(k.std() - expect) / expect < 0.5

    def test_init_weights_leaves_recurrent_params(self):
        from mmtpu.models.lstm import LSTMEncoder
        from mmtpu.models.tools import init_weights

        m = LSTMEncoder(4, 4)
        vs = m.init(RNGS, jnp.ones((2, 5, 4)))
        new = init_weights(vs["params"], "normal", init_gain=10.0, seed=4)
        np.testing.assert_array_equal(
            np.asarray(new["wi"]["kernel"]),
            np.asarray(vs["params"]["wi"]["kernel"]),
        )
        np.testing.assert_array_equal(
            np.asarray(new["wh"]), np.asarray(vs["params"]["wh"])
        )

    def test_get_norm_layer(self):
        from mmtpu.models.tools import get_norm_layer

        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6)), jnp.float32)
        for kind in ("instance", "layer", "none"):
            layer = get_norm_layer(kind)()
            vs = layer.init(RNG, x)
            assert layer.apply(vs, x).shape == x.shape
        with pytest.raises(NotImplementedError):
            get_norm_layer("bogus")

    def test_diagnose_network(self):
        from mmtpu.models.tools import diagnose_network

        grads = {"a": jnp.full((3,), -2.0), "b": {"c": jnp.full((2,), 4.0)}}
        assert diagnose_network(grads) == pytest.approx(3.0)

    def test_extract_mid_features(self):
        from mmtpu.models.tools import extract_mid_features

        net, vs = self._params()
        x = jnp.ones((2, 5, 5, 3))
        feats = extract_mid_features(net, vs, [x], layers="conv, fc")
        assert feats[0].shape == (2, 5, 5, 4)
        assert feats[1].shape == (2, 8)
        with pytest.raises(KeyError, match="not found"):
            extract_mid_features(net, vs, [x], layers="nope")
