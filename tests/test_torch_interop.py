"""PyTorch interop: load the reference's SHIPPED encoder checkpoint and
verify (a) byte-exact weight mapping, (b) numerical forward parity between
our Flax encoder and a functional torch replay of the reference module."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_WHEIGHTS = Path("/root/reference/MML_Suite/wheights/avmnist")
SHIPPED = _WHEIGHTS / "lenet_image/lenet_image_best.pth"
# ALL shipped image artifact families (reference train_multimodal.py:156-204
# serves every one). The directory names track the EXPERIMENT's audio
# encoder; the image encoder inside each is the same MNISTImage ConvBlock
# architecture (30 tensors, net.5: 3136->64) with distinct trained weights.
# lenet_image is a bare state dict; the rest pickle the full module and
# exercise torch_interop's stub-module unpickler.
ALL_SHIPPED = [
    SHIPPED,
    _WHEIGHTS / "cnn_image_1/image_encoder_best.pt",
    _WHEIGHTS / "mlp_image/mlp_image_best.pth",
    _WHEIGHTS / "textcnn_image/encoder_image_best.pth",
    _WHEIGHTS / "fc_image/fc_image_best.pth",
    _WHEIGHTS / "residualae_image/encoder_image_best.pth",
]
_IDS = [p.parent.name for p in ALL_SHIPPED]

pytestmark = pytest.mark.skipif(
    not SHIPPED.exists(), reason="reference weights not mounted"
)


def build_encoder():
    from mmtpu.models import build_module

    return build_module(
        "mnist_image", hidden_dim=64,
        conv_block_one_one_args={"conv_one_in": 1, "conv_one_out": 32},
        conv_block_one_two_args={"conv_one_in": 32, "conv_one_out": 32},
        conv_block_two_one_args={"conv_one_in": 32, "conv_one_out": 64},
        conv_block_two_two_args={"conv_one_in": 64, "conv_one_out": 64},
    )


def load_into_flax(path=SHIPPED):
    from mmtpu.checkpoints.torch_interop import load_torch_checkpoint

    enc = build_encoder()
    v = enc.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 28, 28, 1)), train=False
    )
    params, stats = load_torch_checkpoint(path, v["params"], v["batch_stats"])
    return enc, params, stats


def torch_forward(x_nchw: np.ndarray, path=SHIPPED) -> np.ndarray:
    """Replay the reference MNISTImage (Sequential net.0..net.5) with
    torch.functional ops directly from the shipped state dict."""
    import torch
    import torch.nn.functional as F

    from mmtpu.checkpoints.torch_interop import _load_state_dict

    sd = {k: torch.from_numpy(np.array(v)) for k, v in _load_state_dict(path).items()}
    x = torch.from_numpy(x_nchw)

    def conv_bn(x, conv, bn):
        x = F.conv2d(x, sd[f"{conv}.weight"], sd[f"{conv}.bias"], padding=1)
        x = F.batch_norm(
            x, sd[f"{bn}.running_mean"], sd[f"{bn}.running_var"],
            sd[f"{bn}.weight"], sd[f"{bn}.bias"], training=False, eps=1e-5,
        )
        return F.relu(x)

    x = conv_bn(x, "net.0.conv_one", "net.0.batch_norm_one")
    x = conv_bn(x, "net.0.conv_two", "net.0.batch_norm_two")
    x = F.max_pool2d(x, 2)
    x = conv_bn(x, "net.2.conv_one", "net.2.batch_norm_one")
    x = conv_bn(x, "net.2.conv_two", "net.2.batch_norm_two")
    x = F.max_pool2d(x, 2)
    x = x.flatten(1)
    x = F.linear(x, sd["net.5.weight"], sd["net.5.bias"])
    return x.numpy()


@pytest.mark.parametrize("shipped", ALL_SHIPPED, ids=_IDS)
def test_weight_mapping_byte_exact(shipped):
    from mmtpu.checkpoints.torch_interop import _load_state_dict

    _, params, stats = load_into_flax(shipped)
    sd = _load_state_dict(shipped)
    np.testing.assert_array_equal(
        np.asarray(params["block_one"]["conv_1"]["kernel"]),
        sd["net.0.conv_one.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        np.asarray(stats["block_two"]["bn_2"]["var"]),
        sd["net.2.batch_norm_two.running_var"],
    )
    # fc consumes the conv flatten: torch NCHW-major → flax NHWC-major
    w = sd["net.5.weight"].reshape(64, 64, 7, 7).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(
        np.asarray(params["fc"]["kernel"]), w.reshape(64, 3136).T
    )


@pytest.mark.parametrize("shipped", ALL_SHIPPED, ids=_IDS)
def test_forward_parity_with_torch(shipped):
    enc, params, stats = load_into_flax(shipped)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 28, 28)).astype(np.float32)

    ours = enc.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x[..., None]),
        train=False,
    )
    theirs = torch_forward(x[:, None, :, :], shipped)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


def test_shipped_artifacts_are_distinct():
    """The six families carry DISTINCT trained weights (same architecture)
    — guards against the mapping silently reading the wrong file."""
    from mmtpu.checkpoints.torch_interop import _load_state_dict

    firsts = [
        np.asarray(_load_state_dict(p)["net.5.weight"]) for p in ALL_SHIPPED
    ]
    for i in range(len(firsts)):
        for j in range(i + 1, len(firsts)):
            assert not np.array_equal(firsts[i], firsts[j]), (
                f"{ALL_SHIPPED[i]} and {ALL_SHIPPED[j]} have identical "
                "net.5 weights"
            )


class TestFusedLSTMInterop:
    """Torch nn.LSTM checkpoints convert into the fused LSTMEncoder layout
    (the round-3 default backend): weight mapping + forward parity + orbax
    round-trip stability (VERDICT r2 #5)."""

    I, H, B, T = 10, 16, 4, 12

    def _torch_encoder(self):
        import torch
        import torch.nn as nn

        torch.manual_seed(0)

        class TorchLSTMEncoder(nn.Module):
            def __init__(self, I, H):
                super().__init__()
                self.rnn = nn.LSTM(I, H, batch_first=True)
                self.attention_vector_weight = nn.Parameter(
                    torch.randn(H, 1) * 0.1
                )
                self.attention_layer = nn.Sequential(
                    nn.Linear(H, H), nn.Tanh()
                )

            def forward(self, x):
                r_out, (h_n, _) = self.rnn(x)
                hidden_reps = self.attention_layer(r_out)
                atten = torch.softmax(
                    (hidden_reps @ self.attention_vector_weight).squeeze(-1),
                    dim=-1,
                )
                return (r_out * atten.unsqueeze(-1)).sum(dim=1), h_n[0]

        return TorchLSTMEncoder(self.I, self.H)

    def _flax_encoder(self):
        from mmtpu.models import build_module

        return build_module(
            "lstmencoder", input_size=self.I, hidden_size=self.H,
            embd_method="attention",
        )

    def test_conversion_and_forward_parity(self, tmp_path):
        import torch

        tenc = self._torch_encoder().eval()
        pth = tmp_path / "encoder_audio_best.pth"
        torch.save(tenc.state_dict(), pth)

        from mmtpu.checkpoints.torch_interop import load_torch_checkpoint

        enc = self._flax_encoder()
        v = enc.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((2, self.T, self.I)), train=False,
        )
        params = load_torch_checkpoint(pth, v["params"])

        sd = {k: v.detach().numpy() for k, v in tenc.state_dict().items()}
        np.testing.assert_array_equal(
            np.asarray(params["wi"]["kernel"]), sd["rnn.weight_ih_l0"].T
        )
        np.testing.assert_array_equal(
            np.asarray(params["wh"]), sd["rnn.weight_hh_l0"].T
        )
        np.testing.assert_array_equal(
            np.asarray(params["wi"]["bias"]),
            sd["rnn.bias_ih_l0"] + sd["rnn.bias_hh_l0"],
        )

        rng = np.random.default_rng(3)
        x = rng.normal(size=(self.B, self.T, self.I)).astype(np.float32)
        ours = enc.apply({"params": params}, jnp.asarray(x), train=False)
        with torch.no_grad():
            attn_t, _ = tenc(torch.from_numpy(x))
        np.testing.assert_allclose(
            np.asarray(ours), attn_t.numpy(), rtol=2e-5, atol=2e-6
        )

    def test_orbax_roundtrip_preserves_forward(self, tmp_path):
        """Checkpoint round-trip for the fused layout: the shape dispatch
        (Pallas vs XLA inside lstm_sequence) shares one parameter layout,
        so save->restore->forward is bit-stable."""
        from mmtpu.checkpoints.manager import CheckpointManager
        from mmtpu.config.optim import OptimizerConfig
        from mmtpu.train.optim import build_optimizer
        from mmtpu.train.state import TrainState

        enc = self._flax_encoder()
        v = enc.init(
            {"params": jax.random.PRNGKey(1)},
            jnp.zeros((2, self.T, self.I)), train=False,
        )
        tx, _ = build_optimizer(
            OptimizerConfig(name="Adam", default_kwargs={"lr": 1e-3}),
            v["params"],
        )
        state = TrainState.create(
            apply_fn=enc.apply, params=v["params"], batch_stats={}, tx=tx
        )
        mgr = CheckpointManager(str(tmp_path))
        mgr.save_checkpoint(state, epoch=1, metric_value=0.5)

        v2 = enc.init(
            {"params": jax.random.PRNGKey(99)},
            jnp.zeros((2, self.T, self.I)), train=False,
        )
        state2 = TrainState.create(
            apply_fn=enc.apply, params=v2["params"], batch_stats={}, tx=tx
        )
        restored = mgr.load_checkpoint(state2, "best")

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(self.B, self.T, self.I)), jnp.float32)
        a = enc.apply({"params": state.params}, x, train=False)
        b = enc.apply({"params": restored.params}, x, train=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dense_named_fc_without_conv_flatten_is_not_permuted(tmp_path):
    """The flatten-permutation allowlist must not scramble a Dense that
    merely SHARES the name fc/fc1 (ResNet's pooled fc at in=512,
    LSTMClassifier's fc1 at hidden size): only exact known conv-flatten
    geometries permute."""
    import flax.linen as nn
    import torch

    from mmtpu.checkpoints.torch_interop import load_torch_checkpoint

    class TorchHead(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = torch.nn.Linear(512, 10)   # 512 % 64 == 0: the old
            self.fc1 = torch.nn.Linear(128, 4)   # heuristic would scramble

    th = TorchHead()
    pth = tmp_path / "head.pth"
    torch.save(th.state_dict(), pth)

    class FlaxHead(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(10, name="fc")(x), nn.Dense(4, name="fc1")(
                x[:, :128]
            )

    import jax

    v = FlaxHead().init(jax.random.PRNGKey(0), jnp.zeros((1, 512)))
    params = load_torch_checkpoint(pth, v["params"])
    np.testing.assert_array_equal(
        np.asarray(params["fc"]["kernel"]),
        th.fc.weight.detach().numpy().T,
    )
    np.testing.assert_array_equal(
        np.asarray(params["fc1"]["kernel"]),
        th.fc1.weight.detach().numpy().T,
    )
