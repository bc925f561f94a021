"""PyTorch interop: load the reference's SHIPPED encoder checkpoint and
verify (a) byte-exact weight mapping, (b) numerical forward parity between
our Flax encoder and a functional torch replay of the reference module."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SHIPPED = Path(
    "/root/reference/MML_Suite/wheights/avmnist/lenet_image/lenet_image_best.pth"
)

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


def load_into_flax():
    from mmtpu.checkpoints.torch_interop import load_torch_checkpoint

    enc = build_encoder()
    v = enc.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 28, 28, 1)), train=False
    )
    params, stats = load_torch_checkpoint(SHIPPED, v["params"], v["batch_stats"])
    return enc, params, stats


def torch_forward(x_nchw: np.ndarray) -> np.ndarray:
    """Replay the reference MNISTImage (Sequential net.0..net.5) with
    torch.functional ops directly from the shipped state dict."""
    import torch
    import torch.nn.functional as F

    from mmtpu.checkpoints.torch_interop import _load_state_dict

    sd = {k: torch.from_numpy(np.array(v)) for k, v in _load_state_dict(SHIPPED).items()}
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


def test_weight_mapping_byte_exact():
    from mmtpu.checkpoints.torch_interop import _load_state_dict

    _, params, stats = load_into_flax()
    sd = _load_state_dict(SHIPPED)
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


def test_forward_parity_with_torch():
    enc, params, stats = load_into_flax()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 28, 28)).astype(np.float32)

    ours = enc.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x[..., None]),
        train=False,
    )
    theirs = torch_forward(x[:, None, :, :])
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)
