"""Pretrained-encoder handoff into models whose encoders live under
net{A,V,T} attributes (UttFusion), mirroring the reference's resolution
order netX → {modality}_model → {modality}_encoder
(train_multimodal.py:165-180)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmtpu.checkpoints.manager import CheckpointManager
from mmtpu.cli import common
from mmtpu.models import build_module


class _LoggingCfg:
    def format_path(self, p):
        return p


def test_utt_fusion_netA_receives_pretrained_encoder(tmp_path):
    netA = build_module("lstmencoder", input_size=5, hidden_size=8,
                        embd_method="last")
    netV = build_module("lstmencoder", input_size=6, hidden_size=8,
                        embd_method="last")
    netT = build_module("textcnn", input_size=12, embd_size=8)
    netC = build_module("fcclassifier", input_dim=24, layers=[8],
                        output_dim=3, dropout=0.0)
    model = build_module("utt_fusion", netA=netA, netV=netV, netT=netT,
                         netC=netC)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(2, 7, 5)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 7, 6)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(2, 7, 12)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, a, v, t,
                           train=False)

    # pretrain artifact: a standalone LSTMEncoder with DIFFERENT params
    solo = build_module("lstmencoder", input_size=5, hidden_size=8,
                        embd_method="last")
    solo_vars = solo.init({"params": jax.random.PRNGKey(42)}, a, train=False)
    mgr = CheckpointManager(tmp_path)
    art = mgr.save_encoder(solo_vars["params"], "audio")

    params, stats, loaded = common.load_pretrained_encoders(
        variables["params"], variables.get("batch_stats"),
        {"audio": str(art)}, _LoggingCfg(), run_id=1,
    )
    assert loaded == ["audio"]
    got = jax.tree_util.tree_leaves(params["netA"])
    want = jax.tree_util.tree_leaves(solo_vars["params"])
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # other encoders untouched
    before = jax.tree_util.tree_leaves(variables["params"]["netV"])
    after = jax.tree_util.tree_leaves(params["netV"])
    for b, a_ in zip(before, after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a_))
