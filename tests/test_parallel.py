"""Data-parallel correctness on the 8-virtual-device CPU mesh:
a train step over a sharded batch must produce the same parameters and
predictions as the unsharded single-device run (SPMD = math-invariant)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mmtpu.config.optim import OptimizerConfig
from mmtpu.models import build_module
from mmtpu.parallel.mesh import DATA_AXIS, MeshConfig, create_mesh
from mmtpu.train.losses import LossFunctionGroup
from mmtpu.train.optim import build_optimizer
from mmtpu.train.state import TrainState
from mmtpu.train.step import ClassificationTask, make_train_step

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def build_state_and_task():
    model = build_module(
        "fcclassifier", input_dim=16, layers=[32], output_dim=4, dropout=0.0
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)))["params"]
    tx, _ = build_optimizer(
        OptimizerConfig(name="Adam", default_kwargs={"lr": 0.01}), params
    )
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, batch_stats={}
    )
    task = ClassificationTask(
        model=model,
        loss_group=LossFunctionGroup.from_dict(
            {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
        ),
        input_keys=("x",),
    )
    return state, task


def make_batch(B=64):
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 4, B)
    return {
        "x": (rng.normal(size=(B, 16)) + labels[:, None]).astype(np.float32),
        "labels": labels,
    }


def test_sharded_step_matches_single_device():
    batch = make_batch()
    mesh = create_mesh(MeshConfig(data_parallel=8, model_parallel=1))

    # single-device
    state1, task = build_state_and_task()
    step = make_train_step(task, donate=False)
    rng = jax.random.PRNGKey(7)
    for k in range(3):
        state1, out1 = step(state1, jax.device_put(batch), jax.random.fold_in(rng, k))

    # sharded over the data axis
    state2, task2 = build_state_and_task()
    step2 = make_train_step(task2, mesh=mesh, donate=False)
    sharded = {
        k: jax.device_put(
            v, NamedSharding(mesh, P(DATA_AXIS, *([None] * (np.ndim(v) - 1))))
        )
        for k, v in batch.items()
    }
    with mesh:
        for k in range(3):
            state2, out2 = step2(state2, sharded, jax.random.fold_in(rng, k))

    np.testing.assert_allclose(
        np.asarray(state1.params["fc_out"]["kernel"]),
        np.asarray(state2.params["fc_out"]["kernel"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_array_equal(np.asarray(out1["preds"]), np.asarray(out2["preds"]))
    # gradient all-reduce really crossed devices
    assert len(state2.params["fc_out"]["kernel"].devices()) >= 1
