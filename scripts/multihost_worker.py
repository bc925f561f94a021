"""Multi-process mesh worker (SURVEY §5.8: the mesh abstraction must not
preclude multi-host).

Launched by scripts/multihost_dryrun.py as N processes, each owning
`--local-devices` virtual CPU devices; together they form one global mesh
via jax.distributed.initialize + gloo CPU collectives. Each worker builds
the SAME compact DP x TP training step as __graft_entry__.dryrun_multichip
(shared _compact_setup), materializes the global batch/params with
mmtpu.parallel.mesh.put_global (make_array_from_callback under
multi-process — plain device_put cannot address remote devices), runs ONE
step, and prints the loss plus a checksum over the replicated param leaves
after the update. The launcher asserts both match a single-process run at
rtol 2e-5.

With --num-processes 1 this doubles as the single-process baseline.
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="127.0.0.1:9777")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--local-devices", type=int, default=4)
    args = ap.parse_args()

    import jax

    # configure the backend BEFORE anything touches it: the axon
    # sitecustomize pins JAX at the tunneled TPU otherwise (see
    # __graft_entry__._ensure_devices)
    from jax._src import xla_bridge as xb

    if getattr(xb, "_backends", None):
        xb._clear_backends()
        xb.get_backend.cache_clear()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    if args.num_processes > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, __import__("os").path.dirname(
        __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
    from __graft_entry__ import _compact_setup
    from mmtpu.config.optim import OptimizerConfig
    from mmtpu.parallel.mesh import (
        DATA_AXIS, MeshConfig, create_mesh, put_global)
    from mmtpu.train.losses import LossFunctionGroup
    from mmtpu.train.optim import build_optimizer
    from mmtpu.train.state import TrainState
    from mmtpu.train.step import ClassificationTask, make_train_step

    n_global = args.num_processes * args.local_devices
    assert len(jax.devices()) == n_global, (
        f"expected {n_global} global devices, got {len(jax.devices())}")
    mp = 2 if n_global % 2 == 0 else 1
    mesh = create_mesh(MeshConfig(data_parallel=n_global // mp,
                                  model_parallel=mp))

    B = 2 * n_global
    model, variables, batch_np, param_spec = _compact_setup(B)
    v_host = jax.device_get(variables)

    params = jax.tree_util.tree_map_with_path(
        lambda path, x: put_global(
            x, NamedSharding(mesh, param_spec(path, x))),
        v_host["params"],
    )
    batch_stats = jax.tree_util.tree_map(
        lambda x: put_global(x, NamedSharding(mesh, P())),
        v_host["batch_stats"],
    )
    batch = {
        k: put_global(v, NamedSharding(
            mesh, P(DATA_AXIS, *([None] * (np.asarray(v).ndim - 1)))))
        for k, v in batch_np.items()
    }

    tx, _ = build_optimizer(
        OptimizerConfig(name="Adam",
                        default_kwargs={"lr": 5e-4, "weight_decay": 1e-4}),
        params,
    )
    state = TrainState.create(
        apply_fn=model.apply, params=params, batch_stats=batch_stats, tx=tx)
    task = ClassificationTask(
        model=model,
        loss_group=LossFunctionGroup.from_dict(
            {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
        ),
        input_keys=("audio", "image"),
    )
    step = make_train_step(task, mesh=mesh, donate=False)
    rng = jax.random.PRNGKey(0)
    with mesh:
        new_state, out = step(state, batch, rng)

    loss = float(np.asarray(out["loss"].addressable_data(0)))
    # checksum over the REPLICATED param leaves after the update (TP-sharded
    # leaves are only partially addressable per process; the replicated ones
    # are bitwise-complete everywhere and cover both encoders)
    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(new_state.params):
        if param_spec(path, leaf) == P():
            total += float(np.abs(np.asarray(leaf.addressable_data(0))).sum())

    # -- device-resident scan epoch on the same global mesh ---------------
    # (the path __graft_entry__._scan_on_mesh_check proves single-process;
    # here it must survive multi-process placement: DeviceResidentData /
    # replicate_tree / put_schedule all route through mesh.put_global)
    scan_loss = _scan_epoch_loss(n_global)

    print(f"MULTIHOST pid={args.process_id} procs={args.num_processes} "
          f"loss={loss!r} repl_checksum={total!r} scan_loss={scan_loss!r}",
          flush=True)


def _scan_epoch_loss(n_global: int) -> float:
    """One device-resident scan train epoch over a pure-DP global mesh;
    returns the first scan-step loss (deterministic given the fixed
    seeds, so the launcher can compare 1-process vs 2-process runs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmtpu.config.optim import OptimizerConfig
    from mmtpu.data.avmnist import SyntheticAVMNIST
    from mmtpu.models import build_module
    from mmtpu.parallel.mesh import MeshConfig, create_mesh
    from mmtpu.train import device_loop as dl
    from mmtpu.train.losses import LossFunctionGroup
    from mmtpu.train.optim import build_optimizer
    from mmtpu.train.state import TrainState
    from mmtpu.train.step import ClassificationTask

    mesh = create_mesh(MeshConfig(data_parallel=n_global, model_parallel=1))
    ds = SyntheticAVMNIST(split="train", num_samples=8 * n_global,
                          selected_patterns=["ai"], seed=0)
    model = build_module(
        "avmnist",
        audio_encoder=build_module("fcencoder", input_dim=3008, layers=[16],
                                   dropout=0.0),
        image_encoder=build_module("fcencoder", input_dim=784, layers=[16],
                                   dropout=0.0),
        hidden_dim=16, dropout=0.0, fusion_fn="concat",
    )
    rng = jax.random.PRNGKey(0)
    v = jax.device_get(model.init(
        {"params": rng}, jnp.zeros((2, 32, 94, 1)), jnp.zeros((2, 28, 28, 1)),
        train=False))
    task = ClassificationTask(
        model=model,
        loss_group=LossFunctionGroup.from_dict(
            {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
        ),
        input_keys=("audio", "image"),
    )
    tx, _ = build_optimizer(
        OptimizerConfig(name="Adam", default_kwargs={"lr": 1e-3}),
        v["params"])
    state = TrainState.create(
        apply_fn=model.apply, params=dl.replicate_tree(v["params"], mesh),
        batch_stats=dl.replicate_tree(v.get("batch_stats", {}), mesh),
        tx=tx,
    )
    data = dl.DeviceResidentData.upload(ds, mesh=mesh)
    fn = dl.make_scan_train_epoch(task, data, mesh=mesh)
    schedule = dl.put_schedule(
        dl.build_schedule(ds, 2 * n_global, 0, False, 0, "train"), mesh)
    _, outs = fn(state, schedule, rng)
    losses = np.asarray(outs["loss"].addressable_data(0)).ravel()
    return float(losses[0])


if __name__ == "__main__":
    main()
