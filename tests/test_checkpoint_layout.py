"""LSTM checkpoint-layout bridging (mmtpu/checkpoints/manager.py
adapt_lstm_layout): checkpoints written by either LSTMEncoder backend —
per-gate OptimizedLSTMCell params (backend='rnn') or the fused wi/wh
layout (backend='fused', the default) — restore into a model built with
the other backend, with exact numerical parity. This is what lets
monomodal pretrain artifacts recorded before the fused-default flip chain
into pretrained UttFusion runs (reference handoff:
train_monomodal.py:790-802 -> train_multimodal.py:156-204)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mmtpu.checkpoints.manager import (
    CheckpointManager,
    adapt_lstm_layout,
    load_encoder_checkpoint,
)
from mmtpu.models import build_module
from mmtpu.train.state import TrainState


def _make(backend, key, x, lengths):
    m = build_module(
        "lstmencoder",
        input_size=int(x.shape[-1]),
        hidden_size=8,
        embd_method="attention",  # extra params beside the cell/wi/wh
        backend=backend,
    )
    v = m.init({"params": jax.random.PRNGKey(key)}, x, lengths, train=False)
    return m, v


def _data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 9, 5)), jnp.float32)
    lengths = jnp.asarray([9, 4, 7], jnp.int32)
    return x, lengths


def test_rnn_checkpoint_restores_into_fused_model(tmp_path):
    x, lengths = _data()
    rnn_model, rnn_vars = _make("rnn", 7, x, lengths)
    fused_model, fused_vars = _make("fused", 1, x, lengths)

    art = CheckpointManager(tmp_path).save_encoder(rnn_vars["params"], "audio")
    params, _ = load_encoder_checkpoint(art, fused_vars["params"])

    want = rnn_model.apply(rnn_vars, x, lengths, train=False)
    got = fused_model.apply({"params": params}, x, lengths, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_checkpoint_restores_into_rnn_model(tmp_path):
    x, lengths = _data()
    fused_model, fused_vars = _make("fused", 7, x, lengths)
    rnn_model, rnn_vars = _make("rnn", 1, x, lengths)

    art = CheckpointManager(tmp_path).save_encoder(fused_vars["params"], "audio")
    params, _ = load_encoder_checkpoint(art, rnn_vars["params"])

    want = fused_model.apply(fused_vars, x, lengths, train=False)
    got = rnn_model.apply({"params": params}, x, lengths, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_matching_layouts_pass_through_unchanged(tmp_path):
    x, lengths = _data()
    _, fused_vars = _make("fused", 7, x, lengths)
    from flax import serialization

    sd = serialization.to_state_dict(fused_vars["params"])
    out = adapt_lstm_layout(sd, sd)
    for g, w in zip(
        jax.tree_util.tree_leaves(out), jax.tree_util.tree_leaves(sd)
    ):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_async_io_roundtrip_and_snapshot_isolation(tmp_path):
    """async_io=True: writes land on a writer thread; load paths drain the
    queue; and the snapshot is a REAL copy — mutating (donating over) the
    source buffers after save must not corrupt what hits disk."""
    x, lengths = _data()
    model, variables = _make("fused", 7, x, lengths)
    tx = optax.adam(1e-3)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )
    mgr = CheckpointManager(tmp_path, async_io=True)
    want = jax.device_get(state.params)
    mgr.save_rolling(state, epoch=3, meta={"marker": 1})
    mgr.save_checkpoint(state, epoch=3, metric_value=0.25)

    # "donate": overwrite the live buffers the snapshot was taken from
    state = state.replace(
        params=jax.tree_util.tree_map(lambda p: p * 0.0 + 7.0, state.params)
    )

    meta = mgr.load_resume_meta()  # drains the writer queue
    assert meta == {"epoch": 3, "marker": 1}
    model2, fresh = _make("fused", 1, x, lengths)
    restored = mgr.load_checkpoint(
        TrainState.create(apply_fn=model2.apply, params=fresh["params"], tx=tx),
        "last",
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(restored.params), want,
    )
    mgr.wait()
    assert (tmp_path / "best.ckpt").exists()
    assert (tmp_path / "epoch_3.ckpt").exists()


def test_trainstate_restore_carries_adam_moments_across_layouts(tmp_path):
    """Full-state restore: Adam mu/nu mirror the param tree, so the same
    gate-block concatenation must carry them into the fused layout."""
    x, lengths = _data()
    rnn_model, rnn_vars = _make("rnn", 7, x, lengths)
    fused_model, fused_vars = _make("fused", 1, x, lengths)
    tx = optax.adam(1e-3)

    def make_state(model, variables):
        return TrainState.create(
            apply_fn=model.apply, params=variables["params"], tx=tx
        )

    state = make_state(rnn_model, rnn_vars)

    def loss_fn(p):
        out = rnn_model.apply({"params": p}, x, lengths, train=False)
        return jnp.sum(out**2)

    grads = jax.grad(loss_fn)(state.params)
    state = state.apply_gradients(grads=grads)  # non-zero mu/nu

    mgr = CheckpointManager(tmp_path)
    mgr.save_checkpoint(state, epoch=1, metric_value=0.5)

    restored = mgr.load_checkpoint(make_state(fused_model, fused_vars))

    # params: fused wi kernel == concat of per-gate i* kernels, i/f/g/o
    cell = state.params["OptimizedLSTMCell_0"]
    np.testing.assert_allclose(
        np.asarray(restored.params["wi"]["kernel"]),
        np.concatenate(
            [np.asarray(cell[f"i{g}"]["kernel"]) for g in "ifgo"], axis=-1
        ),
    )
    np.testing.assert_allclose(
        np.asarray(restored.params["wh"]),
        np.concatenate(
            [np.asarray(cell[f"h{g}"]["kernel"]) for g in "ifgo"], axis=-1
        ),
    )
    # optimizer moments carried through the same transformation
    mu_cell = state.opt_state[0].mu["OptimizedLSTMCell_0"]
    mu_rest = restored.opt_state[0].mu
    np.testing.assert_allclose(
        np.asarray(mu_rest["wi"]["kernel"]),
        np.concatenate(
            [np.asarray(mu_cell[f"i{g}"]["kernel"]) for g in "ifgo"], axis=-1
        ),
    )
    assert float(jnp.max(jnp.abs(mu_rest["wi"]["kernel"]))) > 0.0

    # the restored fused model computes the rnn model's function
    want = rnn_model.apply({"params": state.params}, x, lengths, train=False)
    got = fused_model.apply(
        {"params": restored.params}, x, lengths, train=False
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_async_submit_surfaces_writer_errors(tmp_path):
    """A failed async write must raise on the next interaction with the
    manager (submit or wait), not vanish when the future is trimmed."""
    mgr = CheckpointManager(tmp_path, async_io=True)

    def boom():
        raise RuntimeError("disk full")

    mgr._submit(boom)
    mgr._pending[-1].exception(timeout=10)  # let the writer finish
    with pytest.raises(RuntimeError, match="disk full"):
        mgr._submit(lambda: None)
        mgr.wait()


def test_wait_joins_all_futures_before_raising(tmp_path):
    """wait() must join EVERY queued write even when an early one failed —
    otherwise still-running writes race subsequent file reads and later
    errors are silently dropped."""
    import threading

    mgr = CheckpointManager(tmp_path, async_io=True)
    finished = threading.Event()

    def boom():
        raise RuntimeError("disk full")

    def slow_ok():
        import time

        time.sleep(0.2)
        finished.set()

    mgr._pending.append(mgr._executor.submit(boom))
    mgr._pending.append(mgr._executor.submit(slow_ok))
    with pytest.raises(RuntimeError, match="disk full"):
        mgr.wait()
    assert finished.is_set()  # the later write was joined, not abandoned
    assert mgr._pending == []


def test_rolling_writes_are_atomic_and_self_contained(tmp_path):
    """last.ckpt lands via tmp+rename and carries the loop meta inside it,
    so a preemption can never pair params with mismatched meta; a stale
    sidecar from an older writer must lose to the embedded copy."""
    x, lengths = _data()
    model, variables = _make("fused", 7, x, lengths)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=optax.adam(1e-3)
    )
    mgr = CheckpointManager(tmp_path)
    mgr.save_rolling(state, epoch=5, meta={"marker": "a"})
    assert not list(tmp_path.glob("*.tmp"))  # tmp renamed away
    # stale sidecar (as if a kill landed between the two writes of an old
    # two-file writer) — the embedded meta must win
    (tmp_path / "resume.json").write_text('{"epoch": 4, "marker": "stale"}')
    assert mgr.load_resume_meta() == {"epoch": 5, "marker": "a"}


def test_load_checkpoint_restores_step_counter(tmp_path):
    x, lengths = _data()
    model, variables = _make("fused", 7, x, lengths)
    tx = optax.adam(1e-3)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )
    state = state.replace(step=jnp.asarray(42, dtype=jnp.asarray(state.step).dtype))
    mgr = CheckpointManager(tmp_path)
    mgr.save_rolling(state, epoch=1)
    fresh = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )
    restored = mgr.load_checkpoint(fresh, "last")
    assert int(np.asarray(restored.step)) == 42


def test_host_cache_dir_is_host_keyed(tmp_path):
    """Cache dir embeds a CPU fingerprint so another machine's XLA:CPU AOT
    entries are never loaded (feature mismatch risks SIGILL)."""
    from mmtpu.utils.compile_cache import host_cache_dir

    d = host_cache_dir(str(tmp_path))
    assert d.startswith(str(tmp_path / ".cache" / "jax"))
    key = d.rsplit("/", 1)[-1]
    assert len(key) == 12 and all(c in "0123456789abcdef" for c in key)
    assert host_cache_dir(str(tmp_path)) == d  # stable on the same host


def test_cpu_fingerprint_covers_model_and_mitigations():
    """Identical CPUID `flags` across two VMs still produced different XLA
    AOT target features (+prefer-no-scatter/gather are tuning choices
    derived from the model and active mitigations), so the fingerprint must
    key on model name / stepping / microcode / bugs too — only then does a
    reboot onto a different host get a fresh cache dir."""
    from mmtpu.utils.compile_cache import _fingerprint_from_cpuinfo

    base = (
        "processor\t: 0\n"
        "model name\t: Intel Xeon\n"
        "stepping\t: 6\n"
        "microcode\t: 0xabc\n"
        "flags\t\t: fpu avx512f\n"
        "bugs\t\t: spectre_v1 gds\n"
    )
    fp = _fingerprint_from_cpuinfo(base)
    for needle in ("model name", "stepping", "microcode", "flags", "bugs"):
        assert needle in fp
    # a mitigation change alone must change the fingerprint
    assert fp != _fingerprint_from_cpuinfo(base.replace(" gds", ""))
    # only the FIRST processor block is read (stable on heterogeneous SMT
    # listings, and cheap)
    two = base + "\n" + "processor\t: 1\nbugs\t\t: other\n"
    assert _fingerprint_from_cpuinfo(two) == fp


def test_cpu_backend_never_reads_an_unkeyed_cache_dir(tmp_path, monkeypatch):
    """An env/caller-provided UNKEYED cache dir must be redirected to its
    host-keyed subdir for CPU backends — jax honors the env var at import
    on this build, so without the redirect a CPU process would load AOT
    entries other hosts wrote into the shared root (SIGILL hazard)."""
    import jax

    from mmtpu.utils import compile_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        raw = str(tmp_path / "cache")
        # unkeyed dir pre-set (as jax does from the env at import)
        jax.config.update("jax_compilation_cache_dir", raw)
        compile_cache.enable_env_dir(raw)
        got = jax.config.jax_compilation_cache_dir
        assert got == os.path.join(raw, compile_cache._host_key())
        assert compile_cache.is_host_keyed(got)
        # already-keyed dirs pass through untouched (idempotent)
        compile_cache.enable_env_dir(got)
        assert jax.config.jax_compilation_cache_dir == got
        # enable_for_backend applies the same redirect
        jax.config.update("jax_compilation_cache_dir", raw)
        compile_cache.enable_for_backend(str(tmp_path))
        assert jax.config.jax_compilation_cache_dir == os.path.join(
            raw, compile_cache._host_key()
        )
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_load_checkpoint_accepts_explicit_path(tmp_path):
    """The predict/serve CLIs advertise '--checkpoint <path>' — an absolute
    .ckpt path (or a reference-era .pth name with a .ckpt sibling) loads
    directly instead of being treated as a name under model_dir (which
    appended a second '.ckpt' and always failed)."""
    x, lengths = _data()
    model, variables = _make("fused", 7, x, lengths)
    tx = optax.adam(1e-3)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )
    mgr = CheckpointManager(tmp_path / "runA")
    mgr.save_checkpoint(state, epoch=3, metric_value=0.5)
    mgr.wait()

    other = CheckpointManager(tmp_path / "runB")  # unrelated model_dir
    fresh = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )
    restored = other.load_checkpoint(
        fresh, str(tmp_path / "runA" / "best.ckpt")
    )
    a = jax.tree_util.tree_leaves(restored.params)[0]
    b = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # .pth spelling resolves to the .ckpt sibling (reference configs chain)
    restored2 = other.load_checkpoint(
        fresh, str(tmp_path / "runA" / "best.pth")
    )
    assert restored2 is not None


def test_federated_param_codec_roundtrip():
    """base64 param transport codec (reference federated/federated_utils.py
    :7-41 — the sole survivor of the federated subsystem): encode → decode
    restores every leaf exactly."""
    import jax.numpy as jnp

    from mmtpu.federated import deserialize_params, serialize_params

    params = {
        "dense": {"kernel": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                  "bias": jnp.zeros(3)},
        "scale": jnp.float32(2.5),
    }
    encoded = serialize_params(params)
    assert isinstance(encoded, str)
    restored = deserialize_params(encoded, params)
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
