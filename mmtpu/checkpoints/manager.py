"""Checkpoint save/restore (reference: experiment_utils/checkpoints.py:13-135).

Artifacts mirror the reference layout: `epoch_{N}.ckpt` on every improvement,
mirrored to `best.ckpt`; monomodal pretraining additionally emits the bare
`encoder_{modality}_best.ckpt` handoff artifact that multimodal finetuning's
`pretrained_encoders` consumes (train_monomodal.py:790-802).

Format: Flax msgpack bytes of the state pytree (params + batch_stats +
host metadata). `load_encoder_checkpoint` also accepts reference PyTorch
`.pth` files via the torch interop reader, so shipped `wheights/` load
directly.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from mmtpu.utils.logging import get_logger

logger = get_logger()


def _to_host(tree: Any) -> Any:
    # str/bytes leaves (e.g. the embedded resume_meta payload) msgpack
    # natively; np.asarray would turn them into unserializable U/S arrays
    return jax.tree_util.tree_map(
        lambda x: x if isinstance(x, (str, bytes)) else np.asarray(x), tree
    )


def _write_bytes_atomic(path: Path, data: bytes) -> None:
    """Write-to-tmp + rename so a kill mid-write never leaves a truncated
    file — the resume artifacts exist precisely for preempted runs."""
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_bytes(data)
    os.replace(tmp, path)


def _write_text_atomic(path: Path, text: str) -> None:
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_text(text)
    os.replace(tmp, path)


def save_pytree(path: Path, tree: Dict[str, Any]) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    _write_bytes_atomic(path, serialization.to_bytes(_to_host(tree)))


def load_pytree(path: Path, target: Optional[Any] = None) -> Any:
    data = Path(path).read_bytes()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


class CheckpointManager:
    def __init__(
        self,
        model_dir: str | Path,
        save_metric: str = "loss",
        mode: str = "min",
        device: Optional[str] = None,
        async_io: bool = False,
    ) -> None:
        self.model_dir = Path(model_dir)
        self.model_dir.mkdir(parents=True, exist_ok=True)
        self.save_metric = save_metric
        self.mode = mode
        self.best_value: Optional[float] = None
        self.best_epoch: Optional[int] = None
        # async_io: device→host snapshot happens synchronously (donated
        # buffers are reused by the next step, so the copy cannot wait),
        # but msgpack serialization + disk writes move to a single writer
        # thread off the training path — the orbax-style async pattern.
        self._executor = None
        self._pending = []
        if async_io:
            from concurrent.futures import ThreadPoolExecutor

            self._executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-io"
            )

    def _snapshot(self, tree: Any) -> Any:
        """Host snapshot of a state tree. With async_io, force REAL copies:
        np.asarray of a CPU-backend jax array can alias the device buffer,
        which the next (donating) train step reuses while the writer thread
        is still serializing."""
        if self._executor is None:
            return _to_host(tree)
        return jax.tree_util.tree_map(lambda x: np.array(x), tree)

    def _submit(self, fn) -> None:
        if self._executor is None:
            fn()
            return
        done = [f for f in self._pending if f.done()]
        self._pending = [f for f in self._pending if not f.done()]
        for f in done:
            f.result()  # surface writer-thread errors instead of dropping them
        self._pending.append(self._executor.submit(fn))

    def wait(self) -> None:
        """Block until queued checkpoint writes hit disk (and re-raise any
        writer-thread error). Every future is joined even when an early one
        failed — otherwise still-running writes could race a subsequent
        read of the same files, and later errors would be lost."""
        pending, self._pending = self._pending, []
        errors = []
        for f in pending:
            try:
                f.result()
            except Exception as e:  # join ALL before raising
                errors.append(e)
        if errors:
            raise errors[0]

    def is_better(self, value: float) -> bool:
        if self.best_value is None:
            return True
        return value < self.best_value if self.mode == "min" else value > self.best_value

    def save_checkpoint(
        self,
        state,
        epoch: int,
        metric_value: Optional[float] = None,
        extra: Optional[Dict[str, Any]] = None,
    ) -> Path:
        """Write epoch_{N}.ckpt and mirror to best.ckpt.

        Gating contract (same as the reference driver): the CALLER decides
        improvement — the loops call this only on a new best
        (EarlyStopping.step), and every call mirrors to best.ckpt exactly
        like the reference's save_checkpoint (checkpoints.py:39-79). The
        is_better/best_value fields track the metric for standalone users
        and the best.json record; they do not gate the write."""
        tree = self._snapshot({
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        })
        tree["step"] = int(state.step)
        path = self.model_dir / f"epoch_{epoch}.ckpt"
        meta = {
            "epoch": epoch,
            "metric": self.save_metric,
            "value": metric_value,
            **(extra or {}),
        }

        def write():
            save_pytree(path, tree)
            _write_text_atomic(
                self.model_dir / f"epoch_{epoch}.json", json.dumps(meta)
            )
            _write_bytes_atomic(self.model_dir / "best.ckpt", path.read_bytes())
            _write_text_atomic(self.model_dir / "best.json", json.dumps(meta))

        self._submit(write)
        if metric_value is not None and self.is_better(metric_value):
            # only record genuinely-better values so the informational
            # best_value/best_epoch can't regress if a caller saves a
            # non-improving checkpoint
            self.best_value = metric_value
            self.best_epoch = epoch
        logger.info(f"checkpoint saved: {path}")
        return path

    def save_encoder(
        self, params: Any, modality: str, batch_stats: Optional[Any] = None
    ) -> Path:
        """The monomodal→multimodal handoff artifact (params + BN stats,
        like the reference's full encoder state_dict)."""
        path = self.model_dir / f"encoder_{modality}_best.ckpt"
        tree = {"params": self._snapshot(params)}
        if batch_stats is not None:
            tree["batch_stats"] = self._snapshot(batch_stats)
        self._submit(lambda: save_pytree(path, tree))
        return path

    def save_rolling(self, state, epoch: int,
                     meta: Optional[Dict[str, Any]] = None) -> Path:
        """Overwrite `last.ckpt` + `resume.json` every epoch — the mid-run
        resume point (beyond the reference, which has no loop resume:
        train_multimodal.py restores only for test/transfer). On preemptible
        TPU capacity this is what lets --resume continue a killed run."""
        tree = self._snapshot({
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        })
        tree["step"] = int(state.step)
        path = self.model_dir / "last.ckpt"
        payload = json.dumps({"epoch": epoch, **(meta or {})})
        # The meta rides INSIDE last.ckpt (single atomic rename), so a kill
        # can never pair epoch-N params with epoch-(N-1) loop state — which
        # would silently replay an epoch on already-trained params.
        # resume.json is a human-readable mirror, not the source of truth.
        tree["resume_meta"] = payload

        def write():
            save_pytree(path, tree)
            _write_text_atomic(self.model_dir / "resume.json", payload)

        self._submit(write)
        return path

    def load_resume_meta(self) -> Optional[Dict[str, Any]]:
        self.wait()
        rolling = self.model_dir / "last.ckpt"
        if not rolling.exists():
            return None
        raw = load_pytree(rolling)
        if isinstance(raw, dict) and "resume_meta" in raw:
            blob = raw["resume_meta"]
            if isinstance(blob, bytes):
                blob = blob.decode()
            return json.loads(blob)
        # pre-embedded-meta checkpoints: fall back to the sidecar
        meta = self.model_dir / "resume.json"
        if not meta.exists():
            return None
        return json.loads(meta.read_text())

    def load_checkpoint(self, state, which: str = "best"):
        """Restore best / epoch_{N} / last into a TrainState."""
        self.wait()
        if which == "last":
            rolling = self.model_dir / "last.ckpt"
            candidates = sorted(
                self.model_dir.glob("epoch_*.ckpt"),
                key=lambda p: int(p.stem.split("_")[1]),
            )
            if rolling.exists():
                path = rolling
            elif candidates:
                path = candidates[-1]
            else:
                raise FileNotFoundError(f"No checkpoints in {self.model_dir}")
        elif which == "best":
            path = self.model_dir / "best.ckpt"
        elif "/" in str(which) or str(which).endswith((".ckpt", ".pth")):
            # explicit checkpoint path (predict/serve CLIs advertise it);
            # .pth names resolve to their .ckpt sibling like every other
            # pretrained_path consumer
            path = resolve_checkpoint_path(which)
            if not path.is_absolute():
                path = Path.cwd() / path
        else:
            path = self.model_dir / f"{which}.ckpt"
        target = {
            "params": _to_host(state.params),
            "batch_stats": _to_host(state.batch_stats),
            "opt_state": _to_host(state.opt_state),
            "step": 0,
        }
        raw = load_pytree(path)
        if isinstance(raw, dict):
            raw.pop("resume_meta", None)  # loop meta rides in last.ckpt
        tree = serialization.from_state_dict(
            target, adapt_lstm_layout(raw, serialization.to_state_dict(target))
        )
        import jax.numpy as jnp

        # restore the step counter too — otherwise a resumed run's later
        # checkpoints record step counts restarting from 0 and diverge from
        # an uninterrupted run's artifacts
        step = jnp.asarray(tree.get("step", 0), dtype=jnp.asarray(state.step).dtype)
        return state.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            step=step,
        )


_GATES = ("i", "f", "g", "o")  # flax OptimizedLSTMCell gate order; the
# fused layout (models/lstm.py backend='fused', ops/lstm.py) uses the same.


def _is_cell(node: Any) -> bool:
    return isinstance(node, dict) and all(
        f"i{g}" in node and f"h{g}" in node for g in _GATES
    )


def _find_cell_path(node: Any, path=()):
    """Path of the first per-gate OptimizedLSTMCell param dict under node."""
    if _is_cell(node):
        return path
    if isinstance(node, dict):
        for k, v in node.items():
            r = _find_cell_path(v, path + (k,))
            if r is not None:
                return r
    return None


def _fuse_cell(cell: Dict[str, Any]):
    """Per-gate {i*,h*} Dense params → fused (wi Dense, wh matrix).

    The per-gate cell computes gate = act(i{g}(x) + h{g}(h)) with the bias
    on the h-side Dense; the fused path computes the identical
    act((x@Wi + b) + h@Wh) with gate blocks concatenated along the 4H axis."""
    wi_k = np.concatenate(
        [np.asarray(cell[f"i{g}"]["kernel"]) for g in _GATES], axis=-1
    )
    wi_b = np.concatenate(
        [np.asarray(cell[f"h{g}"]["bias"]) for g in _GATES], axis=-1
    )
    wh = np.concatenate(
        [np.asarray(cell[f"h{g}"]["kernel"]) for g in _GATES], axis=-1
    )
    return {"kernel": wi_k, "bias": wi_b}, wh


def _unfuse_cell(wi: Dict[str, Any], wh: Any) -> Dict[str, Any]:
    wh = np.asarray(wh)
    H = wh.shape[-1] // 4
    cell: Dict[str, Any] = {}
    for n, g in enumerate(_GATES):
        sl = slice(n * H, (n + 1) * H)
        cell[f"i{g}"] = {"kernel": np.asarray(wi["kernel"])[..., sl]}
        cell[f"h{g}"] = {
            "kernel": wh[..., sl],
            "bias": np.asarray(wi["bias"])[..., sl],
        }
    return cell


def adapt_lstm_layout(state: Any, target: Any) -> Any:
    """Bridge LSTMEncoder's two parameter layouts at restore time.

    Checkpoints written before the fused wi/wh layout became the default
    (models/lstm.py backend='rnn': per-gate OptimizedLSTMCell params,
    possibly nested under an RNN scope) load into fused-layout models and
    vice versa — the conversion is exact, not approximate: both layouts
    parameterize the same math, gate order [i, f, g, o]. Optimizer-moment
    trees (Adam mu/nu) mirror the param structure, so the same block
    concatenation carries them over."""
    if not (isinstance(state, dict) and isinstance(target, dict)):
        return state
    out = dict(state)
    if "wi" in target and "wh" in target and not (
        "wi" in out and "wh" in out
    ):
        cp = _find_cell_path(out)
        if cp:
            cell = out
            for k in cp:
                cell = cell[k]
            out.pop(cp[0])  # the chain (e.g. rnn/cell/...) holds only the cell
            out["wi"], out["wh"] = _fuse_cell(cell)
    if "wi" in out and "wh" in out and not ("wi" in target and "wh" in target):
        tp = _find_cell_path(target)
        if tp:
            node: Dict[str, Any] = _unfuse_cell(out.pop("wi"), out.pop("wh"))
            for k in reversed(tp):
                node = {k: node}
            out.update(node)
    return {
        k: (
            adapt_lstm_layout(v, target[k])
            if isinstance(v, dict) and isinstance(target.get(k), dict)
            else v
        )
        for k, v in out.items()
    }


def resolve_checkpoint_path(path) -> Path:
    """Exact path if it exists, else its `.ckpt` sibling.

    Reference configs name torch-era artifacts (`best.pth`); mmtpu's
    CheckpointManager writes `best.ckpt` — every pretrained_path consumer
    resolves through here so unchanged reference configs chain."""
    p = Path(path)
    if not p.exists() and p.with_suffix(".ckpt").exists():
        return p.with_suffix(".ckpt")
    return p


def load_model_variables(
    path: str | Path, target_params: Any, target_batch_stats: Optional[Any] = None
):
    """Full-model {params, batch_stats} from mmtpu .ckpt or torch .pth.

    Same resolution contract as load_encoder_checkpoint (exact path →
    .ckpt sibling → torch-interop reader, LSTM layouts adapted), for
    whole-model pretrained_path consumers — train_cmam's frozen base
    restore previously fed raw pickle bytes to msgpack and could not load
    reference torch checkpoints or cross-layout LSTM bases.
    Returns (params, batch_stats_or_None)."""
    path = Path(path)
    candidates = [path]
    if path.suffix != ".ckpt":
        candidates.append(path.with_suffix(".ckpt"))
    host_params = _to_host(target_params)
    for cand in candidates:
        if not cand.exists():
            continue
        try:
            raw = load_pytree(cand)  # msgpack regardless of suffix (tiny
            # test fixtures write msgpack under reference .pth names)
        except Exception:
            raw = None
        if isinstance(raw, dict) and "params" in raw:
            params = serialization.from_state_dict(
                host_params,
                adapt_lstm_layout(
                    raw["params"], serialization.to_state_dict(host_params)
                ),
            )
            stats = None
            if target_batch_stats is not None and raw.get("batch_stats"):
                stats = serialization.from_state_dict(
                    _to_host(target_batch_stats), raw["batch_stats"]
                )
            return params, stats
        if raw is None:  # real torch pickle
            from mmtpu.checkpoints.torch_interop import load_torch_checkpoint

            if target_batch_stats is not None:
                return load_torch_checkpoint(
                    cand, target_params, target_batch_stats
                )
            return load_torch_checkpoint(cand, target_params), None
    raise FileNotFoundError(f"Model checkpoint not found: {path}")


def load_encoder_checkpoint(
    path: str | Path, target_params: Any, target_batch_stats: Optional[Any] = None
):
    """Load an encoder pytree from mmtpu .ckpt or reference .pth.

    Tries, in order: the exact path; the path with .ckpt suffix (so configs
    pointing at reference-era `.pth` names find mmtpu artifacts); a real
    torch checkpoint via the interop reader.
    Returns (params, batch_stats_or_None).
    """
    path = Path(path)
    candidates = [path]
    if path.suffix != ".ckpt":
        candidates.append(path.with_suffix(".ckpt"))
    for cand in candidates:
        if cand.exists() and cand.suffix == ".ckpt":
            raw = load_pytree(cand)  # plain msgpack dict
            host_params = _to_host(target_params)
            params = serialization.from_state_dict(
                host_params,
                adapt_lstm_layout(
                    raw["params"], serialization.to_state_dict(host_params)
                ),
            )
            stats = None
            if target_batch_stats is not None and "batch_stats" in raw:
                stats = serialization.from_state_dict(
                    _to_host(target_batch_stats), raw["batch_stats"]
                )
            return params, stats
    if path.exists():  # torch format
        from mmtpu.checkpoints.torch_interop import load_torch_checkpoint

        if target_batch_stats is not None:
            return load_torch_checkpoint(path, target_params, target_batch_stats)
        return load_torch_checkpoint(path, target_params), None
    raise FileNotFoundError(f"Encoder checkpoint not found: {path}")
