"""Generic epoch driver (reference: train_multimodal.py:438-860).

Train/validate epochs over jitted steps, per-pattern metric recording,
incremental `epoch_metrics.json` (same list-of-epochs schema with
f1_*/MSA_* keys nested under their pattern, :640-729), early stopping,
best-checkpointing, host-side LR scheduling, and test-time best restore.

Throughput notes: batches are prefetched to device one step ahead; the loss
scalar and prediction arrays returned by the step stay on device and are
bulk-transferred once per epoch (reference syncs twice per step).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

from mmtpu.checkpoints.manager import CheckpointManager
from mmtpu.train.early_stopping import EarlyStopping
from mmtpu.train.optim import LRController, set_lr_scale
from mmtpu.train.recorder import MetricRecorder
from mmtpu.train.step import make_eval_step, make_train_step
from mmtpu.utils.logging import get_logger
from mmtpu.utils.printing import get_console
from mmtpu.utils.utils import flatten_leaves

logger = get_logger()
console = get_console()


def _nest_epoch_metrics(flat: Dict[str, Any], style: str = "reference") -> Dict[str, Any]:
    """Reference JSON nesting (train_multimodal.py:640-729): f1_*/MSA_* keys
    under their pattern; style='avmnist' nests EVERY pattern-suffixed metric
    under its pattern key (train_avmnist.py:595-860 variant).

    Faithful quirk: the reference takes parts[3] as the MSA pattern
    (train_multimodal.py:668-671), which is correct only for 4-part keys
    like MSA_Non0_Accuracy_ATV — a 5-part key such as
    MSA_Non0_F1_weighted_ATV nests under 'weighted' there too. Reproduced
    exactly so output JSONs diff clean against reference-produced files."""
    out: Dict[str, Any] = {}
    for key, value in flat.items():
        if key == "loss" or not isinstance(value, (int, float)):
            continue
        parts = key.split("_")
        if key.startswith("MSA_") and len(parts) >= 4:
            metric, pattern = "_".join(parts[:3]), parts[3]
            out.setdefault(pattern, {})[metric] = value
        elif key.startswith("f1_") and len(parts) >= 3:
            metric, pattern = "_".join(parts[:2]), parts[2]
            out.setdefault(pattern, {})[metric] = value
        elif style == "avmnist" and parts[-1].isupper() and 1 <= len(parts[-1]) <= 4:
            metric, pattern = "_".join(parts[:-1]), parts[-1]
            out.setdefault(pattern, {})[metric] = value
        else:
            out.setdefault("metrics", {})[key] = value
    return out


def split_epoch_entry(loss: float, metrics: Dict[str, Any], elapsed: float,
                      n_batches: int, json_nesting: str) -> Dict[str, Any]:
    """One split's body inside an epoch_metrics.json entry — loss + timing +
    nested metrics (reference schema, train_multimodal.py:595-729). Single
    source of truth for the sequential loop AND the stacked-CV engine so the
    two cannot drift."""
    return {
        "loss": loss,
        "timing": {
            "total_time": elapsed,
            "avg_batch_time": elapsed / max(int(n_batches), 1),
        },
        **_nest_epoch_metrics(metrics, json_nesting),
    }


def _auto_eval_factor(
    batch_size: int, eval_total: int, target_rows: int = 1024
) -> int:
    """Fused-eval batch factor: grow per-dispatch rows toward ~target_rows
    (the measured high-MFU regime on the bench sweep) without exceeding
    the epoch. Capped at 8× so activation memory stays bounded."""
    if batch_size <= 0:
        return 1
    factor = max(1, min(8, target_rows // batch_size))
    steps = -(-eval_total // batch_size)
    return max(1, min(factor, steps))


class TrainLoop:
    def __init__(
        self,
        *,
        task,
        state,
        loaders: Dict[str, Any],
        recorder: MetricRecorder,
        checkpoint_manager: CheckpointManager,
        epochs: int,
        save_metric: str = "loss",
        early_stopping: Optional[EarlyStopping] = None,
        lr_controller: Optional[LRController] = None,
        metrics_path: Optional[Path] = None,
        group_name: str = "classification",
        mesh=None,
        on_best: Optional[Callable[[Any, int], None]] = None,
        print_interval: int = 1,
        record_fn: Optional[Callable] = None,
        step_builders: Optional[Any] = None,
        monitor=None,
        json_nesting: str = "reference",
        device_resident: str = "auto",
        run_id: Optional[int] = None,
        vocab_override: Optional[List[str]] = None,
        metrics_postprocess: Optional[Callable[[Dict[str, Any]], Dict[str, Any]]] = None,
        eval_batch_factor: Optional[int] = None,
        resume: bool = False,
        resume_save: bool = True,
    ) -> None:
        # vocab_override renames the recorder's pattern vocabulary (e.g. the
        # monomodal driver records under the MODALITY name, reference
        # train_monomodal.py:242-247); metrics_postprocess runs over each
        # epoch's flattened metric dict before recording/JSON.
        self.vocab_override = vocab_override
        self.metrics_postprocess = metrics_postprocess
        self.resume = resume
        self.resume_save = resume_save
        self.json_nesting = json_nesting
        self.run_id = run_id
        self.task = task
        self.state = state
        self.loaders = loaders
        self.recorder = recorder
        self.ckpt = checkpoint_manager
        self.epochs = epochs
        self.save_metric = save_metric
        self.early = early_stopping or EarlyStopping(enabled=False)
        self.lr = lr_controller
        self.metrics_path = Path(metrics_path) if metrics_path else None
        self.group_name = group_name
        self.mesh = mesh
        self.on_best = on_best
        self.print_interval = print_interval

        self.monitor = monitor
        if step_builders is not None:
            make_train, make_eval = step_builders
            self.train_step = make_train(task)
            self.eval_step = make_eval(task)
            self.train_step_monitored = None
        else:
            self.train_step = make_train_step(task, mesh=mesh)
            self.eval_step = make_eval_step(task, mesh=mesh)
            self.train_step_monitored = (
                make_train_step(task, mesh=mesh, with_grad_stats=True)
                if monitor is not None
                else None
            )
        self._record = record_fn or self._default_record

        # -- device-resident mode: whole split in HBM + one scan per epoch
        # (see mmtpu/train/device_loop.py). Streaming fallback when the data
        # exceeds the budget, a custom task is used, or monitoring needs
        # per-step capture.
        self._scan: Dict[str, Any] = {}
        if (
            device_resident in ("auto", "on")
            and step_builders is None
            and record_fn is None
            and monitor is None
        ):
            from mmtpu.train import device_loop as dl

            if mesh is not None:
                # scan-on-mesh (round 3): resident arrays replicated, the
                # schedule's batch dim sharded over 'data' — one dispatch
                # per epoch AND data parallelism. State must be replicated
                # so donation/re-use keeps a consistent layout.
                self.state = dl.replicate_tree(self.state, mesh)
            from mmtpu.parallel.mesh import DATA_AXIS

            dp = mesh.shape[DATA_AXIS] if mesh is not None else 1
            # 'auto' budgets the CUMULATIVE resident bytes (all admitted
            # splits live in HBM simultaneously for the whole run) — per-
            # split checks would happily upload 3 near-budget splits and
            # OOM. Train is admitted first (it runs every epoch), then
            # validation, then the rest; overflow splits stream.
            remaining = dl.DEFAULT_BUDGET_BYTES
            priority = {"train": 0, "validation": 1}
            ordered = sorted(
                loaders.items(), key=lambda kv: priority.get(kv[0], 2)
            )
            for split, loader in ordered:
                ds = getattr(loader, "dataset", None)
                if ds is None or not getattr(ds, "arrays", None):
                    continue
                if device_resident == "auto":
                    nbytes = dl.dataset_nbytes(ds)
                    if nbytes > remaining:
                        continue
                    remaining -= nbytes
                if mesh is not None and loader.batch_size % dp:
                    continue  # batch not shardable over the data axis
                data = dl.DeviceResidentData.upload(ds, mesh=mesh)
                # eval visits the (patterns x samples) product; fusing it
                # into larger batches multiplies the work per dispatch and
                # is bit-identical at any factor (losses reduced per
                # ORIGINAL batch inside the fused dispatch — device_loop.
                # make_scan_eval_epoch). Factor None = auto: grow fused
                # batches toward the measured high-MFU regime (~1024 rows).
                if split == "train":
                    factor = 1
                elif eval_batch_factor is None:
                    total = ds.num_samples * len(ds.pattern_vocab())
                    factor = _auto_eval_factor(loader.batch_size, total)
                else:
                    factor = max(1, int(eval_batch_factor))
                bs = loader.batch_size * factor
                fn = (
                    dl.make_scan_train_epoch(task, data, mesh=mesh)
                    if split == "train"
                    else dl.make_scan_eval_epoch(
                        task, data, mesh=mesh, sub_batches=factor
                    )
                )
                self._scan[split] = (fn, ds, bs,
                                     getattr(loader, "shuffle", False),
                                     getattr(loader, "seed", 0),
                                     getattr(loader, "drop_last", False),
                                     loader.batch_size)

        self.epoch_metrics: List[Dict[str, Any]] = []
        self.timing_history: Dict[str, List[float]] = {"train": [], "validation": []}
        self.metrics_history: Dict[str, List[Dict[str, Any]]] = {
            "train": [],
            "validation": [],
        }
        # Nested (per-group dict) history + per-term loss means: the CMAM
        # driver's report records carry group DICTS plus cosine/mae/mse
        # columns (reference train_cmam.py:532-560 metrics_history +
        # val_loss_info means) — steps expose them via out["terms"].
        self.metrics_history_nested: Dict[str, List[Dict[str, Any]]] = {
            "train": [],
            "validation": [],
        }
        self.test_metrics_nested: Dict[str, Dict[str, Any]] = {}
        self._phase_terms: List[Any] = []
        self._rng = jax.random.PRNGKey(0)

    # -- epochs ---------------------------------------------------------------

    def _device_batches(self, loader):
        from mmtpu.data.loader import DevicePrefetcher

        return DevicePrefetcher(loader, mesh=self.mesh)

    def _scan_epoch(self, split: str, epoch: int) -> float:
        """Device-resident path: one dispatch per epoch."""
        from mmtpu.train import device_loop as dl

        fn, ds, batch_size, shuffle, seed, drop_last, base_bs = self._scan[split]
        vocab = self._vocab(ds.pattern_vocab())
        t0 = time.time()
        # streaming BatchLoader counts epochs from 0 — keep the seeded
        # shuffle/pattern draws identical between the two paths
        schedule = dl.put_schedule(
            dl.build_schedule(
                ds, batch_size, max(epoch - 1, 0), shuffle, seed, ds.split,
                drop_last=drop_last, base_batch_size=base_bs,
            ),
            self.mesh,
        )
        if split == "train":
            self._rng, epoch_rng = jax.random.split(self._rng)
            self.state, outs = fn(self.state, schedule, epoch_rng)
        else:
            outs = fn(self.state, schedule)
        outs = jax.device_get(outs)
        if split in self.timing_history:
            self.timing_history[split].append(time.time() - t0)
        flat = {
            k: np.reshape(v, (-1,) + v.shape[2:]) if v is not None else None
            for k, v in outs.items()
            if k != "loss"
        }
        self.recorder.update_group_ids(
            self.group_name,
            flat["preds"], flat["labels"], flat["pattern_id"], vocab,
            flat.get("sample_mask"),
        )
        # mean of per-batch means over batches with any real sample. The
        # fused eval path emits (steps, factor) per-ORIGINAL-batch losses;
        # train and unfused eval emit (steps,) — flatten handles both.
        loss = np.reshape(outs["loss"], (-1,))
        mask = np.reshape(outs["sample_mask"], (loss.shape[0], -1))
        w = mask.max(axis=1) > 0
        return float(np.sum(np.where(w, loss, 0.0)) / max(np.sum(w), 1))

    def train_epoch(self, epoch: int) -> float:
        if "train" in self._scan:
            return self._scan_epoch("train", epoch)
        loader = self.loaders["train"]
        vocab = loader.pattern_vocab
        losses = []
        t0 = time.time()
        mon = self.monitor
        if mon is not None:
            mon.start_epoch(epoch)
        for batch in self._device_batches(loader):
            self._rng, step_rng = jax.random.split(self._rng)
            if (
                mon is not None
                and self.train_step_monitored is not None
                and mon.want_gradients
            ):
                self.state, out = self.train_step_monitored(
                    self.state, batch, step_rng
                )
                mon.record_gradients(out.pop("grad_stats"))
            else:
                self.state, out = self.train_step(self.state, batch, step_rng)
            if mon is not None and mon.want_activations:
                # capture the SAME forward training sees: missing-modality
                # masks applied (step.py ClassificationTask.apply)
                from mmtpu.train.step import apply_missing_mask

                inputs = [
                    apply_missing_mask(batch[k], batch.get(f"{k}_mask"))
                    for k in getattr(self.task, "input_keys", [])
                ]
                if inputs:
                    mon.record_activations(
                        self.task.model, self.state.variables, inputs
                    )
            if mon is not None:
                # reference cadence: the counter advances AFTER the batch,
                # so step 0 (the init-diagnostics snapshot) is captured
                mon.step()
            losses.append(out["loss"])
            if "terms" in out:
                self._phase_terms.append(out["terms"])
            self._record(self.recorder, out, vocab)
        if mon is not None:
            mon.end_epoch(self.state)
        jax.block_until_ready(self.state.params)
        self.timing_history["train"].append(time.time() - t0)
        # zero-batch epoch (split smaller than batch_size with drop_last):
        # mirror eval_epoch's guard instead of np.mean([]) -> NaN landing
        # silently in epoch_metrics.json
        return float(np.mean(jax.device_get(losses))) if losses else 0.0

    def eval_epoch(self, split: str) -> float:
        if split in self._scan:
            return self._scan_epoch(split, 0)
        loader = self.loaders[split]
        vocab = loader.pattern_vocab
        losses = []
        t0 = time.time()
        for batch in self._device_batches(loader):
            out = self.eval_step(self.state, batch)
            losses.append(out["loss"])
            if "terms" in out:
                self._phase_terms.append(out["terms"])
            self._record(self.recorder, out, vocab)
        if losses:
            jax.block_until_ready(losses[-1])
        if split in self.timing_history:
            self.timing_history[split].append(time.time() - t0)
        return float(np.mean(jax.device_get(losses))) if losses else 0.0

    def _vocab(self, vocab: List[str]) -> List[str]:
        if self.vocab_override is not None and len(self.vocab_override) == len(vocab):
            return self.vocab_override
        return vocab

    def _default_record(self, recorder, out, vocab) -> None:
        recorder.update_group_ids(
            self.group_name,
            out["preds"],
            out["labels"],
            out.get("pattern_id", np.zeros(np.asarray(out["preds"]).shape[0], np.int32)),
            self._vocab(vocab),
            out.get("sample_mask"),
        )

    # -- driver -----------------------------------------------------------------

    def _drain_terms(self) -> Dict[str, float]:
        """Per-epoch means of the step's auxiliary loss terms (total_loss
        excluded — reference val_loss_info semantics, train_cmam.py:556)."""
        terms, self._phase_terms = self._phase_terms, []
        if not terms:
            return {}
        host = jax.device_get(terms)
        return {
            k: float(np.mean([np.asarray(t[k]) for t in host]))
            for k in host[0]
            if k != "total_loss"
        }

    # -- mid-run resume (beyond the reference: no loop resume exists there;
    # SURVEY.md §5.4 "no mid-run resume of the training loop") ---------------

    def _save_resume_point(self, epoch: int,
                           best_metrics: Optional[Dict[str, Any]]) -> None:
        """Rolling last.ckpt + the loop's host-side state, every epoch."""
        self.ckpt.save_rolling(
            self.state, epoch,
            meta=_jsonable({
                "early": {"best": self.early.best,
                          "counter": self.early.counter,
                          "should_stop": self.early.should_stop},
                "lr": (
                    {"epoch": self.lr.epoch, "best": self.lr._best,
                     "num_bad": self.lr._num_bad,
                     "cooldown": self.lr._cooldown, "scale": self.lr._scale}
                    if self.lr is not None else None
                ),
                "rng": np.asarray(self._rng).tolist(),
                "best_metrics": best_metrics,
                "metrics_history": self.metrics_history,
                "metrics_history_nested": self.metrics_history_nested,
                "timing_history": self.timing_history,
            }),
        )

    def _try_resume(self):
        """Restore loop + train state from the rolling resume point.

        Returns (next_epoch, best_metrics) or None. The restored run is
        bit-identical to an uninterrupted one: the dropout/shuffle RNG
        stream continues from the saved key, the epoch-seeded schedules
        key off the absolute epoch index, and the optimizer state (incl.
        Adam moments and the host-side LR scale) restores exactly."""
        meta = self.ckpt.load_resume_meta()
        if meta is None:
            return None
        self.state = self.ckpt.load_checkpoint(self.state, "last")
        # streaming BatchLoaders shuffle/pattern-schedule off a stateful
        # per-loader epoch counter — fast-forward it to the completed-epoch
        # count so epoch N's batch order matches the uninterrupted run
        # (the device-resident scan path keys schedules off the absolute
        # epoch index and needs no fast-forward)
        for loader in self.loaders.values():
            if hasattr(loader, "epoch"):
                loader.epoch = int(meta["epoch"])
        if self.mesh is not None and self._scan:
            from mmtpu.train import device_loop as dl

            self.state = dl.replicate_tree(self.state, self.mesh)
        early = meta.get("early") or {}
        self.early.best = early.get("best")
        self.early.counter = int(early.get("counter", 0))
        self.early.should_stop = bool(early.get("should_stop", False))
        lr_meta = meta.get("lr")
        if self.lr is not None and lr_meta:
            self.lr.epoch = int(lr_meta.get("epoch", 0))
            self.lr._best = lr_meta.get("best")
            self.lr._num_bad = int(lr_meta.get("num_bad", 0))
            self.lr._cooldown = int(lr_meta.get("cooldown", 0))
            self.lr._scale = float(lr_meta.get("scale", 1.0))
            set_lr_scale(self.state.opt_state, self.lr._scale)
        if meta.get("rng") is not None:
            import jax.numpy as jnp

            self._rng = jnp.asarray(meta["rng"], jnp.uint32)
        self.metrics_history = meta.get("metrics_history", self.metrics_history)
        self.metrics_history_nested = meta.get(
            "metrics_history_nested", self.metrics_history_nested
        )
        self.timing_history = meta.get("timing_history", self.timing_history)
        if self.metrics_path is not None:
            fp = self.metrics_path / "epoch_metrics.json"
            if fp.exists():
                # drop entries newer than the resume point (a kill between
                # the epoch-metrics write and the resume-point write leaves
                # one ahead) and any trailing {"test": ...} record — the
                # resumed run re-appends both, so keeping them would
                # duplicate epochs in the output JSON
                entries = json.loads(fp.read_text())
                resume_epoch = int(meta["epoch"])
                self.epoch_metrics = [
                    e for e in entries
                    if isinstance(e, dict) and "epoch" in e
                    and int(e["epoch"]) <= resume_epoch
                ]
        epoch = int(meta["epoch"])
        logger.info(f"resuming from epoch {epoch} ({self.ckpt.model_dir})")
        console.print(f"resuming from epoch {epoch}")
        return epoch + 1, meta.get("best_metrics")

    def run(self) -> Dict[str, Any]:
        best_metrics: Optional[Dict[str, Any]] = None
        start_epoch = 1
        if self.resume:
            resumed = self._try_resume()
            if resumed is not None:
                start_epoch, best_metrics = resumed
                if self.early.should_stop:
                    return best_metrics or {}
        for epoch in range(start_epoch, self.epochs + 1):
            self.recorder.reset()
            train_loss = self.train_epoch(epoch)
            raw_train = self.recorder.calculate_all_groups(
                epoch=epoch, loss=train_loss
            )
            # flatten_leaves: metric keys carry no group prefix, exactly like
            # the reference output schema (see utils.flatten_leaves)
            train_metrics = flatten_leaves(raw_train)
            train_metrics["loss"] = train_loss
            if self.metrics_postprocess is not None:
                train_metrics = self.metrics_postprocess(train_metrics)
            self.metrics_history["train"].append(dict(train_metrics))
            # reference records no per-term means for train (train_cmam.py
            # adds val_loss_info to validation only); drain to reset
            self._drain_terms()
            self.metrics_history_nested["train"].append(
                {**raw_train, "loss": train_loss}
            )

            self.recorder.reset()
            val_loss = self.eval_epoch("validation")
            raw_val = self.recorder.calculate_all_groups(
                epoch=epoch, loss=val_loss, skip_tensorboard=False
            )
            val_terms = self._drain_terms()
            val_metrics = flatten_leaves(raw_val)
            val_metrics["loss"] = val_loss
            val_metrics.update(val_terms)
            if self.metrics_postprocess is not None:
                val_metrics = self.metrics_postprocess(val_metrics)
            self.metrics_history["validation"].append(dict(val_metrics))
            self.metrics_history_nested["validation"].append(
                {**raw_val, "loss": val_loss, **val_terms}
            )

            n_train = max(len(self.loaders["train"]), 1)
            n_val = max(len(self.loaders["validation"]), 1)
            epoch_entry = {
                "epoch": epoch,
                "train": split_epoch_entry(
                    train_loss, train_metrics,
                    self.timing_history["train"][-1], n_train,
                    self.json_nesting,
                ),
                "validation": split_epoch_entry(
                    val_loss, val_metrics,
                    self.timing_history["validation"][-1], n_val,
                    self.json_nesting,
                ),
            }
            self.epoch_metrics.append(epoch_entry)
            self._write_epoch_metrics()

            if epoch % self.print_interval == 0:
                console.print(
                    f"epoch {epoch}/{self.epochs} — "
                    f"train loss {train_loss:.4f}, val loss {val_loss:.4f}"
                )

            target = resolve_save_target(val_metrics, self.save_metric)
            is_best = self.early.step(float(target))
            if is_best:
                best_metrics = dict(val_metrics)
                self.ckpt.save_checkpoint(self.state, epoch, float(target))
                if self.on_best is not None:
                    self.on_best(self.state, epoch)
            if self.early.should_stop:
                console.print(f"early stopping at epoch {epoch}")
                if self.resume_save:
                    self._save_resume_point(epoch, best_metrics)
                break

            if self.lr is not None:
                metric_for_sched = (
                    val_loss if self.lr.kind == "plateau" else None
                )
                scale = self.lr.step(metric_for_sched)
                set_lr_scale(self.state.opt_state, scale)

            if self.resume_save:
                self._save_resume_point(epoch, best_metrics)

        self.ckpt.wait()  # drain async checkpoint writes before returning
        return best_metrics or {}

    def test(self, splits=("test",)) -> Dict[str, Dict[str, Any]]:
        """Restore best checkpoint and evaluate the given splits.

        Output schema matches the reference: `{split}_metrics.json` is a
        one-record list (pandas to_json orient='records' of MetricsReport,
        experiment_report.py:374) with 'index'/'split' fields, and — for the
        generic driver's nesting style — a final `{"test": {...}}` entry is
        appended to epoch_metrics.json (train_multimodal.py:816-856;
        train_avmnist.py does not append one)."""
        try:
            self.state = self.ckpt.load_checkpoint(self.state, "best")
            # load_checkpoint returns host-numpy leaves: commit them back
            # to device once here, or the streaming eval path re-uploads
            # the whole parameter tree EVERY batch (and the mesh scan path
            # loses the replicated layout the epoch program was compiled
            # against — same re-establishment _try_resume does)
            if self.mesh is not None:
                from mmtpu.train import device_loop as dl

                self.state = dl.replicate_tree(self.state, self.mesh)
            else:
                self.state = jax.device_put(self.state)
        except FileNotFoundError:
            logger.warning("no best checkpoint — testing current params")
        results = {}
        for split in splits:
            if split not in self.loaders:
                continue
            self.recorder.reset()
            t0 = time.time()
            loss = self.eval_epoch(split)
            elapsed = time.time() - t0
            raw = self.recorder.calculate_all_groups(
                loss=loss, skip_tensorboard=True
            )
            test_terms = self._drain_terms()
            metrics = flatten_leaves(raw)
            metrics["loss"] = loss
            metrics.update(test_terms)
            if self.metrics_postprocess is not None:
                metrics = self.metrics_postprocess(metrics)
            results[split] = metrics
            self.test_metrics_nested[split] = {
                **raw, "loss": loss, **test_terms
            }
            if self.metrics_path:
                # single canonical writer (reference records schema); the
                # CLI's later generate_report re-emits it with the full
                # train/validation context (index continuing across splits)
                from mmtpu.reports.report import MetricsReport

                MetricsReport(self.metrics_path).generate(
                    {}, {split: metrics}
                )
            if split == "test":
                entry = {
                    "test": split_epoch_entry(
                        loss, metrics, elapsed, len(self.loaders[split]),
                        self.json_nesting,
                    )
                }
                if self.json_nesting == "reference":
                    # the reference's generic test entry has no 'metrics'
                    # catch-all bucket (train_multimodal.py:828-855 has no
                    # else-branch) and is appended to epoch_metrics.json
                    entry["test"].pop("metrics", None)
                    self.epoch_metrics.append(entry)
                    self._write_epoch_metrics()
                elif self.metrics_path is not None:
                    # train_avmnist.py:846-860 writes its test entry to
                    # <metrics>/<run_id>/epoch_metrics.json (run_id nested a
                    # second time), appending if the file exists
                    sub = self.metrics_path / str(
                        self.run_id if self.run_id is not None else 1
                    )
                    sub.mkdir(parents=True, exist_ok=True)
                    fp = sub / "epoch_metrics.json"
                    data = (
                        json.loads(fp.read_text()) if fp.exists() else []
                    )
                    data.append(entry)
                    fp.write_text(json.dumps(_jsonable(data), indent=4))
        return results

    def _write_epoch_metrics(self) -> None:
        if self.metrics_path is None:
            return
        self.metrics_path.mkdir(parents=True, exist_ok=True)
        (self.metrics_path / "epoch_metrics.json").write_text(
            json.dumps(_jsonable(self.epoch_metrics), indent=4)
        )


def resolve_save_target(val_metrics: Dict[str, Any], save_metric: str) -> float:
    """Best-checkpoint target from flattened validation metrics.

    Flattened keys are '{metric}[_{PATTERN}]' (no group prefix, reference
    flatten semantics) — match the metric name as an exact component so
    'accuracy' never selects 'balanced_accuracy'; prefer the longest
    pattern suffix (the full-modality one). Fails loudly like the
    reference (train_multimodal.py:361 raises on a missing target metric)
    — silently flipping to min-loss would train to a different criterion
    while EarlyStopping stays in the configured metric's mode."""
    target = val_metrics.get(save_metric)
    if target is not None:
        return float(target)
    import re as _re

    rx = _re.compile(rf"^{_re.escape(save_metric)}(_[A-Z0-9]+)?$")
    cands = [
        k for k in val_metrics
        if rx.match(k) and isinstance(val_metrics[k], (int, float))
    ]
    if cands:
        return float(val_metrics[max(cands, key=len)])
    available = sorted(
        k for k, v in val_metrics.items() if isinstance(v, (int, float))
    )
    raise ValueError(
        f"save_metric {save_metric!r} not found in validation metrics. "
        f"Available: {available}"
    )


def _jsonable(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj
