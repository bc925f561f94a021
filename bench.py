"""Benchmark: AVMNIST multimodal train samples/sec/chip on real TPU.

Prints ONE JSON line with the headline metric plus companion fields:
  value                    best-window samples/sec/chip
  value_median             median across windows (steady-state view)
  value_canary_normalized  quiet-chip extrapolation of the rate~canary
                           proportional-share fit — the contention-
                           corrected quiet-chip estimate
  mfu / mfu_canary_normalized
  canary_tflops            median canary across windows
  mosi_uttfusion_step_ms   second tracked workload (BASELINE.md: MOSI step
                           time) at the reference's batch 32 / T=50 shapes
  mosi_vs_baseline         torch-CPU UttFusion step-time ratio (scripts/
                           torch_cpu_baseline.py --mosi, ~249 ms/step);
                           _canary_normalized variant uses the quiet-chip
                           extrapolated step time

Workload = the reference's north-star configuration (BASELINE.md):
ResNet18 audio encoder (hidden 64) + ResNet34 image encoder (hidden 128) +
concat fusion MLP, Adam(5e-4, wd 1e-4), cross-entropy — the same
model/optimizer the `train_avmnist_resnet_pretrained.yaml` config builds,
driven through mmtpu's jitted train step on synthetic data at real shapes
(32x94 spectrograms, 28x28 images).

Compute precision: bf16 MXU passes with fp32 params/accumulation — the
`precision` experiment-config knob (mmtpu/config/experiment.py:38,
cli/common.apply_precision). Batch size defaults to the sweep winner;
run `python bench.py --sweep` to re-measure the (batch, precision) grid.

vs_baseline divides by the PyTorch-CPU reference-equivalent throughput
measured on this machine by scripts/torch_cpu_baseline.py. MFU uses XLA's
compiled-program FLOP count against the v5e bf16 peak (197 TFLOP/s).

Measurement methodology (round 5): the shared tunnel chip's delivered
compute varies several-fold with co-tenant load (measured 33-190 TFLOP/s
on the same 8192^2 bf16 matmul at different times of day), so:
(a) every window's completion barrier is a data-dependent host fetch
    followed by jax.block_until_ready over the whole state (never a bare
    scalar fetch — all device streams drain before perf_counter),
(b) timing windows are SPREAD over ~2 minutes and each window is BRACKETED
    by canary measurements (mean of before/after): canary_w = achieved
    TFLOP/s of a large bf16 matmul at that moment, quiet chip ~170-190,
(c) value_canary_normalized is the DISPLACEMENT estimate of the quiet-chip
    rate. Round-4 data proved the bracketing canary is blind to deliberate
    self-load (calibration canaries 34.6/34.9/34.6 while rates moved), so
    any rate~canary fit is unidentifiable from calibration; and the
    round-5 study (scripts/contention_study.py) showed threaded self-load
    barely displaces anything — PJRT execution within a client is FIFO, a
    loader thread's matmuls queue behind the whole dispatched step stream.
    Instead the calibration interleaves a KNOWN number m of canary-sized
    matmuls into the main thread's own step stream and times tight
    plain/mixed window pairs. TPU programs run to completion once
    scheduled, so each matmul consumes a fixed device time
    T_mm = 2n^3/QUIET_CANARY regardless of co-tenant load, giving the
    co-tenant share directly:  (1-sigma) = m*T_mm / (W_mixed - W_plain)
    and the quiet rate  R0 = steps*B / (W_plain * (1-sigma)).
    scripts/contention_study2.py validated the estimator on the real chip:
    share estimates agree to 0.3% across m in {30,60,120} and the implied
    quiet MFU is physical (~0.93). The origin rate~canary fit is still
    emitted (origin_fit_*) as legacy transparency.
"""

import json
import statistics
import sys
import time

TORCH_CPU_SAMPLES_PER_SEC = 67.2  # scripts/torch_cpu_baseline.py, 20 steps, B=128
TORCH_CPU_MOSI_STEP_MS = 249.0  # scripts/torch_cpu_baseline.py --mosi, B=32 T=50
V5E_PEAK_FLOPS = 197e12  # bf16 peak per chip
QUIET_CANARY_TFLOPS = 185.0  # quiet-chip canary (measured 170-190 idle)

# sweep winner on the real chip (see BENCH_SWEEP in RESULTS.md)
DEFAULT_BATCH = 1024
DEFAULT_PRECISION = "bf16"


def build(B):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmtpu.config.optim import OptimizerConfig
    from mmtpu.models import build_module
    from mmtpu.train.losses import LossFunctionGroup
    from mmtpu.train.optim import build_optimizer
    from mmtpu.train.state import TrainState
    from mmtpu.train.step import ClassificationTask, make_train_step

    model = build_module(
        "avmnist",
        audio_encoder=build_module("resnet18", in_channels=1, hidden_dim=64),
        image_encoder=build_module("resnet34", in_channels=1, hidden_dim=128),
        hidden_dim=128,
        dropout=0.5,
        fusion_fn="concat",
    )
    rng = jax.random.PRNGKey(0)
    a = jnp.asarray(np.random.default_rng(0).normal(size=(B, 32, 94, 1)), jnp.float32)
    i = jnp.asarray(np.random.default_rng(1).normal(size=(B, 28, 28, 1)), jnp.float32)
    labels = jnp.asarray(np.random.default_rng(2).integers(0, 10, B))

    variables = model.init({"params": rng}, a, i, train=False)
    tx, _ = build_optimizer(
        OptimizerConfig(name="Adam", default_kwargs={"lr": 5e-4, "weight_decay": 1e-4}),
        variables["params"],
    )
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )
    task = ClassificationTask(
        model=model,
        loss_group=LossFunctionGroup.from_dict(
            {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
        ),
        input_keys=("audio", "image"),
    )
    # donate=True matches the production loop (mmtpu/train/loop.py:117):
    # state buffers update in place, as a real run would
    step = make_train_step(task)
    return state, step, {"audio": a, "image": i, "labels": labels}, rng


def build_mosi(B=32, T=50):
    """Reference MOSI UttFusion at its published shapes: LSTM(5->64) audio,
    LSTM(20->64) video, TextCNN(768, 128ch) text, FcClassifier(192->3),
    batch 32, aligned T=50 (configs/mosi/centralised/
    utt_fusion_base_training.yaml:14-44,50)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmtpu.config.optim import OptimizerConfig
    from mmtpu.models import build_module
    from mmtpu.train.losses import LossFunctionGroup
    from mmtpu.train.optim import build_optimizer
    from mmtpu.train.state import TrainState
    from mmtpu.train.step import ClassificationTask, make_train_step

    model = build_module(
        "utt_fusion",
        netA=build_module("lstmencoder", input_size=5, hidden_size=64,
                          embd_method="last"),
        netV=build_module("lstmencoder", input_size=20, hidden_size=64,
                          embd_method="last"),
        netT=build_module("textcnn", input_size=768, embd_size=64,
                          in_channels=1, out_channels=128,
                          kernel_heights=[3, 4, 5], dropout=0.5),
        netC=build_module("fcclassifier", input_dim=192,
                          layers=[192, 64, 32], output_dim=3, dropout=0.5),
    )
    rng = jax.random.PRNGKey(0)
    g = np.random.default_rng(0)
    a = jnp.asarray(g.normal(size=(B, T, 5)), jnp.float32)
    v = jnp.asarray(g.normal(size=(B, T, 20)), jnp.float32)
    t = jnp.asarray(g.normal(size=(B, T, 768)), jnp.float32)
    labels = jnp.asarray(g.integers(0, 3, B))
    variables = model.init({"params": rng}, a, v, t, train=False)
    tx, _ = build_optimizer(
        OptimizerConfig(name="Adam", default_kwargs={"lr": 2e-3}),
        variables["params"],
    )
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx,
    )
    task = ClassificationTask(
        model=model,
        loss_group=LossFunctionGroup.from_dict(
            {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
        ),
        input_keys=("audio", "video", "text"),
    )
    step = make_train_step(task)
    return state, step, {"audio": a, "video": v, "text": t, "labels": labels}, rng


_CANARY_STATE = {}


def canary_tflops(reps=2, n=8192):
    """Achieved TFLOP/s of one large bf16 matmul right now — a chip-load
    canary. The tunnel chip is multi-tenant; this contextualizes the main
    number (quiet chip: ~170-190; contended: 30-60). The device buffer and
    compiled program are cached — bracketing every timing window with
    canaries must not pay a 128 MB host->device transfer per reading."""
    import jax
    import jax.numpy as jnp

    if n not in _CANARY_STATE:
        a = jax.device_put(jnp.ones((n, n), jnp.bfloat16))
        f = jax.jit(lambda a: jnp.sum((a @ a).astype(jnp.float32)))
        float(f(a))  # compile + settle
        _CANARY_STATE[n] = (a, f)
    a, f = _CANARY_STATE[n]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(a))
        best = min(best, time.perf_counter() - t0)
    return 2 * n**3 / best / 1e12


def quiet_rate_fit(rates, canaries, flops, B):
    """Quiet-chip rate from (rate, canary) window pairs.

    Proportional-share model: under time-sliced contention both the train
    step and the canary get the same chip fraction, so rate ≈ k * canary.
    Least-squares slope through the origin pools all windows (weighting
    the least-contended, least-noisy ones most) and extrapolates to the
    quiet canary. Linear scaling is still an UPPER bound (the pure-MXU
    canary degrades more under contention than the mixed train step), so
    cap at the program's peak-FLOPs throughput (MFU 1.0)."""
    k_slope = sum(r * c for r, c in zip(rates, canaries)) / sum(
        c * c for c in canaries
    )
    uncapped = k_slope * QUIET_CANARY_TFLOPS
    normalized = uncapped
    if flops:
        rate_at_peak = V5E_PEAK_FLOPS * B / flops
        normalized = min(normalized, rate_at_peak)
    # uncentered R^2 of the through-origin fit — how well the windows
    # actually follow rate ∝ canary (1.0 = perfectly proportional). Emitted
    # alongside the headline so a capped/extrapolated number carries its
    # own quality evidence.
    ss_res = sum((r - k_slope * c) ** 2 for r, c in zip(rates, canaries))
    ss_tot = sum(r * r for r in rates)
    r2 = 1.0 - ss_res / ss_tot if ss_tot else 0.0
    return {
        "normalized": normalized,
        "uncapped": uncapped,
        "capped": normalized < uncapped,
        "r2": r2,
    }


# device time of one canary-sized bf16 matmul: programs execute to
# completion once scheduled, so this is contention-independent — the unit
# of "known displaced work" the calibration injects
CANARY_N = 8192
T_MM_DEV_S = 2 * CANARY_N**3 / (QUIET_CANARY_TFLOPS * 1e12)  # ~5.94 ms


def displacement_estimate(pairs, m, steps, B, flops, t_mm=T_MM_DEV_S,
                          n_chips=1, floor=None):
    """Quiet-chip rate from plain/mixed window pairs (pure host math).

    Each pair is (w_plain, w_mixed): wall seconds of `steps` train steps,
    then `steps` train steps with `m` canary matmuls interleaved into the
    SAME dispatch stream, measured back-to-back so the co-tenant share
    sigma is common. The device executes our client's programs exclusively
    and FIFO, so the extra wall time is exactly the m matmuls' device time
    divided by our share:
        (1 - sigma) = m * t_mm / (w_mixed - w_plain)
        R_quiet     = steps * B / (w_plain * (1 - sigma))
    Validated on the real chip by scripts/contention_study2.py: share
    estimates agree to 0.3% across m in {30, 60, 120}, implied quiet MFU
    ~0.93 (physical). Pairs with w_mixed <= w_plain (co-tenant burst mid-
    pair) are dropped; returns None if none survive. Rates are
    per-chip (n_chips divides, matching measure()'s window rates).
    `floor` (the best RAW window rate observed this run) lower-bounds the
    estimate — "quiet" can never be slower than a rate actually measured
    under contention."""
    shares, quiet_rates = [], []
    for w_plain, w_mixed in pairs:
        if w_mixed <= w_plain:
            continue
        share = m * t_mm / (w_mixed - w_plain)
        if not 0.0 < share <= 1.0:
            continue
        shares.append(share)
        quiet_rates.append(steps * B / (w_plain * share) / n_chips)
    if not quiet_rates:
        return None
    quiet = statistics.median(quiet_rates)
    if floor is not None:
        quiet = max(quiet, floor)
    uncapped = quiet
    capped = False
    if flops:
        cap = V5E_PEAK_FLOPS * B / flops
        if quiet > cap:
            quiet, capped = cap, True
    return {
        "normalized": quiet,
        "uncapped": uncapped,
        "capped": capped,
        "model": "displacement",
        "share_median": statistics.median(shares),
        "shares": shares,
        "quiet_rates": quiet_rates,
        "pairs": [(round(p, 4), round(x, 4)) for p, x in pairs],
        "m": m,
    }


def measure(builder, B, precision, windows=8, steps=60, warmup=10,
            spread_s=18.0, disp_pairs=0, disp_m=60, disp_steps=None):
    """Timed windows spread over ~minutes, one canary per window.

    With disp_pairs > 0, follows the natural windows with that many
    back-to-back plain/mixed window pairs for the displacement calibration
    (see displacement_estimate). Returns dict with best/median raw rate,
    quiet-chip normalized rate, MFU (raw + normalized), and the
    per-window canary list."""
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_default_matmul_precision",
        "bfloat16" if precision == "bf16" else "float32",
    )
    state, step, batch, rng = builder(B)

    flops = None
    try:
        compiled = step.lower(state, batch, rng).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    def barrier(st):
        # data-dependent scalar fetch (the only reliable completion signal
        # over the axon tunnel — bare block_until_ready has returned early
        # there), then drain every device buffer of the state
        s = float(jnp.sum(jax.tree_util.tree_leaves(st.params)[0]))
        jax.block_until_ready(st)
        return s

    for k in range(warmup):
        state, out = step(state, batch, jax.random.fold_in(rng, k))
    barrier(state)

    n_chips = jax.device_count()

    def timed_window(w, n_steps, c_prev):
        t0 = time.perf_counter()
        for k in range(n_steps):
            nonlocal_state[0], _ = step(
                nonlocal_state[0], batch, jax.random.fold_in(rng, w * steps + k)
            )
        barrier(nonlocal_state[0])
        dt = time.perf_counter() - t0
        c_next = canary_tflops(reps=1)
        # bracket the window: contention during the window is estimated by
        # the mean of the canaries immediately before and after it
        return n_steps * B / dt / n_chips, 0.5 * (c_prev + c_next), c_next

    nonlocal_state = [state]
    rates, canaries = [], []
    c_prev = canary_tflops(reps=1)
    for w in range(windows):
        r, c, c_prev = timed_window(w, steps, c_prev)
        rates.append(r)
        canaries.append(c)
        if spread_s and w < windows - 1:
            time.sleep(spread_s)
            c_prev = canary_tflops(reps=1)

    # displacement calibration: tight plain/mixed window pairs (excluded
    # from the raw best/median — the mixed windows deliberately carry
    # extra injected work)
    disp = None
    if disp_pairs:
        S = disp_steps or steps
        canary_tflops(reps=1)  # ensure the canary program is resident
        a_mm, f_mm = _CANARY_STATE[CANARY_N]

        def disp_window(m, tag):
            outs = []
            every = S / m if m else float("inf")
            nxt = every
            t0 = time.perf_counter()
            for k in range(S):
                nonlocal_state[0], _ = step(
                    nonlocal_state[0], batch,
                    jax.random.fold_in(rng, 777_000 + tag * 1000 + k))
                while k + 1 >= nxt:
                    outs.append(f_mm(a_mm))
                    nxt += every
            # completion: wait on EVERY injected matmul, then fetch the
            # last one. Fetching only the last is NOT enough — measured
            # live (round 5): with float(outs[-1]) alone the mixed window
            # closed ~1 s early while the same-moment study script (per-
            # output waits) still measured share 0.21, i.e. the tunnel
            # completes the last-dispatched program out of FIFO order
            # while earlier injected matmuls are still in flight.
            for x in outs:
                jax.block_until_ready(x)
            if outs:
                float(outs[-1])
            barrier(nonlocal_state[0])
            return time.perf_counter() - t0

        disp_window(4, 99)  # warm the mixed dispatch path
        pair_times = []
        for rep in range(disp_pairs):
            w_plain = disp_window(0, 2 * rep)
            w_mixed = disp_window(disp_m, 2 * rep + 1)
            pair_times.append((w_plain, w_mixed))
        disp = displacement_estimate(pair_times, disp_m, S, B, flops,
                                     n_chips=n_chips, floor=max(rates))
        if disp is not None and disp_pairs >= 2:
            # built-in falsification: one extra pair at DOUBLE the injected
            # count must produce the same share (the estimator's validated
            # m-invariance, scripts/contention_study2.py) — emitted as
            # displacement_share_m2x for the reader to check
            w_plain = disp_window(0, 900)
            w_mixed = disp_window(2 * disp_m, 901)
            check = displacement_estimate(
                [(w_plain, w_mixed)], 2 * disp_m, S, B, flops,
                n_chips=n_chips)
            disp["share_m2x"] = (
                check["share_median"] if check is not None else None
            )

    origin = quiet_rate_fit(rates, canaries, flops, B)
    fit = disp if disp is not None else {**origin, "model": "origin"}
    normalized = fit["normalized"]
    best = max(rates)
    # per-chip MFU: rates are samples/sec/chip and flops is the program's
    # per-batch total, so per-chip FLOP/s = rate * flops / B (no n_chips
    # factor — multiplying by it double-counted chips on multi-device hosts)
    mfu = (flops * best / B / V5E_PEAK_FLOPS) if flops else None
    mfu_norm = (
        flops * normalized / B / V5E_PEAK_FLOPS
        if flops else None
    )
    # opportunistic quiet evidence: the best RAW window that ran while the
    # chip happened to be near-quiet (canary >= 150), if any — a direct
    # measurement, no model involved
    quiet_pairs = [(r, c) for r, c in zip(rates, canaries) if c >= 150.0]
    quiet_window = max(quiet_pairs) if quiet_pairs else None
    return {
        "best": best,
        "median": statistics.median(rates),
        "normalized": normalized,
        "normalized_uncapped": fit["uncapped"],
        "normalized_capped": fit["capped"],
        "fit_model": fit.get("model", "origin"),
        "disp": disp,
        "origin_fit": origin,
        "mfu": mfu,
        "mfu_normalized": mfu_norm,
        "canary_median": statistics.median(canaries),
        "canaries": canaries,
        "rates": rates,
        "quiet_window_rate": quiet_window[0] if quiet_window else None,
        "quiet_window_canary": quiet_window[1] if quiet_window else None,
        "flops": flops,
    }


def _run_epochs(step, state, arrays, labels, rng, B, max_epochs,
                acc_target=None):
    """Train over the device-resident arrays for up to `max_epochs`.

    Returns (final_state, first_epoch_reaching_acc_target_or_None). The
    per-step correct-count stays a DEVICE scalar, fetched once per epoch —
    per-step int() fetches would serialize dispatch over the tunnel, the
    very cost keeping the whole split HBM-resident avoids. Train accuracy
    is accumulated from the training steps themselves, the reference's
    semantics (train_multimodal.py:438-496)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(labels.shape[0])
    steps_per_epoch = n // B
    host_rng = np.random.default_rng(0)
    reached = None
    first_epoch_loss = None
    for epoch in range(1, max_epochs + 1):
        perm = host_rng.permutation(n)[: steps_per_epoch * B]
        correct = jnp.zeros((), jnp.int32)
        loss_sum = jnp.zeros((), jnp.float32)
        for s in range(steps_per_epoch):
            idx = jnp.asarray(perm[s * B : (s + 1) * B])
            batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}
            batch["labels"] = jnp.take(labels, idx, axis=0)
            state, out = step(state, batch,
                              jax.random.fold_in(rng, epoch * 10_000 + s))
            correct = correct + jnp.sum(out["preds"] == batch["labels"])
            loss_sum = loss_sum + out["loss"]
        if epoch == 1:
            first_epoch_loss = float(loss_sum) / steps_per_epoch
        if acc_target is not None and reached is None and \
                int(correct) / (steps_per_epoch * B) >= acc_target:
            reached = epoch
            break
    return state, reached, first_epoch_loss


def _epochs_until(step, state, arrays, labels, rng, B, acc_target=0.99,
                  max_epochs=15):
    """(first 1-based epoch whose during-epoch train accuracy reaches
    `acc_target` or None, epoch-1 mean train loss)."""
    _, reached, first_loss = _run_epochs(step, state, arrays, labels, rng,
                                         B, max_epochs,
                                         acc_target=acc_target)
    return reached, first_loss


def convergence_epochs(B=1024, max_epochs=15, pretrain_epochs=4,
                       n_samples=None):
    """BASELINE.md's third tracked metric: AVMNIST epochs-to-99% train
    accuracy, scratch vs pretrained-encoder initialization (reference
    README.md:28 — 8 vs 2 epochs, measured at the reference's B=128
    regime, configs/avmnist/centralised/train_avmnist_resnet.yaml:53).
    Runs the north-star flagship model on the generated AVMNIST data
    (DATA/avmnist, same corpus the recorded pipelines train on); encoders
    are pretrained monomodally in-process (reference train_monomodal.py
    flow) before the pretrained variant. main() runs this at BOTH the
    throughput-sweep batch (1024) and the reference's B=128 so the metric
    has the dynamic range to express the published 4x gap."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmtpu.config.optim import OptimizerConfig
    from mmtpu.data.avmnist import AVMNIST
    from mmtpu.modalities import Modality
    from mmtpu.models import build_module
    from mmtpu.train.losses import LossFunctionGroup
    from mmtpu.train.optim import build_optimizer
    from mmtpu.train.state import TrainState
    from mmtpu.train.step import ClassificationTask, make_train_step

    root = os.path.dirname(os.path.abspath(__file__))
    csv = os.path.join(root, "DATA", "avmnist", "train_subset.csv")
    if not os.path.exists(csv):
        return {"convergence_data": "unavailable"}
    ds = AVMNIST(csv, split="train", selected_patterns=["ai"])
    # whole split resident in HBM once — per-step host->device transfers
    # would ride the tunnel 15 MB at a time
    audio_np = np.asarray(ds.arrays[Modality.AUDIO], np.float32)
    image_np = np.asarray(ds.arrays[Modality.IMAGE], np.float32)
    labels_np = np.asarray(ds.labels, np.int64)
    if n_samples and n_samples < labels_np.shape[0]:
        # stride slicing over the fixed CSV order — the same rule
        # scripts/torch_cpu_baseline.py --convergence uses, so the torch
        # ablation trains on the identical subset
        stride = labels_np.shape[0] // n_samples
        sel = np.arange(0, labels_np.shape[0], stride)[:n_samples]
        audio_np, image_np, labels_np = (
            audio_np[sel], image_np[sel], labels_np[sel])
    audio = jnp.asarray(audio_np)[..., None]
    image = jnp.asarray(image_np)
    labels = jnp.asarray(labels_np)
    arrays = {"audio": audio, "image": image}
    rng = jax.random.PRNGKey(0)

    def flagship():
        return build_module(
            "avmnist",
            audio_encoder=build_module("resnet18", in_channels=1,
                                       hidden_dim=64),
            image_encoder=build_module("resnet34", in_channels=1,
                                       hidden_dim=128),
            hidden_dim=128, dropout=0.5, fusion_fn="concat",
        )

    def make_state(model, variables):
        tx, _ = build_optimizer(
            OptimizerConfig(name="Adam",
                            default_kwargs={"lr": 5e-4, "weight_decay": 1e-4}),
            variables["params"],
        )
        return TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=tx,
        )

    def multimodal_task(model):
        return ClassificationTask(
            model=model,
            loss_group=LossFunctionGroup.from_dict(
                {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
            ),
            input_keys=("audio", "image"),
        )

    # -- scratch ----------------------------------------------------------
    model = flagship()
    init_vars = jax.device_get(model.init(
        {"params": rng}, audio[:2], image[:2], train=False
    ))
    step = make_train_step(multimodal_task(model), donate=False)
    scratch, scratch_ep1_loss = _epochs_until(
        step, make_state(model, init_vars), arrays, labels, rng, B,
        max_epochs=max_epochs)

    # -- monomodal pretrain of each encoder (train_monomodal.py:536) ------
    pretrained_parts = {}
    for mod, enc_name, hidden in (("audio", "resnet18", 64),
                                  ("image", "resnet34", 128)):
        mono = build_module(
            "monomodal_encoder",
            encoder=build_module(enc_name, in_channels=1, hidden_dim=hidden),
            output_dim=hidden, num_classes=10,
        )
        x = arrays[mod]
        mv = mono.init({"params": rng}, x[:2], train=False)
        mono_task = ClassificationTask(
            model=mono,
            loss_group=LossFunctionGroup.from_dict(
                {"ce": {"loss_name": "cross_entropy", "weight": 1.0}}
            ),
            input_keys=(mod,),
        )
        mono_step = make_train_step(mono_task, donate=False)
        mstate = make_state(mono, jax.device_get(mv))
        mstate, _, _ = _run_epochs(mono_step, mstate, {mod: x}, labels,
                                   rng, B, max_epochs=pretrain_epochs)
        got = jax.device_get(mstate.params)
        stats = jax.device_get(mstate.batch_stats) if mstate.batch_stats else {}
        pretrained_parts[mod] = (got.get("encoder", got), stats.get("encoder", {}))

    # -- pretrained-encoder init (train_multimodal.py:156-204) ------------
    pre_vars = jax.tree_util.tree_map(lambda x: x, init_vars)
    for mod in ("audio", "image"):
        enc_params, enc_stats = pretrained_parts[mod]
        pre_vars["params"][f"{mod}_encoder"] = enc_params
        if enc_stats:
            pre_vars["batch_stats"][f"{mod}_encoder"] = enc_stats
    pretrained, pre_ep1_loss = _epochs_until(
        step, make_state(model, pre_vars), arrays, labels, rng, B,
        max_epochs=max_epochs)
    return {
        # the INDEX is generated (make_avmnist_index.py); the tensors it
        # points at are the real shipped AVMNIST assets under
        # /root/reference/MML_Suite/AVMNIST/dataset
        "convergence_data": "avmnist_shipped_tensors",
        "epochs_to_99_scratch": scratch,
        "epochs_to_99_pretrained": pretrained,
        # BASELINE.md row 3 (first-epoch loss, pretrained vs scratch:
        # reference 0.5070 -> 0.2706), now driver-captured too
        "first_epoch_loss_scratch": round(scratch_ep1_loss, 4),
        "first_epoch_loss_pretrained": round(pre_ep1_loss, 4),
    }


def quiet_captures():
    """Best opportunistic quiet-chip capture recorded by
    scripts/quiet_bench_probe.py — from the tracked QUIET_CAPTURES.jsonl
    (committed evidence) or the workspace log, whichever is best."""
    import os

    root = os.path.dirname(os.path.abspath(__file__))
    best = None
    for path in (
        os.path.join(root, "QUIET_CAPTURES.jsonl"),
        os.path.join(root, "experiments_output", "quiet_bench_log.jsonl"),
    ):
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    entry = json.loads(line)
                    value = entry["bench"]["value"]
                except (KeyError, TypeError, json.JSONDecodeError):
                    continue
                # config provenance: a capture recorded under a different
                # batch/precision is not evidence for the current headline
                if entry["bench"].get("batch", DEFAULT_BATCH) != DEFAULT_BATCH:
                    continue
                if entry["bench"].get(
                    "precision", DEFAULT_PRECISION
                ) != DEFAULT_PRECISION:
                    continue
                if best is None or value > best["value_quiet_observed"]:
                    best = {
                        "value_quiet_observed": value,
                        "quiet_observed_ts": entry.get("ts"),
                        "quiet_observed_trigger_canary": entry.get(
                            "trigger_canary"
                        ),
                        "quiet_observed_mfu": entry["bench"].get("mfu"),
                    }
    return best or {}


def _enable_compile_cache() -> None:
    """Persistent compile cache: TPU compiles ride the remote-compile
    tunnel (20s-minutes); caching them makes repeat bench runs start hot.
    TPU entries are host-independent and shared; a CPU-backend run gets a
    host-CPU-keyed dir so another machine's XLA:CPU AOT entries are never
    loaded here (feature mismatch risks SIGILL)."""
    import os

    from mmtpu.utils import compile_cache

    root = os.path.dirname(os.path.abspath(__file__))
    compile_cache.enable_for_backend(root)


def main() -> None:
    _enable_compile_cache()
    if "--sweep" in sys.argv:
        results = []
        for precision in ("f32", "bf16"):
            for B in (128, 256, 512, 1024):
                m = measure(build, B, precision, windows=3, steps=50,
                            spread_s=0.0)
                results.append({"batch": B, "precision": precision,
                                "samples_per_sec": round(m["best"], 1),
                                "mfu": round(m["mfu"], 4) if m["mfu"] else None})
                print(json.dumps(results[-1]), file=sys.stderr)
        best = max(results, key=lambda r: r["samples_per_sec"])
        print(json.dumps({"sweep": results, "best": best}, indent=1),
              file=sys.stderr)
        # --sweep is a diagnostic mode: stop here rather than also printing
        # the fixed-config headline JSON, which measures (DEFAULT_BATCH,
        # DEFAULT_PRECISION) for round-over-round comparability and could
        # disagree with the sweep winner just printed above
        return

    # displacement calibration: 3 plain/mixed pairs, m=60 injected matmuls
    # (validated m-invariant by scripts/contention_study2.py)
    m = measure(build, DEFAULT_BATCH, DEFAULT_PRECISION,
                disp_pairs=3, disp_m=60)
    mosi_B = 32
    mm = measure(build_mosi, mosi_B, DEFAULT_PRECISION, windows=4, steps=50,
                 spread_s=4.0, disp_pairs=2, disp_m=30, disp_steps=100)

    conv = {}
    if "--no-convergence" not in sys.argv:
        try:
            conv = convergence_epochs()
        except Exception as e:  # bench must never crash the driver run
            conv = {"convergence_data": "error", "convergence_error": repr(e)[:200]}
        # the reference's own regime (B=128, README.md:28 anchor 8 vs 2).
        # At B=1024 on the full 24k index scratch converges in ~3 epochs
        # and the metric has no dynamic range. Root cause (ROUND5): the
        # reference never shipped its train_subset.csv; on a 6k stride
        # subset of the same real tensors the first-epoch losses land on
        # the published values (0.62/0.27 vs published 0.51/0.27) and the
        # convergence gap expresses (6 vs 3 epochs) — the published 8-vs-2
        # is a property of their smaller unpublished subset, not of the
        # framework (torch ablation: scripts/torch_cpu_baseline.py
        # --convergence, same subset, RESULTS.md round-5 section).
        try:
            c128 = convergence_epochs(B=128, n_samples=6000)
            conv.update({f"{k}_b128": v for k, v in c128.items()
                         if k != "convergence_data"})
            conv["convergence_b128_n_samples"] = 6000
        except Exception as e:
            conv["convergence_b128_error"] = repr(e)[:200]

    print(
        json.dumps(
            {
                "metric": "avmnist_multimodal_train_samples_per_sec_per_chip",
                "value": round(m["best"], 1),
                "unit": "samples/sec/chip",
                "vs_baseline": round(m["best"] / TORCH_CPU_SAMPLES_PER_SEC, 2),
                "value_median": round(m["median"], 1),
                "value_canary_normalized": round(m["normalized"], 1),
                # quiet-chip estimate transparency: the uncapped value,
                # whether the MFU-1.0 cap engaged, which model produced it
                # (displacement when the calibration pairs survived,
                # origin rate~canary fit as fallback), and the
                # displacement evidence itself
                "value_canary_normalized_uncapped": round(
                    m["normalized_uncapped"], 1
                ),
                "canary_cap_engaged": m["normalized_capped"],
                "canary_fit_model": m["fit_model"],
                **({
                    "displacement_share": round(m["disp"]["share_median"], 4),
                    "displacement_shares": [
                        round(s, 4) for s in m["disp"]["shares"]
                    ],
                    # m-invariance self-check: one pair at 2x the injected
                    # matmul count must agree with displacement_share
                    "displacement_share_m2x": (
                        round(m["disp"]["share_m2x"], 4)
                        if m["disp"].get("share_m2x") is not None else None
                    ),
                    "displacement_m": m["disp"]["m"],
                    "displacement_window_pairs_s": m["disp"]["pairs"],
                    "displacement_quiet_rates": [
                        round(r, 1) for r in m["disp"]["quiet_rates"]
                    ],
                } if m["disp"] else {}),
                # legacy origin-fit transparency (rate ~ canary through the
                # origin over the natural windows)
                "origin_fit_normalized": round(m["origin_fit"]["normalized"], 1),
                "origin_fit_r2": round(m["origin_fit"]["r2"], 4),
                # direct quiet evidence, when available: best raw window
                # that ran at canary>=150 this run, and the best capture
                # scripts/quiet_bench_probe.py ever recorded
                "quiet_window_rate": (
                    round(m["quiet_window_rate"], 1)
                    if m["quiet_window_rate"] else None
                ),
                "quiet_window_canary": (
                    round(m["quiet_window_canary"], 1)
                    if m["quiet_window_canary"] else None
                ),
                "quiet_window_mfu": (
                    round(m["flops"] * m["quiet_window_rate"]
                          / DEFAULT_BATCH / V5E_PEAK_FLOPS, 4)
                    if m["quiet_window_rate"] and m["flops"] else None
                ),
                **quiet_captures(),
                **conv,
                "mfu": round(m["mfu"], 4) if m["mfu"] else None,
                "mfu_canary_normalized": (
                    round(m["mfu_normalized"], 4) if m["mfu_normalized"] else None
                ),
                "canary_tflops": round(m["canary_median"], 1),
                "quiet_canary_tflops": QUIET_CANARY_TFLOPS,
                # full evidence: per-window (rate, canary) pairs
                "window_rates": [round(r, 1) for r in m["rates"]],
                "window_canaries": [round(c, 1) for c in m["canaries"]],
                # capture provenance: quiet_captures() only merges probe
                # entries recorded at this same config
                "batch": DEFAULT_BATCH,
                "precision": DEFAULT_PRECISION,
                "mosi_uttfusion_step_ms": round(1000.0 * mosi_B / mm["best"], 3),
                "mosi_uttfusion_step_ms_canary_normalized": round(
                    1000.0 * mosi_B / mm["normalized"], 3
                ),
                "mosi_batch": mosi_B,
                # vs the torch-CPU UttFusion step at the same shapes
                # (scripts/torch_cpu_baseline.py --mosi)
                "mosi_vs_baseline": round(
                    TORCH_CPU_MOSI_STEP_MS / (1000.0 * mosi_B / mm["best"]), 2
                ),
                "mosi_vs_baseline_canary_normalized": round(
                    TORCH_CPU_MOSI_STEP_MS
                    / (1000.0 * mosi_B / mm["normalized"]), 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
