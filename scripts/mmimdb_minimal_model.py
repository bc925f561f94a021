"""Minimal-model grid for the MM-IMDb pattern-T reversal (VERDICT r4 #3).

Round-4 isolated the mechanism: with BOTH encoders pretrained, the
converged image encoder pulls the slowly-trained (lr 1e-5) gated fusion
toward the image channel, and the image-zeroed pattern-T eval punishes
that — while text-ONLY pretraining reproduces the published +0.05 T delta
exactly. The open question: does ANY learnable generator geometry make
the both-pretrained arm win pattern T (as the reference's real data
does), and if so which property delivers it?

This script miniaturizes the EXACT pipeline — mono pretrain each encoder
(50 epochs) -> joint finetune scratch/text-only/both (100 epochs), the
real mmtpu modules (MMIMDbModalityEncoder BN->Dense, GatedBiModalNetwork,
MLPGenreClassifier with MaxOut), the real optimizer parity path (Adam
lr 1e-5 wd 1e-3 via mmtpu.train.optim), BCE-with-logits, train pattern
"it" only, eval F1_samples on IT / I(text zeroed) / T(image zeroed) —
at small fixed shapes so one compile serves every generator-knob cell.
The generator mirrors scripts/make_synthetic_mmimdb.py (sparse Zipf
genres, label-corruption channels); knobs:

  img_scale    image channel SNR (aggregate-matched to the full-size 0.04)
  img_nonneg   VGG-like ReLU features (nonneg, positive mean) vs Gaussian
               — changes what the encoder sees for a ZEROED image at
               pattern-T eval (BN running stats make f_img(0) a large
               negative constant for nonneg features)
  txt_scale    text channel SNR
  img_drop/img_spur/txt_drop/txt_spur   per-modality label corruption

Shapes: image 256, text 64, hidden 96, 23 genres, 15488 train / 2048
test, B=128 (121 steps/epoch — the real pipeline's optimization
progress at lr 1e-5) — all constant across cells.

Round-5 outcome (tracked in mmimdb_minimal_model_r5.json): the r4mirror
cell reproduces the full-pipeline reversal signature; img_nonneg flips
pattern T to the published direction (+0.054 vs published +0.052) with
the IT delta intact — the fix now shipped in make_synthetic_mmimdb.py.

Usage: timeout 3600 python scripts/mmimdb_minimal_model.py [--cells NAME,NAME]
Writes experiments_output/mmimdb_minimal_model.json
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

D_IMG, D_TXT, HID, K, Z = 256, 64, 96, 23, 24
# 121 steps/epoch at B=128 — the real pipeline's step count (15552-row
# train split), so 100 joint epochs at lr 1e-5 mean the same optimization
# progress as the full-size runs
N_TRAIN, N_TEST, B = 15488, 2048, 128
MONO_EPOCHS, JOINT_EPOCHS = 50, 100
LR, WD = 1e-5, 1e-3  # reference mmimdb regime (mmimdb_baseline.yaml:41-42)


def gen_data(seed, img_scale, img_nonneg, txt_scale,
             img_drop=0.30, img_spur=0.04, txt_drop=0.10, txt_spur=0.01):
    """Scaled-down mirror of scripts/make_synthetic_mmimdb.py: sparse
    Zipf genre labels (1-3 of 23 active), each modality observing its OWN
    label-corrupted copy through an embedding — image linear, text relu
    hidden — plus the round-5 knobs (img_nonneg: VGG-like ReLU features;
    scales matched so aggregate discriminability equals the full-size
    generator: 0.04*sqrt(4096/256)=0.16 image, 0.33/8*sqrt(300/64)~0.09
    text-effective via txt_scale)."""
    rng = np.random.default_rng(seed + 230)
    n = N_TRAIN + N_TEST
    pop = 1.0 / np.arange(1, K + 1) ** 0.8
    pop /= pop.sum()
    k_active = rng.integers(1, 4, size=n)
    y = np.zeros((n, K), np.float32)
    for i in range(n):
        y[i, rng.choice(K, size=k_active[i], replace=False, p=pop)] = 1.0

    def corrupt(drop_p, spur_p):
        c = y.copy()
        d = (rng.random(y.shape) < drop_p) & (y > 0)
        s = (rng.random(y.shape) < spur_p) & (y == 0)
        c[d] = 0.0
        c[s] = 1.0
        return c

    img_emb = rng.normal(size=(K, D_IMG)).astype(np.float32)
    x_img = (corrupt(img_drop, img_spur) @ img_emb * img_scale
             + rng.normal(size=(n, D_IMG)).astype(np.float32))
    if img_nonneg:  # VGG-like ReLU features: nonneg, positive mean
        x_img = np.maximum(x_img + 0.5, 0.0)

    w1 = rng.normal(size=(K, 32)).astype(np.float32)
    w2 = rng.normal(size=(32, D_TXT)).astype(np.float32) / 8.0
    hidden = np.maximum(corrupt(txt_drop, txt_spur) @ w1, 0.0)
    x_t = (hidden @ w2 * txt_scale
           + rng.normal(size=(n, D_TXT)).astype(np.float32))

    return {
        "img": (x_img[:N_TRAIN], x_img[N_TRAIN:]),
        "txt": (x_t[:N_TRAIN], x_t[N_TRAIN:]),
        "y": (y[:N_TRAIN], y[N_TRAIN:]),
    }


def probe_ceiling(x_tr, y_tr, x_te, y_te):
    """Crude linear-probe F1_samples ceiling (ridge to labels, 0.5
    threshold) — the same calibration readout make_synthetic_mmimdb.py's
    round-4 notes quote."""
    xtx = x_tr.T @ x_tr + 10.0 * np.eye(x_tr.shape[1], dtype=np.float32)
    w = np.linalg.solve(xtx, x_tr.T @ y_tr)
    return f1_samples(y_te, x_te @ w)


@functools.lru_cache(maxsize=None)
def _models():
    from mmtpu.models import build_module

    def enc(d_in):
        return build_module("mmimdbmodalityencoder", input_dim=d_in,
                            output_dim=HID)

    joint = build_module(
        "mmimdb",
        image_encoder=enc(D_IMG), text_encoder=enc(D_TXT),
        gated_bimodal_network=build_module(
            "gated_bimodal", input_one_dim=HID, input_two_dim=HID,
            output_one_dim=HID, output_two_dim=HID),
        classifier=build_module("mlp_genre", input_size=HID,
                                hidden_size=HID, output_size=K),
    )

    import flax.linen as nn

    class Mono(nn.Module):
        d_in: int

        @nn.compact
        def __call__(self, x, train=False):
            h = enc(self.d_in)(x, train=train)
            return nn.Dense(K, name="head")(h)

    return joint, Mono(D_IMG), Mono(D_TXT)


def _tx(params):
    from mmtpu.config.optim import OptimizerConfig
    from mmtpu.train.optim import build_optimizer

    tx, _ = build_optimizer(
        OptimizerConfig(name="Adam",
                        default_kwargs={"lr": LR, "weight_decay": WD}),
        params)
    return tx


def train_scan(model, variables, xs, y, epochs, seed=0):
    """Whole training run as ONE lax.scan over steps. The jit closure is
    re-TRACED per call (data are baked in as constants), but shapes are
    identical across cells, so the persistent XLA compile cache turns
    repeat compiles of the same architecture into loads — measured
    40-150 s per 5-training cell on the TPU."""
    import jax
    import jax.numpy as jnp
    import optax

    tx = _tx(variables["params"])
    opt_state = tx.init(variables["params"])
    steps_per_epoch = N_TRAIN // B
    host = np.random.default_rng(seed)
    idx = np.stack([host.permutation(N_TRAIN)[: steps_per_epoch * B]
                    .reshape(steps_per_epoch, B)
                    for _ in range(epochs)]).reshape(-1, B)
    xs_d = tuple(jnp.asarray(x) for x in xs)
    y_d = jnp.asarray(y)
    rng0 = jax.random.PRNGKey(seed)

    def loss_fn(params, stats, batch_xs, by, rng):
        out, upd = model.apply(
            {"params": params, "batch_stats": stats}, *batch_xs,
            train=True, mutable=["batch_stats"], rngs={"dropout": rng})
        loss = optax.sigmoid_binary_cross_entropy(out, by).mean()
        return loss, upd["batch_stats"]

    @jax.jit
    def run(params, stats, opt_state, idx_all):
        def step(carry, ib):
            params, stats, opt_state, k = carry
            batch_xs = tuple(jnp.take(x, ib, axis=0) for x in xs_d)
            by = jnp.take(y_d, ib, axis=0)
            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(
                    params, stats, batch_xs, by, jax.random.fold_in(rng0, k))
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, stats, opt_state, k + 1), loss

        (params, stats, _, _), losses = jax.lax.scan(
            step, (params, stats, opt_state, 0), idx_all)
        return params, stats, losses

    params, stats, losses = run(variables["params"],
                                variables["batch_stats"],
                                opt_state, jnp.asarray(idx))
    return ({"params": params, "batch_stats": stats},
            float(losses[-steps_per_epoch:].mean()))


def f1_samples(y_true, y_prob):
    from sklearn.metrics import f1_score

    return float(f1_score(y_true, (y_prob >= 0.5).astype(int),
                          average="samples", zero_division=0))


def eval_patterns(model, variables, img_te, txt_te, y_te):
    import jax

    out = {}
    for pat, (xi, xt) in {
        "IT": (img_te, txt_te),
        "I": (img_te, np.zeros_like(txt_te)),
        "T": (np.zeros_like(img_te), txt_te),
    }.items():
        logits = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            xi, xt, train=False)
        probs = jax.nn.sigmoid(logits)
        out[pat] = round(f1_samples(y_te, np.asarray(probs)), 4)
    return out


def run_cell(name, seed=0, **knobs):
    import jax

    data = gen_data(seed, **knobs)
    joint, mono_img, mono_txt = _models()
    rng = jax.random.PRNGKey(seed)
    img_tr, img_te = data["img"]
    txt_tr, txt_te = data["txt"]
    y_tr, y_te = data["y"]
    probes = {
        "probe_img": round(probe_ceiling(img_tr, y_tr, img_te, y_te), 4),
        "probe_txt": round(probe_ceiling(txt_tr, y_tr, txt_te, y_te), 4),
    }

    # -- mono pretrains (reference train_monomodal flow, 50 epochs) -----
    arts = {}
    for mono, x_tr, key in ((mono_img, img_tr, "image"),
                            (mono_txt, txt_tr, "text")):
        v = mono.init({"params": rng}, x_tr[:2], train=False)
        v = jax.device_get(v)
        trained, _ = train_scan(mono, v, (x_tr,), y_tr, MONO_EPOCHS,
                                seed=seed)
        got = jax.device_get(trained)
        # the artifact = the ENCODER only (encoder_{mod}_best.pth analogue)
        enc_key = next(k for k in got["params"] if k != "head")
        arts[key] = (got["params"][enc_key],
                     got["batch_stats"].get(enc_key, {}))

    # -- joint arms -----------------------------------------------------
    v0 = jax.device_get(joint.init(
        {"params": rng}, img_tr[:2], txt_tr[:2], train=False))
    enc_names = {"image": "image_encoder", "text": "text_encoder"}
    # (our MMIMDb module's submodule names)
    enc_names = {k: v for k, v in enc_names.items()
                 if v in v0["params"]} or {
        k: next(n for n in v0["params"] if k[:2] in n.lower())
        for k in ("image", "text")}

    results = {}
    for arm, load in (("scratch", ()), ("text_only", ("text",)),
                      ("both", ("image", "text"))):
        v = jax.tree_util.tree_map(lambda x: x, v0)
        for mod in load:
            p, s = arts[mod]
            v["params"][enc_names[mod]] = p
            if s:
                v["batch_stats"][enc_names[mod]] = s
        trained, ep_loss = train_scan(joint, v, (img_tr, txt_tr), y_tr,
                                      JOINT_EPOCHS, seed=seed)
        results[arm] = eval_patterns(joint, jax.device_get(trained),
                                     img_te, txt_te, y_te)
        results[arm]["final_loss"] = round(ep_loss, 4)
    return {"cell": name, "knobs": knobs, "seed": seed, **probes, **{
        f"{arm}_{pat}": v
        for arm, pats in results.items() for pat, v in pats.items()}}


# txt_scale 0.72 matches the full generator's aggregate text SNR
# (0.33/8 per-dim at 300 dims -> x sqrt(300/64) at 64); img_scale 0.16
# matches its 0.04 at 4096 dims (x sqrt(4096/256)).
CELLS = {
    # faithful mirror of the SHIPPED r4 calibration (expects the reversal)
    "r4mirror": dict(img_scale=0.16, img_nonneg=False, txt_scale=0.72),
    # image channel weakened well below the r4 sweep's 0.03-equivalent
    "img_weak": dict(img_scale=0.08, img_nonneg=False, txt_scale=0.72),
    # VGG-like nonneg image features (changes what a ZEROED image looks
    # like to the encoder's BN at pattern-T eval)
    "img_nonneg": dict(img_scale=0.16, img_nonneg=True, txt_scale=0.72),
    # text harder (lower scale -> joint training learns it even slower)
    "text_hard": dict(img_scale=0.16, img_nonneg=False, txt_scale=0.45),
    "nonneg_texthard": dict(img_scale=0.16, img_nonneg=True,
                            txt_scale=0.45),
    # image corrupted even harder (drop 50%): ceiling down with SNR intact
    "img_corrupt": dict(img_scale=0.16, img_nonneg=False, txt_scale=0.72,
                        img_drop=0.50, img_spur=0.08),
    "nonneg_corrupt": dict(img_scale=0.16, img_nonneg=True, txt_scale=0.72,
                           img_drop=0.50, img_spur=0.08),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default="")
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "experiments_output", "mmimdb_minimal_model.json"))
    args = ap.parse_args()
    names = [c for c in args.cells.split(",") if c] or list(CELLS)

    rows = []
    for name in names:
        for seed in range(args.seeds):
            t0 = time.time()
            row = run_cell(name, seed=seed, **CELLS[name])
            row["seconds"] = round(time.time() - t0, 1)
            rows.append(row)
            flip = row["both_T"] > row["scratch_T"]
            print(f"{name} seed{seed}: scratch T={row['scratch_T']} "
                  f"text_only T={row['text_only_T']} both T={row['both_T']} "
                  f"IT {row['scratch_IT']}->{row['both_IT']} "
                  f"{'** T FLIPPED **' if flip else ''} "
                  f"({row['seconds']}s)", flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
