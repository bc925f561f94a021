"""Corpus smoke: EVERY reference YAML drives its mmtpu CLI end-to-end.

The config-corpus tests (tests/test_config.py) prove all 110 reference
YAMLs parse, load, and build module specs; a handful of CLI tests dry-run
representative configs. This script closes the remaining gap: each config
actually TRAINS (1 epoch by default, synthetic data at the reference
paths' $EXP_PATH/DATA locations) through the same CLI a reference user
would invoke, including the test phase, metrics JSONs, checkpoints, and
reports.

Routing (reference user's choice of driver):
  - path contains /cmams/ or the YAML head declares a CMAM config → train_cmam
  - path contains /mono/                                          → train_monomodal
  - avmnist/centralised                                           → train_avmnist
  - everything else → train_multimodal (which routes MMIN/RedCore/Self-MM
    to their custom-step runners, reference train_multimodal.py semantics)

Execution order is the reference pipeline order — mono pretrains first,
then baselines, then pretrained variants and MMIN (which consume stage-0/1
artifacts), then C-MAMs (which consume a trained base checkpoint) — so
later stages load REAL artifacts written by earlier stages wherever the
reference's own path templates line up. Any artifact a config references
that no earlier stage produced is reported per-config (thesis-repo path
mismatches surface instead of cascading).

Usage:
  python scripts/corpus_smoke.py                 # full corpus, 1 epoch each
  python scripts/corpus_smoke.py --mode dry      # build-everything dry runs
  python scripts/corpus_smoke.py --filter mosi   # substring filter
  python scripts/corpus_smoke.py --report corpus_smoke.json

Results: per-config status/duration/log-path JSON + console summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF_CONFIGS = Path("/root/reference/MML_Suite/configs")

# Broken in the reference itself: these 6 configs' module specs cannot be
# built by the reference's own constructors either (SPEC_BUILD_XFAIL in
# tests/test_config.py, with per-config reasons documented there) — there
# is nothing runnable to smoke.
BROKEN_IN_REFERENCE = {
    "avmnist/centralised/cmams/avmnist_A_I.yaml",
    "avmnist/centralised/cmams/avmnist_I_A.yaml",
    "mosei/centralised/cmams/text_cmams/text_to_audio_cosine.yaml",
    "mosei/centralised/cmams/text_cmams/text_to_audio_cosine_mse.yaml",
    "mosei/centralised/cmams/text_cmams/text_to_video_cosine.yaml",
    "mosei/centralised/cmams/text_cmams/text_to_video_cosine_mse.yaml",
}

# Broken in the reference at TRAIN time (the spec builds, but the
# reference's own code cannot train it): reported as `xfail` rows with the
# reason, never executed. Evidence is file:line in the reference.
TRAIN_BROKEN_IN_REFERENCE = {
    # Self-MM's BertTextEncoder consumes text as (B, 3, seq_len) bert
    # token triplets — ids/mask/segments sliced at
    # models/msa/networks/bert_text_encoder.py:57-60 with `.long()` casts —
    # but the repo's MOSI loader emits (B, 50, 768) float FEATURES
    # (data/mosi.py:138, the only text key in aligned/unaligned_50.pkl).
    # text[:, 0, :].long() turns float features into garbage token ids of
    # "sequence length" 768: torch crashes on the out-of-range/negative
    # embedding indices (and a bounds-clipping backend trains BERT on
    # noise at 15x the real sequence length — 16.7 GB HBM at batch 32).
    # No config/dataset in the repo produces the (B, 3, T) format.
    "self-mm/train_self_mm_mosi.yaml": (
        "BertTextEncoder needs (B,3,seq) token ids "
        "(bert_text_encoder.py:57-60); MOSI loader only emits (B,50,768) "
        "float features (data/mosi.py:138)"
    ),
    "self-mm/train_self_mm_mosi_missing_text_03.yaml": (
        "same text-format contract violation via unaligned_50.pkl"
    ),
}


def route(rel: str, head: str) -> str:
    if "/cmams/" in rel or "CMAM" in head:
        return "mmtpu.cli.train_cmam"
    if "/mono/" in rel:
        return "mmtpu.cli.train_monomodal"
    if rel.startswith("avmnist/centralised"):
        return "mmtpu.cli.train_avmnist"
    return "mmtpu.cli.train_multimodal"


def stage_rank(rel: str, module: str) -> int:
    """Reference pipeline order: mono pretrains → baselines → consumers."""
    if module.endswith("train_monomodal"):
        return 0
    if module.endswith("train_cmam"):
        return 3
    if "pretrained" in rel or "/mmin_" in rel or "mmin_" in Path(rel).name:
        return 2
    return 1


def _truncate_sentiment_pickles(data: Path, name: str,
                                n: dict[str, int]) -> None:
    """Materialize truncated MOSI/MOSEI pickles in the workspace.

    The smoke is after crashes, not convergence, and these datasets
    dominate its wall clock: the synthetic MOSEI pickle is ~1 GB and is
    re-read by EVERY one of the ~40 mosei-family subprocesses, and the
    train/eval×patterns products scale with the split sizes. Slicing each
    split to a few hundred rows keeps every code path (padding, lengths,
    7-pattern eval product, C-MAM teacher handoff) while cutting per-config
    time several-fold. A sidecar marker keyed on (source mtime, sizes)
    makes restaging idempotent and re-done when the generator reruns."""
    import pickle

    src_dir = REPO / "DATA" / name
    dst_dir = data / name
    if dst_dir.is_symlink():  # older smoke workspaces symlinked full data
        dst_dir.unlink()
    dst_dir.mkdir(exist_ok=True)
    for src in sorted(src_dir.glob("*.pkl")):
        dst = dst_dir / src.name
        marker = dst_dir / (src.name + ".trunc.json")
        key = {"mtime": src.stat().st_mtime, "n": n}
        if dst.exists() and marker.exists() and \
                json.loads(marker.read_text()) == key:
            continue
        with open(src, "rb") as f:
            full = pickle.load(f)
        small = {split: {k: v[: n.get(split, 256)] for k, v in d.items()}
                 for split, d in full.items()}
        with open(dst, "wb") as f:
            pickle.dump(small, f)
        marker.write_text(json.dumps(key))


def _truncate_hdf5(data: Path, name: str, n: dict[str, int]) -> None:
    """Same idea as _truncate_sentiment_pickles for flat-HDF5 datasets
    (MM-IMDb: features/genres/imdb_ids/vgg_features row-aligned datasets).
    The full synthetic MM-IMDb is ~15k rows x 4096-dim VGG features; the
    ~25 mmimdb-family configs each decode it and eval it x patterns."""
    import h5py

    src_dir = REPO / "DATA" / name
    dst_dir = data / name
    if dst_dir.is_symlink():
        dst_dir.unlink()
    dst_dir.mkdir(exist_ok=True)
    for src in sorted(src_dir.glob("*.hdf5")):
        rows = n.get(src.name, 256)
        dst = dst_dir / src.name
        marker = dst_dir / (src.name + ".trunc.json")
        key = {"mtime": src.stat().st_mtime, "rows": rows}
        if dst.exists() and marker.exists() and \
                json.loads(marker.read_text()) == key:
            continue
        with h5py.File(src, "r") as fin, h5py.File(dst, "w") as fout:
            for k, v in fin.items():
                fout.create_dataset(k, data=v[:rows])
        marker.write_text(json.dumps(key))


#: Synthetic source datasets are gitignored (GB-scale); a fresh host has
#: only the committed CSV indexes. Probe file → generator script, checked
#: before staging so the smoke is self-sufficient on a new VM. Each probe
#: is the file its generator writes LAST — probing an early output would
#: let an interrupted provisioning pass as complete (and be grandfathered
#: into a marker), leaving a permanently half-generated dataset.
GENERATORS = {
    "mosi": ("unaligned_50.pkl", "make_synthetic_mosi.py"),
    "mosei": ("aligned.pkl", "make_synthetic_mosei.py"),
    "iemocap": ("target/10/tst_int2name.npy", "make_synthetic_iemocap.py"),
    "mmimdb": ("test.hdf5", "make_synthetic_mmimdb.py"),
    "kinetics-sounds": ("test.csv", "make_synthetic_kinetics_sounds.py"),
}


def _ensure_source_data() -> None:
    """Generate any missing synthetic source dataset (fresh-host case).

    Completeness is tracked by a `.generated.<name>` marker written only
    AFTER the generator exits 0 — the generators write their multi-file
    outputs non-atomically, so probing a data file alone would let an
    interrupted first provisioning pass forever. The marker records the
    GENERATOR SCRIPT's content hash: when the generator changes (e.g. the
    round-5 ReLU image-feature fix in make_synthetic_mmimdb.py), stale
    data is regenerated instead of silently kept — a content-blind marker
    would pin every previously-provisioned host to pre-fix data.
    """
    import hashlib

    for name, (probe, script) in GENERATORS.items():
        marker = REPO / "DATA" / name / f".generated.{name}"
        gen_hash = hashlib.sha256(
            (REPO / "scripts" / script).read_bytes()).hexdigest()[:16]
        want = f"generator:{gen_hash}\n"
        if marker.exists() and marker.read_text() == want:
            continue
        if marker.exists():
            print(f"{name}: generator changed since provisioning "
                  f"(marker {marker.read_text().strip()!r} != "
                  f"generator:{gen_hash}); regenerating", flush=True)
        else:
            print(f"source data missing for {name}; running {script}",
                  flush=True)
        subprocess.run([sys.executable, str(REPO / "scripts" / script)],
                       check=True, cwd=REPO)
        marker.parent.mkdir(parents=True, exist_ok=True)
        marker.write_text(want)


def _stage_workspace_data(ws: Path, avmnist_rows: int) -> None:
    """Workspace DATA dir: symlinks to the repo's synthetic datasets, except
    AVMNIST whose index CSVs are truncated — the conv family at the full
    24k-sample scale costs ~15 min/config on a 1-core CPU host, and the
    smoke is after crashes, not convergence — and MOSI/MOSEI whose pickles
    are sliced down for the same reason (see _truncate_sentiment_pickles).
    The decoded .npy caches are keyed by CSV content hash, so subset caches
    build on first touch and live in the workspace."""
    data = ws / "DATA"
    data.mkdir(exist_ok=True)
    for name in ("iemocap", "kinetics-sounds"):
        link = data / name
        # is_symlink, not exists: a dangling link (dataset generated after
        # the first smoke run) must be replaced, not re-created
        if link.is_symlink() or link.exists():
            continue
        link.symlink_to(REPO / "DATA" / name)
    _truncate_hdf5(data, "mmimdb", {"train.hdf5": 512,
                                    "validation.hdf5": 128,
                                    "test.hdf5": 128})
    _truncate_sentiment_pickles(data, "mosi",
                                {"train": 512, "valid": 128, "test": 128})
    _truncate_sentiment_pickles(data, "mosei",
                                {"train": 512, "valid": 128, "test": 128})
    # case link mirroring repo DATA/MOSI -> mosi (some configs use MOSI/)
    mosi_upper = data / "MOSI"
    if mosi_upper.is_symlink():
        mosi_upper.unlink()
    if not mosi_upper.exists():
        mosi_upper.symlink_to(data / "mosi")
    av = data / "avmnist"
    av.mkdir(exist_ok=True)
    for split, n in (("train_subset", avmnist_rows),
                     ("validation_subset", max(avmnist_rows // 4, 64)),
                     ("test_subset", max(avmnist_rows // 4, 64))):
        src = REPO / "DATA" / "avmnist" / f"{split}.csv"
        dst = av / f"{split}.csv"
        content = "\n".join(src.read_text().splitlines()[: n + 1]) + "\n"
        # write-if-different: a rerun with a new --avmnist-rows must take
        # effect; an identical rerun must not touch the mtime (the decoded
        # .npy caches key on CSV content, not time, but keep it clean)
        if not dst.exists() or dst.read_text() != content:
            dst.write_text(content)


#: Error signatures of shared-TPU/tunnel faults worth one retry. Timeouts
#: (rc=-9, empty-tail "") and genuine program errors don't match.
_TRANSIENT_MARKERS = (
    "TPU backend error",
    "FAILED_PRECONDITION",
    "DEADLINE_EXCEEDED",
    "UNAVAILABLE:",
)


def _is_transient(error_tail: str) -> bool:
    return any(m in error_tail for m in _TRANSIENT_MARKERS)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("train", "dry"), default="train")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--filter", default="", help="substring over config paths")
    ap.add_argument("--exclude", default="",
                    help="skip configs whose path contains this substring "
                         "(e.g. a family routed to a separate slow lane)")
    ap.add_argument("--workspace",
                    default=str(REPO / "experiments_output" / "corpus_smoke"))
    ap.add_argument("--report", default=str(REPO / "experiments_output"
                                            / "corpus_smoke" / "report.json"))
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--avmnist-rows", type=int, default=2048,
                    help="AVMNIST train-index rows in the smoke workspace")
    ap.add_argument("--device", choices=("cpu", "tpu"), default="cpu",
                    help="cpu: hermetic but XLA:CPU compiles a ResNet-sized "
                         "program in ~10 min on a 1-core host; tpu: the real "
                         "chip — remote compile service (~20-40s per novel "
                         "program) and fast steps, but shares the tunnel")
    ap.add_argument("--resume", action="store_true",
                    help="skip configs already ok in an existing report "
                         "(only rows that carry device provenance resume; "
                         "pre-round-5 rows without it re-run)")
    ap.add_argument("--lane", default=None,
                    help="lane label stamped into every row (defaults to "
                         "the --device value)")
    args = ap.parse_args()
    lane = args.lane or args.device
    host = __import__("platform").node()

    ws = Path(args.workspace)
    (ws / "logs").mkdir(parents=True, exist_ok=True)
    # Two exclusive locks: the GENERATOR lock is repo-scoped because
    # _ensure_source_data mutates repo-global state (REPO/DATA) that every
    # lane consumes regardless of its --workspace; the STAGING lock is
    # workspace-scoped for the truncated staging writes. Lanes sharing a
    # workspace serialize on both; lanes with distinct workspaces still
    # serialize on the generators.
    import fcntl

    (REPO / "DATA").mkdir(exist_ok=True)
    with open(REPO / "DATA" / ".gen.lock", "w") as gen_lock:
        fcntl.flock(gen_lock, fcntl.LOCK_EX)
        _ensure_source_data()
    with open(ws / ".staging.lock", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        _stage_workspace_data(ws, args.avmnist_rows)

    # earlier rows at the same report path are preserved: --resume skips
    # their configs, and every write MERGES into them (a --filter rerun
    # must never wipe the rest of a completed corpus report)
    existing: dict[str, dict] = {}
    if Path(args.report).exists():
        existing = {r["config"]: r
                    for r in json.loads(Path(args.report).read_text())}
    prior: dict[str, dict] = {}
    if args.resume:
        # device-less rows (pre-round-5 reports) are NOT resumable: the
        # whole point of provenance is that every ok row proves where it
        # ran, so legacy rows re-run under a stamped lane
        prior = {k: r for k, r in existing.items()
                 if r["status"] == "ok" and r.get("device")}

    def write_report(results):
        # Lanes may share a --report: re-read the file under an exclusive
        # lock, merge THIS lane's rows in, and replace atomically — so
        # concurrent lanes interleave instead of last-writer-wins.
        # Freshness rule per config: prefer the row with the NEWER
        # finished_at (a slow lane's final flush must not resurrect its
        # stale FAIL over another lane's later ok).
        report = Path(args.report)
        report.parent.mkdir(parents=True, exist_ok=True)
        with open(report.parent / (report.name + ".lock"), "w") as rlock:
            fcntl.flock(rlock, fcntl.LOCK_EX)
            merged = {}
            if report.exists():
                merged = {r["config"]: r
                          for r in json.loads(report.read_text())}
            for r in results:
                cur = merged.get(r["config"])
                if cur and cur.get("finished_at", 0) > r.get("finished_at", 0):
                    continue
                merged[r["config"]] = r
            tmp = report.with_suffix(".json.tmp")
            tmp.write_text(
                json.dumps(sorted(merged.values(),
                                  key=lambda r: r["config"]), indent=1))
            tmp.replace(report)

    configs = sorted(REF_CONFIGS.rglob("*.yaml"))
    rows = []
    for p in configs:
        rel = str(p.relative_to(REF_CONFIGS))
        if rel in BROKEN_IN_REFERENCE or args.filter not in rel:
            continue
        if args.exclude and args.exclude in rel:
            continue
        head = p.read_text().split("\n", 1)[0]
        module = route(rel, head)
        rows.append((stage_rank(rel, module), rel, module, p))
    rows.sort()

    env = dict(os.environ)
    env.update(
        EXP_PATH=str(ws),
        # APPEND to PYTHONPATH: the axon TPU plugin registers via a
        # sitecustomize on the inherited path — replacing the variable
        # silently de-registers the backend while JAX_PLATFORMS still
        # requests it
        PYTHONPATH=os.pathsep.join(
            [str(REPO)] + [p for p in (os.environ.get("PYTHONPATH"),) if p]
        ),
        JAX_COMPILATION_CACHE_DIR=str(REPO / ".cache" / "jax"),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0",
        JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="-1",
    )

    results = []
    n_ok = n_fail = 0
    for stage, rel, module, path in rows:
        if rel in TRAIN_BROKEN_IN_REFERENCE:
            results.append({
                "config": rel, "module": module.rsplit(".", 1)[-1],
                "stage": stage, "status": "xfail", "rc": None,
                "seconds": 0.0, "log": "",
                "finished_at": round(time.time(), 1),
                "reason": TRAIN_BROKEN_IN_REFERENCE[rel],
                # provenance: xfail rows never execute anywhere
                "device": "n/a (xfail, never executed)",
                "device_observed": "n/a", "lane": lane, "host": host,
            })
            write_report(results)
            continue
        if rel in prior:
            results.append(prior[rel])
            n_ok += 1
            continue
        log_path = ws / "logs" / (rel.replace("/", "__") + ".log")
        cmd = [sys.executable, "-m", module, "--config", str(path),
               "--run_id", "1"]
        if args.device == "cpu":
            cmd.append("--cpu")
            env["JAX_PLATFORMS"] = "cpu"
        cmd += ["--dry-run"] if args.mode == "dry" else ["--epochs", str(args.epochs)]
        t0 = time.perf_counter()
        retried = False
        for attempt in (1, 2):
            try:
                # append on retry: keep the first attempt's evidence
                with open(log_path, "w" if attempt == 1 else "a") as log:
                    # cwd=workspace: several reference configs reference
                    # their pretrained artifacts by CWD-RELATIVE paths
                    # (experiments_output/<exp>/models/1/...), so producers
                    # and consumers must share a working directory for the
                    # pipeline handoff to line up — and it must be the
                    # workspace, not the repo, to keep the smoke hermetic
                    rc = subprocess.run(cmd, stdout=log,
                                        stderr=subprocess.STDOUT,
                                        env=env, cwd=ws,
                                        timeout=args.timeout).returncode
            except subprocess.TimeoutExpired:
                rc = -9
            tail = ""
            if rc != 0:
                # drop the XLA:CPU AOT-loader pseudo-feature warning spam
                # (same-host cache reloads; documented benign in
                # mmtpu/utils/compile_cache.py) so the tail shows the error
                lines = [ln for ln in log_path.read_text().splitlines()
                         if "cpu_aot_loader" not in ln]
                tail = "\n".join(lines[-15:])
            # one retry on transient backend/tunnel faults: the shared axon
            # TPU intermittently returns FAILED_PRECONDITION/UNAVAILABLE on
            # host fetches while co-tenants reset the chip — the identical
            # code path passes on the very next run (observed: a
            # pretrained-encoder restore failed once among ~50 configs)
            if rc == 0 or attempt == 2 or not _is_transient(tail):
                break
            retried = True
            print(f"        transient backend fault, retrying: {rel}",
                  flush=True)
        dt = time.perf_counter() - t0
        status = "ok" if rc == 0 else "FAIL"
        n_ok += status == "ok"
        n_fail += status != "ok"
        # self-proving device provenance: the axon TPU plugin prints its
        # "Platform 'axon'" banner into every log that actually opened the
        # tunnel; a --cpu run never does. `device` IS the observed value —
        # the requested flag is recorded separately, and a mismatch (e.g.
        # the plugin failing to load and jax falling back to CPU under a
        # --device tpu lane) is flagged rather than laundered into TPU
        # provenance.
        try:
            log_text = log_path.read_text()
        except OSError:
            log_text = ""
        observed = "tpu" if "Platform 'axon'" in log_text else "cpu"
        results.append({"config": rel, "module": module.rsplit(".", 1)[-1],
                        "stage": stage, "status": status, "rc": rc,
                        "seconds": round(dt, 1), "log": str(log_path),
                        "retried": retried, "error_tail": tail,
                        "finished_at": round(time.time(), 1),
                        "device": observed, "device_observed": observed,
                        "device_requested": args.device,
                        "device_mismatch": observed != args.device,
                        "lane": lane, "host": host})
        if observed != args.device:
            print(f"        WARNING: requested --device {args.device} but "
                  f"the log shows {observed}: {rel}", flush=True)
        print(f"[{n_ok + n_fail}/{len(rows)}] {status:4s} {dt:7.1f}s  {rel}",
              flush=True)
        # incremental: an interrupted sweep resumes from completed configs
        write_report(results)

    write_report(results)
    n_xfail = sum(1 for r in results if r["status"] == "xfail")
    print(f"\n{n_ok} ok, {n_fail} failed, {n_xfail} xfail "
          f"(train-broken in reference) -> {args.report}")
    for r in results:
        if r["status"] == "xfail":
            print(f"  xfail {r['config']}: {r['reason']}")
        elif r["status"] != "ok":
            print(f"  FAIL {r['config']} (rc={r['rc']}) log={r['log']}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
