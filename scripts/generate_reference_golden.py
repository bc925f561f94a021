"""Generate golden JSON fixtures by running the REFERENCE trainers on tiny
synthetic data (CPU), so mmtpu's epoch_metrics.json / test_metrics.json
schema can be diffed against the real thing in tests.

The reference's external deps missing from this image are shimmed:
- `modalities` (git dep): Modality registry + create_missing_mask, backed by
  torch tensors exactly as reference data/base_dataset.py:53 consumes them.
- `torchvision.transforms.v2`: only PILToTensor/ToDtype, used by
  reference data/avmnist.py:16.

Outputs into tests/golden/:
    reference_avmnist/epoch_metrics.json + test_metrics.json
    reference_multimodal/epoch_metrics.json + test_metrics.json  (mmimdb)
    reference_monomodal/{train,validation,test}_metrics.json + artifacts.json
        (train_monomodal.py on the avmnist audio-encoder config; artifacts =
         checkpoint/encoder file names + encoder state-dict keys,
         train_monomodal.py:790-802)
    reference_cmam/{train,validation,test}_metrics.json
        (train_cmam.py image->text on the tiny mmimdb run's best.pth)

Usage: python scripts/generate_reference_golden.py
"""

from __future__ import annotations

import csv
import json
import shutil
import sys
import tempfile
import types
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/MML_Suite")
GOLDEN = REPO / "tests" / "golden"


# ---------------------------------------------------------------------------
# dependency shims
# ---------------------------------------------------------------------------

def install_shims() -> None:
    # -- modalities ---------------------------------------------------------
    mod = types.ModuleType("modalities")

    class Modality:
        # NOT a str subclass: reference code distinguishes modality keys
        # from string keys with isinstance(x, str)
        # (train_avmnist.py:1240-1245).
        _registry: dict = {}

        def __new__(cls, name):
            key = str(name).lower()
            if key in cls._registry:
                return cls._registry[key]
            obj = super().__new__(cls)
            obj._key = key
            cls._registry[key] = obj
            return obj

        @property
        def name(self):
            return self._key.upper()

        @classmethod
        def from_str(cls, name):
            return cls(name)

        def __str__(self):
            # the real package stringifies uppercase: train_monomodal.py's
            # modality-key discovery tests `"AUDIO" in str(key)` (:114-120)
            return self._key.upper()

        def __hash__(self):
            return hash(self._key)

        def __eq__(self, other):
            if isinstance(other, Modality):
                return self._key is other._key or self._key == other._key
            if isinstance(other, str):
                return self._key == other.lower()
            return NotImplemented

        def __lt__(self, other):
            o = other._key if isinstance(other, Modality) else str(other)
            return self._key < o

        def __repr__(self):
            return f"Modality.{self.name}"

    def add_modality(name):
        m = Modality(name)
        setattr(Modality, str(m).upper(), m)
        return m

    for base in ("audio", "image", "text", "video", "multimodal"):
        add_modality(base)

    def create_missing_mask(num_modalities, length, missing_probs):
        # reference base_dataset.py:53 passes [1 - keep_prob, ...] and
        # consumes a torch tensor via .squeeze() / .T
        probs = torch.tensor(missing_probs, dtype=torch.float32)
        u = torch.rand(length, num_modalities)
        return (u >= probs.unsqueeze(0)).float()

    mod.Modality = Modality
    mod.add_modality = add_modality
    mod.create_missing_mask = create_missing_mask
    sys.modules["modalities"] = mod

    # -- torchvision.transforms.v2 ------------------------------------------
    tv = types.ModuleType("torchvision")
    tf = types.ModuleType("torchvision.transforms")
    v2 = types.ModuleType("torchvision.transforms.v2")

    class PILToTensor:
        def __call__(self, img):
            arr = np.array(img)
            if arr.ndim == 2:
                arr = arr[None, :, :]
            else:
                arr = arr.transpose(2, 0, 1)
            return torch.from_numpy(arr)

    class ToDtype:
        def __init__(self, dtype, scale=False):
            self.dtype = dtype
            self.scale = scale

        def __call__(self, t):
            t = t.to(self.dtype)
            if self.scale:
                t = t / 255.0
            return t

    v2.PILToTensor = PILToTensor
    v2.ToDtype = ToDtype
    tf.v2 = v2
    tv.transforms = tf
    tv.__version__ = "0.0.0-shim"
    import importlib.machinery

    for m in (mod, tv, tf, v2):
        # transformers probes importlib.util.find_spec; a module with
        # __spec__=None raises ValueError there.
        m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, loader=None)
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tf
    sys.modules["torchvision.transforms.v2"] = v2

    sys.path.insert(0, str(REF))


# ---------------------------------------------------------------------------
# tiny synthetic data
# ---------------------------------------------------------------------------

def make_avmnist_data(root: Path, n_train=24, n_eval=12) -> None:
    rng = np.random.default_rng(0)
    (root / "DATA/avmnist").mkdir(parents=True, exist_ok=True)
    pt_dir = root / "DATA/avmnist/pt"
    pt_dir.mkdir(exist_ok=True)

    def write_split(name, n):
        rows = []
        for i in range(n):
            spec = torch.from_numpy(
                rng.normal(size=(32, 94)).astype(np.float32)
            )
            img = torch.from_numpy(
                (rng.random((28, 28)) * 255).astype(np.uint8)
            )
            sp = pt_dir / f"{name}_spec_{i}.pt"
            ip = pt_dir / f"{name}_img_{i}.pt"
            torch.save(spec, sp)
            torch.save(img, ip)
            rows.append((str(sp), str(ip), i % 10))
        with open(root / f"DATA/avmnist/{name}_subset.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["audio", "image", "label"])
            w.writerows(rows)

    write_split("train", n_train)
    write_split("validation", n_eval)
    write_split("test", n_eval)


def make_mmimdb_data(root: Path, n_train=24, n_eval=12) -> None:
    import h5py

    rng = np.random.default_rng(0)
    d = root / "DATA/mmimdb"
    d.mkdir(parents=True, exist_ok=True)
    for split, n in (("train", n_train), ("validation", n_eval), ("test", n_eval)):
        with h5py.File(d / f"{split}.hdf5", "w") as f:
            f["vgg_features"] = rng.normal(size=(n, 4096)).astype(np.float32)
            f["features"] = rng.normal(size=(n, 300)).astype(np.float32)
            f["genres"] = (rng.random((n, 23)) < 0.2).astype(np.float32)
            f["imdb_ids"] = np.array(
                [f"{i:07d}".encode() for i in range(n)]
            )


# ---------------------------------------------------------------------------
# config templating: start from reference YAML, shrink to tiny CPU run
# ---------------------------------------------------------------------------

AVMNIST_SRC = REF / "configs/avmnist/centralised/train_avmnist.yaml"
MMIMDB_SRC = REF / "configs/mmimdb/centralised/mmimdb_baseline.yaml"
MONO_SRC = REF / "configs/avmnist/mono/train_audio_encoder.yaml"
CMAM_SRC = REF / "configs/mmimdb/centralised/cmams/image_to_text.yaml"


def write_tiny_config(src: Path, dst: Path, root: Path, epochs=2) -> None:
    import re

    text = src.read_text()
    text = text.replace('"cuda"', '"cpu"').replace("device: cuda", "device: cpu")
    # line-anchored: a bare `epochs:` key only, NOT
    # `train_print_interval_epochs:` (which sorts first in these YAMLs and
    # silently left the real epoch count at 30, making the "tiny" runs 10x)
    text = re.sub(r"(?m)^(\s*)epochs:\s*\d+", rf"\g<1>epochs: {epochs}", text)
    text = re.sub(r"batch_size:\s*\d+", "batch_size: 8", text)
    text = re.sub(r"num_workers:\s*\d+", "num_workers: 0", text)
    text = text.replace("$EXP_PATH", str(root))
    text = re.sub(r"enabled:\s*(true|True)", "enabled: false", text)
    dst.write_text(text)


# ---------------------------------------------------------------------------

def run_reference(entry: str, config_path: Path, run_id: int, cwd: Path,
                  extra_args: tuple = ("--disable_monitoring",)):
    """Drive a reference trainer module's main() with argv.
    train_monomodal.py has no --disable_monitoring flag — pass extra_args=()."""
    import runpy

    argv = [entry, "--config", str(config_path), "--run_id", str(run_id),
            *extra_args]
    old_argv, old_cwd = sys.argv, Path.cwd()
    sys.argv = argv
    import os

    # train_cmam.py calls gpu_memory(), which raises on CPU-only hosts —
    # stub it before the driver binds the name at import.
    try:
        import experiment_utils.utils as _eu

        _eu.gpu_memory = lambda *a, **k: "Allocated:\t0.00GB\nCached:\t0.00GB"
    except Exception:
        pass

    os.chdir(cwd)
    try:
        runpy.run_path(str(REF / entry), run_name="__main__")
    except SystemExit as e:
        if e.code not in (0, None):
            raise
    except Exception as e:  # noqa: BLE001
        # Post-training tails can fail in this image (no pdflatex); the
        # metrics JSONs are already on disk by then.
        import traceback

        print(f"reference {entry} tail failure tolerated: {type(e).__name__}: {e}")
        traceback.print_exc()
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)


def harvest(root: Path, experiment_glob: str, dst: Path) -> None:
    dst.mkdir(parents=True, exist_ok=True)
    hits = sorted(root.glob(experiment_glob))
    if not hits:
        raise FileNotFoundError(f"no outputs matching {experiment_glob} under {root}")
    out_dir = hits[-1]
    for name in ("epoch_metrics.json", "train_metrics.json",
                 "validation_metrics.json", "test_metrics.json"):
        matches = sorted(out_dir.rglob(name))
        if matches:
            shutil.copy(matches[-1], dst / name)
            print(f"harvested {matches[-1]} -> {dst / name}")
        else:
            print(f"WARNING: {name} not found under {out_dir}")


def harvest_monomodal_artifacts(root: Path, dst: Path) -> None:
    """Record the monomodal checkpoint/encoder artifact schema
    (train_monomodal.py:790-802): file names in the models dir plus the
    bare-encoder state-dict keys — the handoff contract train_multimodal's
    pretrained_encoders loading consumes."""
    hits = sorted(root.glob("experiments_output/*Audio*/models/1"))
    if not hits:
        hits = sorted(root.glob("experiments_output/*/models/1"))
    model_dir = hits[-1]
    files = sorted(p.name for p in model_dir.iterdir())
    enc = sorted(model_dir.glob("encoder_*_best.pth"))
    encoder_keys = []
    if enc:
        sd = torch.load(enc[-1], map_location="cpu", weights_only=True)
        encoder_keys = sorted(sd.keys())
    (dst / "artifacts.json").write_text(json.dumps(
        {"model_files": files, "encoder_state_dict_keys": encoder_keys},
        indent=2,
    ))
    print(f"harvested artifact schema -> {dst / 'artifacts.json'}")


def main() -> int:
    # argv selects which fixtures to regenerate (default: all). cmam needs
    # the multimodal run's best.pth, so it pulls multimodal in.
    only = set(sys.argv[1:]) or {"avmnist", "multimodal", "monomodal", "cmam"}
    if "cmam" in only:
        only.add("multimodal")

    install_shims()
    tmp = Path(tempfile.mkdtemp(prefix="ref_golden_"))
    print("workdir:", tmp)

    make_avmnist_data(tmp)
    make_mmimdb_data(tmp)

    if "avmnist" in only:
        av_cfg = tmp / "avmnist_tiny.yaml"
        write_tiny_config(AVMNIST_SRC, av_cfg, tmp)
        run_reference("train_avmnist.py", av_cfg, 1, tmp)
        harvest(tmp, "experiments_output/*/metrics/1",
                GOLDEN / "reference_avmnist")

    if "multimodal" in only:
        mm_cfg = tmp / "mmimdb_tiny.yaml"
        write_tiny_config(MMIMDB_SRC, mm_cfg, tmp)
        run_reference("train_multimodal.py", mm_cfg, 1, tmp)
        harvest(
            tmp, "experiments_output/mm_imdb*/metrics/1",
            GOLDEN / "reference_multimodal",
        )

    if "monomodal" in only:
        mono_cfg = tmp / "mono_tiny.yaml"
        write_tiny_config(MONO_SRC, mono_cfg, tmp)
        run_reference("train_monomodal.py", mono_cfg, 1, tmp, extra_args=())
        mono_dst = GOLDEN / "reference_monomodal"
        harvest(tmp, "experiments_output/*Audio*/metrics/1", mono_dst)
        harvest_monomodal_artifacts(tmp, mono_dst)

    if "cmam" in only:
        # CMAM trains against the tiny mmimdb run's best.pth (the reference
        # config's pretrained_path points at that experiment, resolved
        # relative to the workdir)
        cmam_cfg = tmp / "cmam_tiny.yaml"
        write_tiny_config(CMAM_SRC, cmam_cfg, tmp)
        run_reference("train_cmam.py", cmam_cfg, 1, tmp)
        harvest(
            tmp, "experiments_output/MM_IMDb_C_MAM*/metrics/1",
            GOLDEN / "reference_cmam",
        )
    print("golden fixtures written to", GOLDEN)
    return 0


if __name__ == "__main__":
    sys.exit(main())
