"""Real-format dataset loading tests against generated fixture files:
MOSI pickle, MM-IMDb HDF5, IEMOCAP multi-file HDF5, AVMNIST CSV + .pt."""

import pickle

import numpy as np
import pytest

from mmtpu.modalities import Modality


def test_mosi_pickle_roundtrip(tmp_path):
    from mmtpu.data.mosi import MOSI

    rng = np.random.default_rng(0)
    split = lambda n: {  # noqa: E731
        "audio": rng.normal(size=(n, 50, 5)).astype(np.float32),
        "vision": rng.normal(size=(n, 50, 20)).astype(np.float32),
        "text": rng.normal(size=(n, 50, 768)).astype(np.float32),
        "classification_labels": rng.integers(0, 3, n),
        "regression_labels": rng.uniform(-3, 3, n).astype(np.float32),
        "audio_lengths": rng.integers(5, 50, n),
        "vision_lengths": rng.integers(5, 50, n),
    }
    path = tmp_path / "aligned_50.pkl"
    with open(path, "wb") as f:
        pickle.dump({"train": split(20), "valid": split(8), "test": split(8)}, f)

    ds = MOSI(path, "train", labels_key="classification_labels")
    assert ds.num_samples == 20
    assert ds.arrays[Modality.AUDIO].shape == (20, 50, 5)
    assert ds.labels.dtype == np.int64
    assert set(ds.selected_patterns) == {"atv", "at", "av", "tv", "a", "t", "v"}
    assert ds.lengths[Modality.AUDIO].shape == (20,)

    reg = MOSI(path, "valid", labels_key="regression_labels")
    assert reg.labels.dtype == np.float32
    assert len(reg) == 8 * 7  # eval = samples × patterns


def test_mmimdb_h5(tmp_path):
    import h5py

    from mmtpu.data.mmimdb import MMIMDb

    n = 12
    rng = np.random.default_rng(0)
    path = tmp_path / "train.hdf5"
    with h5py.File(path, "w") as f:
        f["vgg_features"] = rng.normal(size=(n, 4096)).astype(np.float32)
        f["features"] = rng.normal(size=(n, 300)).astype(np.float32)
        f["genres"] = (rng.random((n, 23)) < 0.2).astype(np.float32)
        f["imdb_ids"] = np.arange(n)
    ds = MMIMDb(path, "train")
    assert ds.arrays[Modality.IMAGE].shape == (n, 4096)
    assert ds.labels.shape == (n, 23)
    assert set(ds.selected_patterns) == {"it", "i", "t"}


def test_iemocap_h5(tmp_path):
    import h5py

    from mmtpu.data.iemocap import IEMOCAP

    rng = np.random.default_rng(0)
    names = [f"Ses01_{i}" for i in range(10)]
    root = tmp_path
    for sub, fname, dim in (("A", "comparE.h5", 130), ("V", "denseface.h5", 342),
                            ("T", "bert_large.h5", 1024)):
        (root / sub).mkdir()
        with h5py.File(root / sub / fname, "w") as f:
            for nm in names:
                f[nm] = rng.normal(size=(rng.integers(4, 30), dim)).astype(np.float32)
    with h5py.File(root / "A" / "comparE_mean_std.h5", "w") as f:
        f["1/mean"] = np.zeros(130, np.float32)
        f["1/std"] = np.ones(130, np.float32)
    tgt = root / "target" / "1"
    tgt.mkdir(parents=True)
    onehot = np.eye(4, dtype=np.float32)[rng.integers(0, 4, 10)]
    np.save(tgt / "trn_label.npy", onehot)
    np.save(tgt / "trn_int2name.npy", np.array(names))

    ds = IEMOCAP(root, "trn", selected_patterns=["atv", "a"], cv_no=1, max_len=32)
    assert ds.num_samples == 10
    assert ds.arrays[Modality.AUDIO].shape[0] == 10
    assert ds.arrays[Modality.AUDIO].shape[2] == 130
    assert ds.lengths[Modality.AUDIO].max() <= 32
    assert ds.labels.max() <= 3


def test_avmnist_csv_with_pt_files(tmp_path):
    import csv

    import torch

    from mmtpu.data.avmnist import AVMNIST

    rng = np.random.default_rng(0)
    rows = []
    for i in range(6):
        spec = torch.from_numpy(rng.normal(size=(32, 94)).astype(np.float32))
        img = (rng.random((28, 28)) * 255).astype(np.uint8)
        sp = tmp_path / f"spec_{i}.pt"
        ip = tmp_path / f"img_{i}.pt"
        torch.save(spec, sp)
        torch.save(img, ip)
        rows.append((str(sp), str(ip), i % 10))
    index = tmp_path / "train.csv"
    with open(index, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["audio", "image", "label"])
        w.writerows(rows)

    ds = AVMNIST(index, "train")
    assert ds.arrays[Modality.AUDIO].shape == (6, 32, 94)
    assert ds.arrays[Modality.IMAGE].shape == (6, 28, 28, 1)
    # image pipeline: gist_earth LUT + PIL luma, values in [0, 1]
    img = ds.arrays[Modality.IMAGE]
    assert 0.0 <= img.min() and img.max() <= 1.0
    # mmap-able cache sidecars written next to the CSV
    assert list(tmp_path.glob("train.*.audio.npy"))
    assert list(tmp_path.glob("train.*.image.npy"))
    assert list(tmp_path.glob("train.*.labels.npy"))


def test_avmnist_legacy_npz_converts_to_mmap_sidecars(tmp_path):
    """A pre-round-3 whole-split .npz cache is converted to .npy sidecars
    on first touch and served memory-mapped thereafter."""
    import csv

    from mmtpu.data.avmnist import AVMNIST

    rng = np.random.default_rng(3)
    index = tmp_path / "train.csv"
    with open(index, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["audio", "image", "label"])
        w.writerows([("absent.pt", "absent.pt", i % 10) for i in range(5)])
    audio = rng.normal(size=(5, 32, 94)).astype(np.float32)
    image = rng.random((5, 28, 28, 1)).astype(np.float32)
    labels = np.arange(5, dtype=np.int64) % 10
    import hashlib

    h = hashlib.sha1(index.read_bytes())
    h.update(b"audio|image|label")  # cache identity includes the columns
    digest = h.hexdigest()[:12]
    np.savez(tmp_path / f"train.{digest}.npz",
             audio=audio, image=image, labels=labels)

    ds = AVMNIST(index, "train")
    assert isinstance(ds.arrays[Modality.AUDIO], np.memmap)
    np.testing.assert_array_equal(np.asarray(ds.arrays[Modality.AUDIO]), audio)
    np.testing.assert_array_equal(ds.labels, labels)
    assert (tmp_path / f"train.{digest}.audio.npy").exists()

    # second construction goes straight to the sidecars
    ds2 = AVMNIST(index, "train")
    assert isinstance(ds2.arrays[Modality.IMAGE], np.memmap)


def test_avmnist_cache_keyed_on_column_selection(tmp_path):
    """The .npy cache identity includes audio/image/labels column names —
    a cache built from the default columns must NOT be served to a
    construction requesting different columns (it would silently return
    the wrong arrays)."""
    from mmtpu.data.avmnist import AVMNIST

    a = AVMNIST.__new__(AVMNIST)
    a.data_fp = tmp_path / "x.csv"
    a.data_fp.write_text("h\n1\n")
    a._cache_cols = ("audio", "image", "label")
    b = AVMNIST.__new__(AVMNIST)
    b.data_fp = a.data_fp
    b._cache_cols = ("audio", "image", "alt_label")
    assert a._digest() != b._digest()
