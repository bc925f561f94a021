"""Data pipeline tests: masks, schedules, fixed-shape batching, eval product."""

import numpy as np
import pytest

from mmtpu.data.avmnist import SyntheticAVMNIST
from mmtpu.data.loader import BatchLoader
from mmtpu.modalities import Modality, create_missing_mask


def make_ds(split="train", n=100, patterns=None, missing=None, seed=0):
    return SyntheticAVMNIST(
        split=split,
        num_samples=n,
        selected_patterns=patterns,
        missing_patterns=missing,
        seed=seed,
    )


class TestMasks:
    def test_create_missing_mask_probs(self):
        rng = np.random.default_rng(0)
        m = create_missing_mask(2, 10000, [1.0, 0.0], rng)
        assert m[:, 0].all() and not m[:, 1].any()
        m = create_missing_mask(1, 100000, [0.8], rng)
        assert abs(m.mean() - 0.8) < 0.01

    def test_masks_deterministic_per_seed(self):
        a, b = make_ds(seed=7), make_ds(seed=7)
        for p in a.masks:
            for m in a.masks[p]:
                np.testing.assert_array_equal(a.masks[p][m], b.masks[p][m])

    def test_absent_modality_always_masked(self):
        ds = make_ds(patterns=["a"])
        assert not ds.masks["a"][Modality.IMAGE].any()
        assert ds.masks["a"][Modality.AUDIO].all()

    def test_selected_pattern_without_mask_probs_fails_at_init(self):
        """A selected pattern with no missing_patterns entry must raise at
        construction, not as a KeyError deep in batch assembly."""
        with pytest.raises(ValueError, match="no entry in missing_patterns"):
            make_ds(
                patterns=["ai", "a"],
                missing={"ai": {Modality.AUDIO: 1.0, Modality.IMAGE: 1.0}},
            )

    def test_mask_stack_cache_invalidated_on_reinit(self):
        missing = {"ai": {Modality.AUDIO: 0.5, Modality.IMAGE: 0.5}}
        ds = make_ds(patterns=["ai"], missing=missing, seed=1)
        before = ds.mask_stack(Modality.AUDIO).copy()
        ds.seed = 2
        ds.initialise_missing_masks()
        after = ds.mask_stack(Modality.AUDIO)
        expected = np.stack(
            [ds.masks[p][Modality.AUDIO] for p in ds.selected_patterns], axis=0
        )
        np.testing.assert_array_equal(after, expected.astype(after.dtype))
        assert not np.array_equal(before, after)  # stale stack not served


class TestLoader:
    def test_eval_length_is_samples_times_patterns(self):
        ds = make_ds(split="valid", n=50, patterns=["ai", "a", "i"])
        assert len(ds) == 150
        loader = BatchLoader(ds, batch_size=16)
        batches = list(loader)
        total_real = sum(int(b["sample_mask"].sum()) for b in batches)
        assert total_real == 150

    def test_eval_pattern_major_blocks(self):
        ds = make_ds(split="valid", n=10, patterns=["ai", "a"])
        loader = BatchLoader(ds, batch_size=10, prefetch=0)
        batches = list(loader)
        assert [b["pattern_id"][0] for b in batches] == [0, 1]

    def test_fixed_shapes_with_padding(self):
        ds = make_ds(split="train", n=70)
        loader = BatchLoader(ds, batch_size=32, prefetch=0)
        batches = list(loader)
        assert len(batches) == 3
        for b in batches:
            assert b["audio"].shape == (32, 32, 94)
            assert b["image"].shape == (32, 28, 28, 1)
            assert b["labels"].shape == (32,)
        assert batches[-1]["sample_mask"].sum() == 70 - 64

    def test_train_shuffle_seeded(self):
        ds = make_ds(split="train", n=64)
        l1 = BatchLoader(ds, batch_size=32, shuffle=True, seed=3, prefetch=0)
        l2 = BatchLoader(ds, batch_size=32, shuffle=True, seed=3, prefetch=0)
        b1, b2 = next(iter(l1)), next(iter(l2))
        np.testing.assert_array_equal(b1["labels"], b2["labels"])

    def test_mask_vector_matches_pattern(self):
        ds = make_ds(split="valid", n=20, patterns=["a", "i"])
        loader = BatchLoader(ds, batch_size=20, prefetch=0)
        batches = list(loader)
        # pattern 'a': audio kept, image masked
        assert batches[0]["audio_mask"].all()
        assert not batches[0]["image_mask"].any()
        assert not batches[1]["audio_mask"].any()
        assert batches[1]["image_mask"].all()

    def test_drop_last(self):
        ds = make_ds(split="train", n=70)
        loader = BatchLoader(ds, batch_size=32, drop_last=True, prefetch=0)
        assert len(list(loader)) == 2

    def test_prefetch_slow_consumer_terminates(self):
        # Regression: with a consumer slower than the worker the queue is
        # full when the worker exits; a dropped end-of-epoch sentinel
        # deadlocks the consumer on q.get() forever.
        import time

        ds = make_ds(split="train", n=64)
        loader = BatchLoader(ds, batch_size=8, prefetch=2)
        seen = 0
        start = time.monotonic()
        for _ in loader:
            time.sleep(0.05)  # slower than batch production
            seen += 1
            assert time.monotonic() - start < 30
        assert seen == 8

    def test_prefetch_matches_sync_iteration(self):
        ds = make_ds(split="valid", n=30, patterns=["ai", "a"])
        sync = list(BatchLoader(ds, batch_size=16, prefetch=0))
        pre = list(BatchLoader(ds, batch_size=16, prefetch=3))
        assert len(sync) == len(pre)
        for a, b in zip(sync, pre):
            np.testing.assert_array_equal(a["labels"], b["labels"])
            np.testing.assert_array_equal(a["pattern_id"], b["pattern_id"])

    def test_prefetch_worker_error_propagates(self):
        ds = make_ds(split="train", n=32)
        loader = BatchLoader(ds, batch_size=8, prefetch=2)
        class Boom:
            shape = (32,)

            def __getitem__(self, idx):
                raise RuntimeError("boom")

        loader.dataset.labels = Boom()  # force an error inside the worker
        with pytest.raises(RuntimeError, match="boom"):
            list(loader)
