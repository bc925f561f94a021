"""Generate the AVMNIST train/validation/test index CSVs.

The reference ships the raw assets (30k spectrograms `{digit}_{speaker}_{rep}.pt`,
70k MNIST images `{i}_{i}_{label}.pt`, SURVEY.md §1) but NOT the CSV index
files its configs point at (`$EXP_PATH/DATA/avmnist/train_subset.csv`,
columns audio/image/label). This script synthesizes them:

- spectrograms split 80/10/10 by a seeded shuffle (stratified per digit),
- each spectrogram is paired with a same-digit MNIST image; images are
  sampled without replacement within a split so pairs are unique,
- output: <out>/train_subset.csv, validation_subset.csv, test_subset.csv.

Usage:
  python scripts/make_avmnist_index.py \
      --assets /root/reference/MML_Suite/AVMNIST/dataset \
      --out $EXP_PATH/DATA/avmnist [--seed 0]
"""

from __future__ import annotations

import argparse
import csv
import random
from collections import defaultdict
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--assets", default="/root/reference/MML_Suite/AVMNIST/dataset")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--train-frac", type=float, default=0.8)
    ap.add_argument("--valid-frac", type=float, default=0.1)
    args = ap.parse_args()

    assets = Path(args.assets)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rng = random.Random(args.seed)

    specs_by_digit = defaultdict(list)
    for p in sorted((assets / "spectrograms").glob("*.pt")):
        digit = int(p.name.split("_")[0])
        specs_by_digit[digit].append(p)
    imgs_by_digit = defaultdict(list)
    for p in sorted((assets / "images").glob("*.pt")):
        digit = int(p.stem.split("_")[-1])
        imgs_by_digit[digit].append(p)

    splits = {"train": [], "validation": [], "test": []}
    for digit in sorted(specs_by_digit):
        specs = list(specs_by_digit[digit])
        imgs = list(imgs_by_digit[digit])
        rng.shuffle(specs)
        rng.shuffle(imgs)
        n = len(specs)
        n_train = int(n * args.train_frac)
        n_valid = int(n * args.valid_frac)
        chunks = {
            "train": specs[:n_train],
            "validation": specs[n_train : n_train + n_valid],
            "test": specs[n_train + n_valid :],
        }
        img_iter = iter(imgs)
        for split, chunk in chunks.items():
            for spec in chunk:
                img = next(img_iter)
                splits[split].append((str(spec), str(img), digit))

    for split, rows in splits.items():
        rng.shuffle(rows)
        path = out / f"{split}_subset.csv"
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["audio", "image", "label"])
            w.writerows(rows)
        print(f"{path}: {len(rows)} rows")


if __name__ == "__main__":
    main()
