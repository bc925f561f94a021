"""Measure the PyTorch-CPU baselines for bench.py's vs_baseline ratios.

Default mode builds a torch model equivalent to the reference's north-star
AVMNIST configuration (ResNet18 audio encoder hidden 64 + ResNet34 image
encoder hidden 128 + concat fusion MLP, batch 128 — see BASELINE.md) and
times train steps on CPU. The measured samples/sec goes into bench.py as
the denominator constant.

`--mosi` instead times the reference's MOSI UttFusion step at its published
shapes (LSTM(5->64) audio + LSTM(20->64) video + TextCNN(768, 128ch,
k=3/4/5 -> 64) text + FcClassifier(192->[192,64,32]->3), batch 32, T=50 —
models/msa/utt_fusion.py + configs/mosi/centralised/
utt_fusion_base_training.yaml). Its ms/step feeds bench.py's
mosi_vs_baseline.

Usage: python scripts/torch_cpu_baseline.py [steps] [--mosi]
"""

import sys
import time

import torch
import torch.nn as nn


class Block(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.c1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.b1 = nn.BatchNorm2d(cout)
        self.c2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.b2 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idn = self.down(x) if self.down else x
        out = torch.relu(self.b1(self.c1(x)))
        out = self.b2(self.c2(out))
        return torch.relu(out + idn)


class ResNet(nn.Module):
    def __init__(self, layers, hidden_dim):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(1, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
            nn.ReLU(), nn.MaxPool2d(3, 2, 1),
        )
        stages, cin = [], 64
        for s, (cout, n) in enumerate(zip((64, 128, 256, 512), layers)):
            for i in range(n):
                stages.append(Block(cin, cout, 2 if (s > 0 and i == 0) else 1))
                cin = cout
        self.stages = nn.Sequential(*stages)
        self.fc = nn.Linear(512, hidden_dim)

    def forward(self, x):
        x = self.stages(self.stem(x))
        x = x.mean(dim=(2, 3))
        return self.fc(x)


class Fusion(nn.Module):
    def __init__(self):
        super().__init__()
        self.audio = ResNet([2, 2, 2, 2], 64)
        self.image = ResNet([3, 4, 6, 3], 128)
        self.net = nn.Sequential(
            nn.Linear(64 + 128, 128), nn.ReLU(), nn.Dropout(0.5),
            nn.Linear(128, 64), nn.ReLU(), nn.Linear(64, 10),
        )

    def forward(self, a, i):
        return self.net(torch.cat([self.audio(a), self.image(i)], dim=1))


class UttFusion(nn.Module):
    """Reference UttFusionModel shape-equivalent (utt_fusion.py:25-142):
    last-hidden LSTM encoders, 3-kernel TextCNN, 3-layer FC classifier."""

    def __init__(self):
        super().__init__()
        self.netA = nn.LSTM(5, 64, batch_first=True)
        self.netV = nn.LSTM(20, 64, batch_first=True)
        self.convs = nn.ModuleList(
            [nn.Conv2d(1, 128, (k, 768)) for k in (3, 4, 5)]
        )
        self.text_fc = nn.Sequential(nn.Linear(3 * 128, 64), nn.ReLU())
        self.netC = nn.Sequential(
            nn.Linear(192, 192), nn.ReLU(), nn.Dropout(0.5),
            nn.Linear(192, 64), nn.ReLU(), nn.Dropout(0.5),
            nn.Linear(64, 32), nn.ReLU(), nn.Dropout(0.5),
            nn.Linear(32, 3),
        )

    def forward(self, a, v, t):
        _, (ha, _) = self.netA(a)
        _, (hv, _) = self.netV(v)
        x = t.unsqueeze(1)
        feats = [torch.relu(c(x)).squeeze(3).max(dim=2).values for c in self.convs]
        ht = self.text_fc(torch.cat(feats, dim=1))
        return self.netC(torch.cat([ha[-1], hv[-1], ht], dim=1))


def main_mosi(steps: int) -> None:
    torch.manual_seed(0)
    model = UttFusion()
    opt = torch.optim.Adam(model.parameters(), lr=2e-3)
    loss_fn = nn.CrossEntropyLoss()
    B, T = 32, 50
    a = torch.randn(B, T, 5)
    v = torch.randn(B, T, 20)
    t = torch.randn(B, T, 768)
    y = torch.randint(0, 3, (B,))
    model.train()
    for _ in range(5):  # warmup
        opt.zero_grad(); loss_fn(model(a, v, t), y).backward(); opt.step()
    t0 = time.time()
    for _ in range(steps):
        opt.zero_grad()
        loss_fn(model(a, v, t), y).backward()
        opt.step()
    dt = time.time() - t0
    print(
        f"torch-cpu mosi uttfusion: {steps} steps in {dt:.2f}s -> "
        f"{1000 * dt / steps:.2f} ms/step ({steps * B / dt:.1f} samples/sec)"
    )


class MonoHead(nn.Module):
    """Reference MonomodalEncoder equivalent (train_monomodal.py:64-95):
    encoder + Linear classification head."""

    def __init__(self, encoder, hidden, n_classes=10):
        super().__init__()
        self.encoder = encoder
        self.head = nn.Linear(hidden, n_classes)

    def forward(self, x):
        return self.head(self.encoder(x))


def _torch_epochs_to_99(model, a, i, y, B, max_epochs, lr=5e-4, wd=1e-4,
                        mono=None, acc_target=0.99):
    """Train with the reference regime (Adam 5e-4/wd 1e-4, shuffled epochs,
    during-epoch train accuracy — train_multimodal.py:438-496) and return
    (first epoch reaching `acc_target` train acc or None, first-epoch mean
    loss). acc_target=None runs every epoch (mono pretraining's fixed
    budget, matching bench._run_epochs with acc_target=None)."""
    import numpy as np

    opt = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=wd)
    loss_fn = nn.CrossEntropyLoss()
    n = y.shape[0]
    gen = np.random.default_rng(0)
    reached, ep1 = None, None
    model.train()
    for epoch in range(1, max_epochs + 1):
        perm = gen.permutation(n)[: (n // B) * B]
        correct, loss_sum, steps = 0, 0.0, 0
        for s in range(n // B):
            idx = perm[s * B : (s + 1) * B]
            xa, xi, yy = a[idx], i[idx], y[idx]
            opt.zero_grad()
            out = model(xa) if mono == "audio" else (
                model(xi) if mono == "image" else model(xa, xi))
            loss = loss_fn(out, yy)
            loss.backward()
            opt.step()
            correct += int((out.argmax(1) == yy).sum())
            loss_sum += float(loss.detach())
            steps += 1
        if epoch == 1:
            ep1 = loss_sum / steps
        acc = correct / (steps * B)
        print(f"  epoch {epoch}: train_acc={acc:.4f}", flush=True)
        if acc_target is not None and reached is None and acc >= acc_target:
            reached = epoch
            break
    return reached, ep1


def main_convergence(n_samples: int, max_epochs: int = 15) -> None:
    """Controlled ablation for the epochs-to-99 gap (ROUND5): train the
    reference-equivalent torch model on the SAME mmtpu-decoded AVMNIST
    subset bench.py's convergence section uses, so any epochs-to-99
    difference between frameworks is framework-born, not data-born.
    Subsampling uses stride slicing over the fixed CSV order — identical
    on the JAX side (bench.convergence_epochs n_samples)."""
    import json
    import os

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mmtpu.data.avmnist import AVMNIST
    from mmtpu.modalities import Modality

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds = AVMNIST(os.path.join(root, "DATA", "avmnist", "train_subset.csv"),
                 split="train", selected_patterns=["ai"])
    audio = np.asarray(ds.arrays[Modality.AUDIO], np.float32)
    image = np.asarray(ds.arrays[Modality.IMAGE], np.float32)
    labels = np.asarray(ds.labels, np.int64)
    n_total = labels.shape[0]
    if n_samples and n_samples < n_total:
        stride = n_total // n_samples
        sel = np.arange(0, n_total, stride)[:n_samples]
        audio, image, labels = audio[sel], image[sel], labels[sel]
    a = torch.from_numpy(audio).unsqueeze(1)          # (N,1,32,94)
    i = torch.from_numpy(image).permute(0, 3, 1, 2)   # (N,1,28,28)
    y = torch.from_numpy(labels)
    B = 128
    out = {"n_samples": int(y.shape[0]), "batch": B}

    torch.manual_seed(0)
    print("scratch arm:", flush=True)
    model = Fusion()
    out["epochs_to_99_scratch"], out["first_epoch_loss_scratch"] = (
        _torch_epochs_to_99(model, a, i, y, B, max_epochs))

    # monomodal pretrain (reference train_monomodal.py flow, 4 epochs to
    # mirror bench.convergence_epochs pretrain_epochs=4)
    torch.manual_seed(0)
    model = Fusion()
    for mod, enc, hidden in (("audio", model.audio, 64),
                             ("image", model.image, 128)):
        print(f"mono pretrain {mod}:", flush=True)
        # fixed 4-epoch budget, no early exit — exactly bench.py's
        # convergence_epochs pretrain (_run_epochs acc_target=None)
        _torch_epochs_to_99(MonoHead(enc, hidden), a, i, y, B, 4, mono=mod,
                            acc_target=None)
    print("pretrained arm:", flush=True)
    out["epochs_to_99_pretrained"], out["first_epoch_loss_pretrained"] = (
        _torch_epochs_to_99(model, a, i, y, B, max_epochs))
    print(json.dumps(out))


def main():
    args = [a for a in sys.argv[1:]
            if a not in ("--mosi", "--convergence")]
    steps = int(args[0]) if args else 20
    if "--mosi" in sys.argv:
        main_mosi(steps)
        return
    if "--convergence" in sys.argv:
        main_convergence(n_samples=steps if args else 6000)
        return
    torch.manual_seed(0)
    model = Fusion()
    opt = torch.optim.Adam(model.parameters(), lr=5e-4, weight_decay=1e-4)
    loss_fn = nn.CrossEntropyLoss()
    B = 128
    a = torch.randn(B, 1, 32, 94)
    i = torch.randn(B, 1, 28, 28)
    y = torch.randint(0, 10, (B,))

    model.train()
    for _ in range(3):  # warmup
        opt.zero_grad(); loss_fn(model(a, i), y).backward(); opt.step()
    t0 = time.time()
    for _ in range(steps):
        opt.zero_grad()
        loss = loss_fn(model(a, i), y)
        loss.backward()
        opt.step()
    dt = time.time() - t0
    rate = steps * B / dt
    print(f"torch-cpu: {steps} steps in {dt:.2f}s -> {rate:.1f} samples/sec")


if __name__ == "__main__":
    main()
