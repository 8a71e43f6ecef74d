#!/usr/bin/env python
"""Measure the PyTorch-CPU reference throughput → BASELINE_MEASURED.json.

The reference publishes no benchmark numbers (BASELINE.md), so the baseline
is established by timing a PyTorch model with the reference's exact
architecture (models/unet3d.py:160-296: 4-level 3D U-Net, base 64, BN+ReLU
double convs, ConvTranspose ups) on the reference's headline workload
(batch x 5 x 128^3, fwd + Dice loss + bwd + Adam step) on CPU — the
hardware the reference actually runs on in this environment
("cuda if available else cpu", utils/trainer.py:59 → cpu here).

Usage: python tools/measure_torch_baseline.py [--size 128] [--batch 1]
                                              [--steps 2]
"""

import argparse
import json
import os
import time

import torch
import torch.nn as nn


def double_conv(cin, cout):
    return nn.Sequential(
        nn.Conv3d(cin, cout, 3, padding=1),
        nn.BatchNorm3d(cout),
        nn.ReLU(inplace=True),
        nn.Conv3d(cout, cout, 3, padding=1),
        nn.BatchNorm3d(cout),
        nn.ReLU(inplace=True),
    )


class TorchUNet3D(nn.Module):
    """Reference-architecture 3D U-Net (torch), for baseline timing only."""

    def __init__(self, n_mod=5, n_classes=1, f=64):
        super().__init__()
        self.inc = double_conv(n_mod, f)
        self.downs = nn.ModuleList(
            [double_conv(f * 2**i, f * 2 ** (i + 1)) for i in range(4)]
        )
        self.pool = nn.MaxPool3d(2)
        self.ups = nn.ModuleList(
            [
                nn.ConvTranspose3d(f * 2 ** (4 - i), f * 2 ** (3 - i), 2, stride=2)
                for i in range(4)
            ]
        )
        self.up_convs = nn.ModuleList(
            [double_conv(f * 2 ** (4 - i), f * 2 ** (3 - i)) for i in range(4)]
        )
        self.outc = nn.Conv3d(f, n_classes, 1)

    def forward(self, x):
        skips = [self.inc(x)]
        for down in self.downs:
            skips.append(down(self.pool(skips[-1])))
        x = skips[-1]
        for i, (up, conv) in enumerate(zip(self.ups, self.up_convs)):
            x = up(x)
            x = conv(torch.cat([skips[3 - i], x], dim=1))
        return self.outc(x)


def dice_loss(logits, target, smooth=1.0):
    p = torch.sigmoid(logits).reshape(-1)
    t = target.reshape(-1)
    inter = (p * t).sum()
    return 1 - (2 * inter + smooth) / (p.sum() + t.sum() + smooth)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--warmup", type=int, default=1)
    args = ap.parse_args()

    torch.manual_seed(0)
    model = TorchUNet3D()
    n_params = sum(p.numel() for p in model.parameters())
    opt = torch.optim.Adam(model.parameters(), lr=1e-4, weight_decay=1e-5)
    x = torch.randn(args.batch, 5, args.size, args.size, args.size)
    y = (torch.rand(args.batch, 1, args.size, args.size, args.size) > 0.9).float()

    def one_step():
        opt.zero_grad()
        loss = dice_loss(model(x), y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        return float(loss)

    for _ in range(args.warmup):
        one_step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        one_step()
    dt = time.perf_counter() - t0

    vols_per_sec = args.batch * args.steps / dt
    out = {
        "torch_cpu_volumes_per_sec": vols_per_sec,
        "seconds_per_step": dt / args.steps,
        "batch": args.batch,
        "size": args.size,
        "steps": args.steps,
        "n_params": n_params,
        "torch_version": torch.__version__,
        "torch_threads": torch.get_num_threads(),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_MEASURED.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
