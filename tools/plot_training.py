#!/usr/bin/env python
"""Render training_log/nbp_loss.json into data/training_curves.png:
train/val loss per outer epoch + held-out eval AUC per difficulty."""

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main(log_path="training_log/nbp_loss.json",
         out_path="data/training_curves.png"):
    with open(log_path) as f:
        log = json.load(f)

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    ax = axes[0]
    ax.plot(log["train"], label="train")
    ax.plot(log["val"], label="val")
    ax.set_yscale("log")
    ax.set_xlabel("outer epoch (from first trained)")
    ax.set_ylabel("loss")
    ax.set_title("NBP loss")
    ax.legend()

    ax = axes[1]
    cov = np.asarray(log["coverage_after_trajectory"])
    n_scenes = 8
    if len(cov) >= n_scenes:
        per_epoch = cov[: len(cov) // n_scenes * n_scenes].reshape(
            -1, n_scenes)
        ax.plot(per_epoch.mean(axis=1), label="mean over scenes")
        ax.plot(per_epoch.max(axis=1), "--", label="best scene")
    ax.set_xlabel("epoch")
    ax.set_ylabel("final coverage (collection rollout)")
    ax.set_title("Collection coverage")
    ax.legend()

    ax = axes[2]
    evals = log.get("eval_auc", [])
    if evals:
        keys = sorted(evals[0]["auc"].keys())
        diffs = sorted({k.split("_")[1] for k in keys})
        xs = [e["epoch"] for e in evals]
        for d in diffs:
            ys = [np.mean([v for k, v in e["auc"].items()
                           if f"_{d}_" in k]) for e in evals]
            ax.plot(xs, ys, marker="o", label=d)
        ax.set_xlabel("epoch")
        ax.set_ylabel("held-out coverage AUC @ 40 poses")
        ax.set_title("Held-out eval")
        ax.legend()

    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    fig.savefig(out_path, dpi=110)
    print("wrote", out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
