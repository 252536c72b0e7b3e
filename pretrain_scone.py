#!/usr/bin/env python
"""SCONE pretraining CLI (analog of the reference's pretrain_scone_occ.py /
pretrain_scone_vis.py trainers).

Usage: python pretrain_scone.py occ --steps 100
       python pretrain_scone.py vis --steps 100 --cov-loss uncentered_l1
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["occ", "vis"])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-objects", type=int, default=4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--cov-loss", default="uncentered_l1",
                    choices=["kl_divergence", "l1", "uncentered_l1"])
    ap.add_argument("--out", default="weights/scone")
    args = ap.parse_args()

    from nextbestpath_tpu.utils.jaxcache import enable_cache

    enable_cache()

    from nextbestpath_tpu.train.pretrain_scone import (
        make_pretrain_sample, pretrain_scone_occ, pretrain_scone_vis)
    from nextbestpath_tpu.utils.checkpoint import save_checkpoint

    samples = [make_pretrain_sample(args.seed + i)
               for i in range(args.n_objects)]
    if args.which == "occ":
        model, variables, losses = pretrain_scone_occ(
            n_steps=args.steps, lr=args.lr, seed=args.seed, samples=samples,
            batch=args.batch)
        save_checkpoint(os.path.join(args.out, "scone_occ.ckpt"), variables)
    else:
        model, variables, losses = pretrain_scone_vis(
            n_steps=args.steps, lr=args.lr, seed=args.seed,
            cov_loss=args.cov_loss, samples=samples, batch=args.batch)
        save_checkpoint(os.path.join(args.out, "scone_vis.ckpt"), variables)
    print(f"final loss: {losses[-1]:.4f} (first {losses[0]:.4f})")


if __name__ == "__main__":
    main()
