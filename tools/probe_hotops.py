#!/usr/bin/env python
"""Microbenchmark the scan-step hot ops on the current backend.

Times (median of --iters):
  unet      : NBP batch-1 eval forward, folded vs unfolded BN, bf16
  scatter   : binned_count_imgs over a 2M buffer, full vs count-bounded
  topk      : the backproject_sample pixel sampler (top_k 6144 of 116736)
  bfs       : fixpoint BFS + early-exit extract on a 40x40 lattice
  coverage  : coverage_percentage 20k GT x 2M buffer (fast_sampling)

Run on TPU (ambient env):  python tools/probe_hotops.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nextbestpath_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()


def bench(fn, *args, iters=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--ops", default="unet,scatter,topk,bfs,coverage")
    args = ap.parse_args()
    ops = set(args.ops.split(","))

    import jax
    import jax.numpy as jnp

    print(f"# backend {jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)

    if "unet" in ops:
        from nextbestpath_tpu.models import NBP
        from nextbestpath_tpu.models.fold import fold_model_and_variables

        model = NBP(dtype=jnp.bfloat16)
        variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
            key, jnp.zeros((1, 256, 256, 5)))
        x = jax.random.normal(key, (1, 256, 256, 5))
        f = jax.jit(lambda v, x: model.apply(v, x, train=False))
        t = bench(f, variables, x, iters=args.iters)
        print(f"unet unfolded     : {t * 1e3:8.2f} ms", flush=True)
        fm, fv = fold_model_and_variables(model, variables)
        ff = jax.jit(lambda v, x: fm.apply(v, x, train=False))
        t = bench(ff, fv, x, iters=args.iters)
        print(f"unet folded       : {t * 1e3:8.2f} ms", flush=True)

    if "scatter" in ops:
        from nextbestpath_tpu.ops.scatter2d import binned_count_imgs, height_bins

        n = 2_000_000
        pts = jax.random.uniform(key, (n, 3), minval=-35.0, maxval=35.0)
        pts = pts.at[:, 1].set(jax.random.uniform(key, (n,), minval=0.0,
                                                  maxval=9.0))
        bins = height_bins(jnp.float32(0.0), jnp.float32(9.0), 4)
        cam = jnp.asarray([0.0, 3.3, 0.0])
        for cnt in (200_000, 1_000_000, 2_000_000):
            valid = jnp.arange(n) < cnt
            f_full = jax.jit(lambda p, v: binned_count_imgs(
                p, v, cam, bins, 4, 256, (-40.0, 40.0)))
            f_cnt = jax.jit(lambda p, v, c: binned_count_imgs(
                p, v, cam, bins, 4, 256, (-40.0, 40.0), count=c))
            t1 = bench(f_full, pts, valid, iters=args.iters)
            t2 = bench(f_cnt, pts, valid, jnp.int32(cnt), iters=args.iters)
            print(f"scatter full      : {t1 * 1e3:8.2f} ms (count={cnt})",
                  flush=True)
            print(f"scatter bounded   : {t2 * 1e3:8.2f} ms (count={cnt})",
                  flush=True)

    if "topk" in ops:
        n_px, n_slots = 256 * 456, 6144
        scores = jax.random.uniform(key, (n_px,))

        f = jax.jit(lambda s: jax.lax.top_k(-s, n_slots)[1])
        t = bench(f, scores, iters=args.iters)
        print(f"topk 6144/116736  : {t * 1e3:8.2f} ms", flush=True)
        f2 = jax.jit(lambda s: jnp.argsort(s)[:n_slots])
        t = bench(f2, scores, iters=args.iters)
        print(f"argsort variant   : {t * 1e3:8.2f} ms", flush=True)

        from nextbestpath_tpu.geometry.cameras import CameraIntrinsics
        from nextbestpath_tpu.sim.sensor import backproject_sample

        intr = CameraIntrinsics(image_height=256, image_width=456)
        zbuf = jax.random.uniform(key, (256, 456), minval=2.0, maxval=60.0)
        R, T = jnp.eye(3), jnp.zeros(3)
        for strat in (False, True):
            f3 = jax.jit(lambda z, k: backproject_sample(
                z, R, T, intr, k, n_slots, stratified=strat).points)
            t = bench(f3, zbuf, key, iters=args.iters)
            name = "strat" if strat else "topk "
            print(f"backproject {name}  : {t * 1e3:8.2f} ms", flush=True)

    if "bfs" in ops:
        from nextbestpath_tpu.planning.grid_paths import (bfs_distance_field,
                                                          extract_path)

        L = H = 40
        blocked = jax.random.uniform(key, (4, L, H)) < 0.3
        start = jnp.asarray([0, 0])
        f = jax.jit(lambda b, s: bfs_distance_field(b, s, L, H))
        t = bench(f, blocked, start, iters=args.iters)
        print(f"bfs field 40x40   : {t * 1e3:8.2f} ms", flush=True)
        dist = f(blocked, start)
        g = jax.jit(lambda d, b: extract_path(d, b, jnp.asarray([20, 20]),
                                              L, H))
        t = bench(g, dist, blocked, iters=args.iters)
        print(f"extract_path      : {t * 1e3:8.2f} ms", flush=True)

    if "coverage" in ops:
        from nextbestpath_tpu.ops.coverage import coverage_percentage

        gt = jax.random.uniform(key, (20_000, 3), minval=-35.0, maxval=35.0)
        buf = jax.random.uniform(key, (2_000_000, 3), minval=-35.0,
                                 maxval=35.0)
        f = jax.jit(lambda g, b, c, k: coverage_percentage(
            g, b, c, k, fast_sampling=True))
        t = bench(f, gt, buf, jnp.int32(1_500_000), key, iters=args.iters)
        print(f"coverage metric   : {t * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
