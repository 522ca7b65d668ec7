"""Measure the row-sharded cohort path (parallel/cohort.ShardedCohort).

Reports, at a configurable scale on the available mesh (run with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu for the
8-virtual-device layout check, or on real chips when a pod is attached):

  * per-device HBM bytes of the sharded storage vs a replica;
  * wall time of one epoch relayout (`ensure`, the all_to_all permutation)
    vs one fused block epoch, so the amortized overhead is explicit;
  * v5e capacity table: largest cohort per design at 16 GB/chip HBM.

Usage: python benchmarks/cohort_shard_bench.py [--n 100000] [--t 354]
       [--batch 256] [--epochs 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--t", type=int, default=48)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # sitecustomize imports jax before env vars are read — pin the
        # backend explicitly so the virtual-device layout check works
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from deep_interpolation_clustering_tpu import Config
    from deep_interpolation_clustering_tpu.models import init_net
    from deep_interpolation_clustering_tpu.parallel import (
        ShardedCohort,
        make_mesh,
        replicate_tree,
    )
    from deep_interpolation_clustering_tpu.train import make_optimizer
    from deep_interpolation_clustering_tpu.train.steps import (
        make_train_epoch_blocks,
    )

    n, t, b = args.n, args.t, args.batch
    c = 6
    d = len(jax.devices())
    mesh = make_mesh(d)
    print(f"devices: {d} x {jax.devices()[0].platform}; "
          f"cohort n={n} C={c} T={t} B={b}")

    rng = np.random.RandomState(0)
    counts = rng.randint(4, t + 1, size=(n, c))
    mask = (np.arange(t)[None, None, :] < counts[:, :, None]).astype(np.float32)
    arrays = {
        "ob": (rng.rand(n, c, t).astype(np.float32) * 5 - 2.5) * mask,
        "padding_mask": mask,
        "timestamp": np.sort(rng.rand(n, c, t).astype(np.float32) * 6, -1) * mask,
        "ae_mask": mask * (rng.rand(n, c, t) > 0.2).astype(np.float32),
        "future_vital": rng.rand(n, c).astype(np.float32),
        "future_vital_mask": (rng.rand(n, c) < 0.9).astype(np.float32),
    }
    total = sum(v.nbytes for v in arrays.values())

    t0 = time.perf_counter()
    cohort = ShardedCohort(mesh, arrays, b)
    jax.block_until_ready(list(cohort.data3.values()))
    t_up = time.perf_counter() - t0
    per_dev = cohort.nbytes_per_device()
    print(f"planes total {total/2**20:.0f} MiB; sharded {per_dev/2**20:.1f} "
          f"MiB/device (replicated would be {total/2**20:.0f} MiB/device, "
          f"{total/per_dev:.1f}x); upload {t_up:.2f} s")

    cfg = Config(batch_size=b, num_timestamps=t)
    params, state = init_net(jax.random.PRNGKey(1), cfg)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    params = replicate_tree(mesh, params)
    state = replicate_tree(mesh, state)
    opt_state = replicate_tree(mesh, opt_state)
    epoch_fn = make_train_epoch_blocks(cfg, opt, denoise=False)
    n_full = n // b
    ks = jnp.arange(n_full, dtype=jnp.int32)
    key = jax.random.key(2)

    # warm both programs
    order = np.arange(n)
    rng.shuffle(order)
    cohort.ensure(cohort.epoch_order(order))
    jax.block_until_ready(list(cohort.data3.values()))
    params, state, opt_state, losses = epoch_fn(
        params, state, opt_state, cohort.data3, ks, key
    )
    jax.block_until_ready(losses["loss"])

    re_times, ep_times = [], []
    for e in range(args.epochs):
        order = np.arange(n)
        rng.shuffle(order)
        t0 = time.perf_counter()
        cohort.ensure(cohort.epoch_order(order))
        jax.block_until_ready(list(cohort.data3.values()))
        re_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        params, state, opt_state, losses = epoch_fn(
            params, state, opt_state, cohort.data3, ks,
            jax.random.fold_in(key, e),
        )
        jax.block_until_ready(losses["loss"])
        ep_times.append(time.perf_counter() - t0)
    re_s, ep_s = float(np.median(re_times)), float(np.median(ep_times))
    print(f"epoch relayout {re_s*1e3:.0f} ms (plan+all_to_all+scatter); "
          f"fused block epoch {ep_s*1e3:.0f} ms ({n_full} steps) — "
          f"relayout overhead {100*re_s/(re_s+ep_s):.1f}% of the epoch")

    # v5e capacity table (16 GiB HBM/chip, planes-only, D=8)
    bytes_per_row_t354 = 4 * c * (4 * 354 + 2)  # ob/mask/ts/ae planes + future pair
    hbm = 16 * 2**30
    rep_max = hbm // bytes_per_row_t354
    shd_max = 8 * hbm // bytes_per_row_t354
    print(f"v5e-8 capacity at T=354 (planes only, 16 GiB/chip): "
          f"replicated <= {rep_max/1e6:.1f}M encounters/chip-bound, "
          f"sharded <= {shd_max/1e6:.1f}M (8x)")


if __name__ == "__main__":
    main()
