#!/usr/bin/env python
"""Benchmark: GATv2 full-graph training throughput on the current device.

Measures the reference's headline configuration (README.md:106-132 —
Citeseer 3-layer, heads 4,1,1, outdims 64,32,16, Adam lr=0.01) on a
Citeseer-shaped graph (N=3327, E=4732, F=3703, C=6) and reports:

  - epoch_ms: wall-clock per training epoch (fwd+bwd+update, block_until_ready)
  - edges_per_s: E * layers / epoch time (per chip)
  - vs_baseline: reference epoch time (~6367 ms on its example GPU,
    README.md:129-131) / our epoch time — the speedup factor.

Prints ONE JSON line. Extra configs can be benchmarked with --config.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


REFERENCE_EPOCH_MS = 6367.0  # README.md:129-131 example output

CONFIGS = {
    # name: (N, E, F, C, layers, heads, outdims)
    "citeseer3": (3327, 4732, 3703, 6, 3, (4, 1, 1), (64, 32, 16)),
    "cora": (2708, 5429, 1433, 7, 2, (8, 1), (64, 32)),
    "pubmed": (19717, 44338, 500, 3, 3, (4, 1, 1), (64, 32, 16)),
    "arxiv": (169343, 1166243, 128, 40, 3, (4, 1, 1), (64, 32, 16)),
}


def bench_config(name, *, epochs=30, warmup=5, impl="xla", seed=0):
    import jax
    import jax.numpy as jnp

    from gatv2_tpu.config import ModelConfig, TrainConfig
    from gatv2_tpu.data.synthetic import random_graph
    from gatv2_tpu.models.gatv2 import init_params
    from gatv2_tpu.train import optim
    from gatv2_tpu.train.loop import make_train_step

    n, e, f, c, layers, heads, outdims = CONFIGS[name]
    g = random_graph(n, e, f, c, seed=seed)
    config = ModelConfig(
        num_layers=layers, heads=heads, out_dims=outdims,
        num_classes=c, in_dim=f,
    )
    tc = TrainConfig(optimizer="adam", lr=0.01, seed=seed, impl=impl)
    params = init_params(config, jax.random.PRNGKey(seed))
    opt_state = optim.init_opt_state(params, "adam")
    pe = g.padded_edges(128)
    feats = jnp.asarray(g.features)
    src = jnp.asarray(pe.src)
    dst = jnp.asarray(pe.dst)
    labels = jnp.asarray(g.labels)
    step = make_train_step(config, tc)

    t = 0
    for i in range(warmup):
        t += 1
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(t, jnp.int32), feats, src, dst, labels
        )
    jax.block_until_ready(params)

    times = []
    for i in range(epochs):
        t += 1
        t0 = time.perf_counter()
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(t, jnp.int32), feats, src, dst, labels
        )
        jax.block_until_ready(params)
        times.append((time.perf_counter() - t0) * 1e3)

    epoch_ms = float(np.median(times))
    edges_per_s = e * layers / (epoch_ms / 1e3)
    return {
        "config": name,
        "epoch_ms": epoch_ms,
        "epoch_ms_min": float(np.min(times)),
        "edges_per_s": edges_per_s,
        "final_loss": float(loss),
        "device": str(jax.devices()[0]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="citeseer3", choices=list(CONFIGS))
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--impl", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--all", action="store_true", help="bench every config (stderr)")
    args = ap.parse_args()

    if args.all:
        for name in CONFIGS:
            r = bench_config(name, epochs=args.epochs, impl=args.impl)
            print(json.dumps(r), file=sys.stderr)

    r = bench_config(args.config, epochs=args.epochs, impl=args.impl)
    result = {
        "metric": f"epoch_time_{args.config}_3327N_4732E_fwd_bwd_update",
        "value": round(r["epoch_ms"], 3),
        "unit": "ms",
        "vs_baseline": round(REFERENCE_EPOCH_MS / r["epoch_ms"], 2),
        "edges_per_s": round(r["edges_per_s"]),
        "device": r["device"],
        "impl": args.impl,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
