#!/usr/bin/env python
"""Minibatch-pipeline benchmark: is the sampled-training loop device-bound?

Round-1 finding: the device step was ~33 ms at OGBN-Products scale but host
sampling + numpy tile prep (~23 ms + ~60 ms) starved it. Round 2 moved tile
emission into native/sampler.cpp; this tool measures the outcome:

  - device_step_ms: the jit step alone (same batch replayed, block_until_ready)
  - sample_ms: host sampling + native tile emission per batch
  - epoch_ms: the REAL pipeline (prefetch depth 2) over one epoch's batches
  - pipeline_ratio: epoch_ms / (device_step_ms * batches) — 1.0 = perfectly
    device-bound; the round-1 VERDICT target is <= 1.2.

Usage: python tools/bench_minibatch.py [--nodes N] [--edges E] [--batch B]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=500_000)
    ap.add_argument("--edges", type=int, default=8_000_000)
    ap.add_argument("--features", type=int, default=100)
    ap.add_argument("--classes", type=int, default=47)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--fanouts", default="10,10,10")
    ap.add_argument("--impl", default="pallas",
                    choices=["xla", "pallas", "sell"])
    ap.add_argument("--budget", default="auto",
                    choices=["auto", "worst", "probe"])
    ap.add_argument("--batches", type=int, default=30,
                    help="batches per timed 'epoch' (full epoch is huge)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gatv2_tpu.config import ModelConfig, TrainConfig
    from gatv2_tpu.data.sampling import NeighborSampler, prefetch
    from gatv2_tpu.data.synthetic import random_graph
    from gatv2_tpu.models.gatv2 import init_params
    from gatv2_tpu.train import optim
    from gatv2_tpu.train.minibatch import make_minibatch_step

    fanouts = tuple(int(v) for v in args.fanouts.split(","))
    g = random_graph(args.nodes, args.edges, args.features, args.classes, seed=0)
    mc = ModelConfig(
        num_layers=len(fanouts), heads=(4,) * (len(fanouts) - 1) + (1,),
        out_dims=(64,) * (len(fanouts) - 1) + (32,),
        num_classes=args.classes, in_dim=args.features,
    )
    tc = TrainConfig(optimizer="adam", lr=0.01, seed=0, impl=args.impl,
                     batch_size=args.batch, fanouts=fanouts)
    sampler = NeighborSampler(
        g, args.batch, fanouts, seed=0, engine="native",
        emit_tiles=(args.impl if args.impl in ("pallas", "sell") else False),
        budget=args.budget,
    )
    params = init_params(mc, jax.random.PRNGKey(0))
    opt_state = optim.init_opt_state(params, "adam")
    step = make_minibatch_step(mc, tc, donate=False, device_gather=True)
    feat_table = jnp.asarray(g.features)  # resident: ids ship, not rows

    def run_step(b):
        return step(
            params, opt_state, jnp.asarray(1, jnp.int32),
            (feat_table, jnp.asarray(b.node_ids)),
            jnp.asarray(b.src), jnp.asarray(b.dst),
            jnp.asarray(b.labels), jnp.asarray(b.num_seeds, jnp.int32),
            b.tiles,
        )

    batches_n = min(args.batches, sampler.batches_per_epoch())

    # compile + measure the device step on a fixed batch
    b0 = sampler.sample(np.arange(min(args.batch, args.nodes)))
    jax.block_until_ready(run_step(b0))  # compile
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = run_step(b0)
    jax.block_until_ready(out)
    device_step_ms = (time.perf_counter() - t0) / reps * 1e3

    # host sampling + tile emission alone
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for i in range(5):
        sampler.sample(np.sort(rng.choice(
            args.nodes, size=min(args.batch, args.nodes), replace=False)))
    sample_ms = (time.perf_counter() - t0) / 5 * 1e3

    # the real pipeline: prefetch(sampler) feeding the device
    it = iter(sampler)
    batches = [next(it) for _ in range(batches_n)]  # fixed batch list

    t0 = time.perf_counter()
    last = None
    for b in prefetch(iter(batches), depth=2):
        last = run_step(b)
    jax.block_until_ready(last)
    replay_ms = (time.perf_counter() - t0) / batches_n * 1e3  # no sampling

    def fresh_batches():
        it = iter(sampler)
        for _ in range(batches_n):
            yield next(it)

    t0 = time.perf_counter()
    for b in prefetch(fresh_batches(), depth=2):
        last = run_step(b)
    jax.block_until_ready(last)
    epoch_ms = (time.perf_counter() - t0) / batches_n * 1e3

    print(json.dumps({
        "nodes": args.nodes, "edges": args.edges, "batch": args.batch,
        "budget": args.budget,
        "max_nodes": sampler.max_nodes, "max_edges": sampler.max_edges,
        "fanouts": list(fanouts), "impl": args.impl,
        "device_step_ms": round(device_step_ms, 2),
        "sample_ms": round(sample_ms, 2),
        "replay_per_batch_ms": round(replay_ms, 2),
        "pipelined_per_batch_ms": round(epoch_ms, 2),
        "pipeline_ratio": round(epoch_ms / max(device_step_ms, 1e-9), 3),
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
