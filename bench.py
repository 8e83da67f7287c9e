#!/usr/bin/env python
"""Benchmark: GATv2 full-graph training throughput on the current device.

Measures the reference's headline configuration (README.md:106-132 —
Citeseer 3-layer, heads 4,1,1, outdims 64,32,16, Adam lr=0.01) on a
Citeseer-shaped graph (N=3327, E=4732, F=3703, C=6) and reports:

  - epoch_ms: wall-clock per training epoch (fwd+bwd+update)
  - edges_per_s: E * layers / epoch time (per chip)
  - vs_baseline: reference epoch time (~6367 ms on its example GPU,
    README.md:129-131) / our epoch time — the speedup factor.

Methodology: epochs run ON DEVICE via a lax.scan multi-epoch program (the
TPU-idiomatic loop; the reference syncs the host ~20x per epoch). Because
remote-tunneled devices acknowledge dispatch early, timing uses a DIFFERENCE
of two program sizes (K2 vs K1 epochs, each synced by fetching the final
loss), which cancels fixed dispatch/transfer overhead exactly.

Prints ONE JSON line. Extra configs via --config / --all.
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
    "products-sub": (500000, 8000000, 100, 47, 3, (4, 1, 1), (64, 32, 16)),
    # OGBN-Products at full scale, trained FULL-GRAPH on one chip via
    # chunked kernels + per-layer remat (2 heads keeps peak HBM < 16GB on
    # v5e; on v5p-class HBM the 4-head config fits too)
    "products-full": (2449029, 61859140, 100, 47, 3, (2, 1, 1), (64, 32, 16)),
}


def flops_per_epoch(name: str, impl: str) -> dict:
    """Model-FLOPs accounting for one training epoch (fwd+bwd+update).

    Two categories, reported separately (VERDICT round-1 item 5):

    - model_gflop: algorithmic FLOPs the math requires. Dense projections
      (zs/zd per layer + classifier) and per-edge work (score dot, softmax,
      aggregation ~ 6D+10 FLOPs per edge-head). Backward of a matmul costs
      2x its forward (dW and dx), so the epoch total is ~3x forward.
    - structural_gflop: EXTRA FLOPs the one-hot MXU segment-reduction
      formulation burns (each 128-edge tile multiplies against a 128-wide
      one-hot matrix -> TILE_N x the algorithmic aggregation cost; ~4 such
      passes per layer across fwd + the three backward phases). These are
      real device FLOPs but do no algorithmic work — edges/s is the honest
      throughput metric; MFU is reported against the algorithmic count.
    """
    n, e, f, c, layers, heads, outdims = CONFIGS[name]
    in_dims = [f] + [heads[l] * outdims[l] for l in range(layers - 1)]
    dense = 0.0
    edge_alg = 0.0
    structural = 0.0
    tile = 128
    e_tiles = -(-e // tile)
    for l in range(layers):
        h, d = heads[l], outdims[l]
        dense += 2 * 2.0 * n * in_dims[l] * h * d  # zs and zd projections
        edge_alg += e * h * (6.0 * d + 10.0)
        if impl == "pallas":
            # one-hot segment matmuls: fwd seg-sum + ~3 backward phases
            structural += 4 * 2.0 * e_tiles * tile * tile * h * d
    dense += 2.0 * n * outdims[-1] * c  # classifier
    fwd_bwd = 3.0  # fwd + ~2x fwd for backward
    return {
        "model_gflop": fwd_bwd * (dense + edge_alg) / 1e9,
        "dense_gflop": fwd_bwd * dense / 1e9,
        "edge_gflop": fwd_bwd * edge_alg / 1e9,
        "structural_gflop": fwd_bwd * structural / 1e9,
    }


# MXU peak by device kind (dense bf16 TFLOP/s per chip, public specs).
# f32 (precision=highest) runs as multi-pass bf16 emulation on the MXU, so
# bf16 peak is the one hardware ceiling every mode shares.
PEAK_BF16_TFLOPS = {
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5": 459.0,  # v5p
    "TPU v4": 275.0,
    "TPU v6": 918.0,  # v6e (Trillium)
}


def _peak_tflops(device_str: str) -> float | None:
    for k, v in PEAK_BF16_TFLOPS.items():
        if k in device_str:
            return v
    return None


def bench_config(
    name, *, k1=None, k2=None, reps=None, impl="pallas", seed=0,
    precision="highest", tile_e=None
):
    import jax
    import jax.numpy as jnp

    from gatv2_tpu.config import ModelConfig, TrainConfig
    from gatv2_tpu.data.synthetic import random_graph
    from gatv2_tpu.models.gatv2 import init_params
    from gatv2_tpu.train import optim
    from gatv2_tpu.train.loop import make_multi_epoch_runner

    n, e, f, c, layers, heads, outdims = CONFIGS[name]
    # big graphs: fewer epochs per program (compile time + HBM headroom)
    if k1 is None:
        if e >= 30_000_000:
            k1, k2, reps = 1, 2, 1
        elif e >= 4_000_000:
            k1, k2, reps = 1, 3, 2
        elif e >= 500_000:
            k1, k2, reps = 8, 40, 3
        else:
            # tiny graphs: dispatch noise dominates; longer programs + more
            # repeats for a stable median
            k1, k2, reps = 10, 90, 5
    g = random_graph(n, e, f, c, seed=seed)
    config = ModelConfig(
        num_layers=layers, heads=heads, out_dims=outdims,
        num_classes=c, in_dim=f, matmul_precision=precision,
        remat=(e >= 30_000_000),  # fit 60M+-edge full-graph in HBM
    )
    tc = TrainConfig(optimizer="adam", lr=0.01, seed=seed, impl=impl)
    edge_tiles = None
    num_valid = None
    feats_np, labels_np = g.features, g.labels
    if impl == "pallas":
        from gatv2_tpu.ops.pallas_attention import setup_full_graph

        edge_tiles, feats_np, labels_np, num_valid = setup_full_graph(
            g, heads, outdims, tile_e=tile_e
        )
    feats = jnp.asarray(feats_np)
    labels = jnp.asarray(labels_np)
    if impl == "pallas":
        # the pallas path reads edges from edge_tiles; don't ship the COO
        # arrays (0.5GB each at Products scale)
        src = dst = jnp.zeros(1, jnp.int32)
    else:
        pe = g.padded_edges(128)
        src = jnp.asarray(pe.src)
        dst = jnp.asarray(pe.dst)

    runners = {
        k: make_multi_epoch_runner(
            config, tc, k, edge_tiles=edge_tiles, num_valid=num_valid
        )
        for k in (k1, k2)
    }

    def run_once(k):
        # fresh state every run (runner donates its inputs)
        params = init_params(config, jax.random.PRNGKey(seed))
        opt_state = optim.init_opt_state(params, "adam")
        t0 = time.perf_counter()
        params, opt_state, losses, accs = runners[k](
            params, opt_state, jnp.asarray(0, jnp.int32),
            feats, src, dst, labels,
        )
        final_loss = float(losses[-1])  # forces real device completion
        return time.perf_counter() - t0, final_loss

    run_once(k1)  # compile
    run_once(k2)  # compile

    diffs = []
    final_loss = None
    for _ in range(reps):
        t_small, _ = run_once(k1)
        t_large, final_loss = run_once(k2)
        diffs.append((t_large - t_small) / (k2 - k1) * 1e3)

    epoch_ms = float(np.median(diffs))
    edges_per_s = e * layers / (epoch_ms / 1e3)
    fl = flops_per_epoch(name, impl)
    device = str(jax.devices()[0])
    achieved = fl["model_gflop"] / epoch_ms  # GFLOP / ms == TFLOP/s
    achieved_total = (fl["model_gflop"] + fl["structural_gflop"]) / epoch_ms
    peak = _peak_tflops(device)
    variance_pct = (
        (max(diffs) - min(diffs)) / epoch_ms * 100.0 if len(diffs) > 1 else 0.0
    )
    return {
        "config": name,
        "epoch_ms": epoch_ms,
        "epoch_ms_all": [round(d, 4) for d in diffs],
        "variance_pct": round(variance_pct, 1),
        "edges_per_s": edges_per_s,
        "model_gflop_per_epoch": round(fl["model_gflop"], 2),
        "structural_gflop_per_epoch": round(fl["structural_gflop"], 2),
        "achieved_model_tflops": round(achieved, 2),
        "achieved_device_tflops": round(achieved_total, 2),
        "mfu_pct_bf16_peak": (
            round(achieved / peak * 100.0, 2) if peak else None
        ),
        "final_loss": final_loss,
        "device": device,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="citeseer3", choices=list(CONFIGS))
    ap.add_argument("--impl", default="pallas", choices=["xla", "pallas"])
    ap.add_argument("--precision", default="highest",
                    choices=["highest", "high", "default"])
    ap.add_argument("--all", action="store_true", help="bench every config (stderr)")
    ap.add_argument("--tile-e", type=int, default=None,
                    help="override the Pallas edge-tile size (default: auto)")
    args = ap.parse_args()

    r = None
    if args.all:
        for name in CONFIGS:
            rr = bench_config(name, impl=args.impl, precision=args.precision, tile_e=args.tile_e)
            print(json.dumps(rr), file=sys.stderr)
            if name == args.config:
                r = rr  # reuse for the headline line (no duplicate run)

    if r is None:
        r = bench_config(args.config, impl=args.impl, precision=args.precision, tile_e=args.tile_e)
    nodes, edges = CONFIGS[args.config][0], CONFIGS[args.config][1]
    result = {
        "metric": f"epoch_time_{args.config}_{nodes}N_{edges}E_fwd_bwd_update",
        "value": round(r["epoch_ms"], 3),
        "unit": "ms",
        # the reference's single published number is the CITESEER3 example;
        # dividing it by another config's epoch time is not a speedup claim
        "vs_baseline": (
            round(REFERENCE_EPOCH_MS / r["epoch_ms"], 2)
            if args.config == "citeseer3"
            else None
        ),
        "edges_per_s": round(r["edges_per_s"]),
        "mfu": r["mfu_pct_bf16_peak"],
        "achieved_model_tflops": r["achieved_model_tflops"],
        "achieved_device_tflops": r["achieved_device_tflops"],
        "variance_pct": r["variance_pct"],
        "device": r["device"],
        "impl": args.impl,
        "precision": args.precision,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
