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
    # the reference's 4-head headline at full Products scale — does NOT fit
    # one 16 GB chip; meant for --mesh >= 2 (per-shard HBM plan: SCALING.md)
    "products-full-4h": (2449029, 61859140, 100, 47, 3, (4, 1, 1), (64, 32, 16)),
    # arxiv-scale with a Zipf(1.2) degree profile on BOTH endpoints — the
    # hub-heavy regime real citation/product graphs have (the uniform
    # configs above flatter layouts that pad per-slice; SELL handles hubs
    # by virtual-row splitting, measured here)
    "arxiv-pl": (169343, 1166243, 128, 40, 3, (4, 1, 1), (64, 32, 16)),
    # the same hub-heavy profile at FULL Products scale: virtual-row
    # splitting + chunking + remat together on 61.9M edges
    "products-full-pl": (
        2449029, 61859140, 100, 47, 3, (2, 1, 1), (64, 32, 16)
    ),
}


def _bench_graph(name, n, e, f, c, seed):
    if name.endswith("-pl"):
        from gatv2_tpu.data.synthetic import powerlaw_graph

        return powerlaw_graph(n, e, f, c, seed=seed, alpha=1.2)
    from gatv2_tpu.data.synthetic import random_graph

    return random_graph(n, e, f, c, seed=seed)


def flops_per_epoch(
    name: str,
    impl: str,
    num_chunks: int = 1,
    sell_overhead: float = 1.0,
    sell_e2_overhead: float | None = None,
) -> dict:
    """Model-FLOPs accounting for one training epoch (fwd+bwd+update).

    Two categories, reported separately (VERDICT round-1 item 5):

    - model_gflop: algorithmic FLOPs the math requires. Dense projections
      (zs/zd per layer + classifier) and per-edge work (score dot, softmax,
      aggregation ~ 6D+10 FLOPs per edge-head). Backward of a matmul costs
      2x its forward (dW and dx), so the epoch total is ~3x forward.
    - structural_gflop: EXTRA FLOPs the fused-kernel formulation burns on
      MXU products whose width is the 128-lane register, not the head
      count. Per edge (round-3 streamed-operand kernels): forward runs 3
      lane-expanded passes of width hd (score SDDMM, p expansion, one-hot
      aggregation) + 2 of width 128 (max gather, l reduction). The
      UNCHUNKED backward adds 5 hd-wide (phase 1 with c1: SDDMM, dalpha,
      fused de/alpha expansion x2, dzd one-hot) + 1 (packet segment sum)
      = 9 hd-wide total; the CHUNKED backward (num_chunks > 1, read off
      the ACTUAL EdgeTiles the bench built — not re-derived) runs phase 1
      without c1 (4) plus the phase-2b recompute (5) = 12 hd-wide total.
      These are real device FLOPs but do no algorithmic work — edges/s is
      the honest throughput metric; MFU is reported against the
      algorithmic count.
    """
    n, e, f, c, layers, heads, outdims = CONFIGS[name]
    in_dims = [f] + [heads[l] * outdims[l] for l in range(layers - 1)]
    dense = 0.0
    edge_alg = 0.0
    structural = 0.0
    tile = 128
    hd_passes = 12.0 if num_chunks > 1 else 9.0
    for l in range(layers):
        h, d = heads[l], outdims[l]
        dense += 2 * 2.0 * n * in_dims[l] * h * d  # zs and zd projections
        edge_alg += e * h * (6.0 * d + 10.0)
        if impl == "pallas":
            hd = -(-h * d // 128) * 128  # lane-padded feature width
            structural += 2.0 * e * tile * (hd_passes * hd + 2.0 * tile)
        elif impl == "sell":
            # SELL kernels: [128, hd] x [hd, hd] products per 128-edge
            # column — fwd 1 (score) + bwd phase 1 2 (score, dalpha) on
            # the dst-side layout; CHUNKED runs add phase 2b's 3 (score,
            # stat expansion, dalpha) on the SRC-side layout (e2_ell
            # columns). Unchunked phase 2a has none. Padded columns
            # (the per-side overheads) burn the same products.
            hd = -(-h * d // 128) * 128
            ov2 = sell_overhead if sell_e2_overhead is None else sell_e2_overhead
            prods = 3.0 * sell_overhead + (
                3.0 * ov2 if num_chunks > 1 else 0.0
            )
            structural += prods * e * 2.0 * hd * hd
    dense += 2.0 * n * outdims[-1] * c  # classifier
    fwd_bwd = 3.0  # fwd + ~2x fwd for backward
    return {
        "model_gflop": fwd_bwd * (dense + edge_alg) / 1e9,
        "dense_gflop": fwd_bwd * dense / 1e9,
        "edge_gflop": fwd_bwd * edge_alg / 1e9,
        # the structural per-edge count already spans fwd + both backward
        # phases — no 3x here
        "structural_gflop": structural / 1e9,
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
    precision="highest", tile_e=None, streams="f32", chunk_budget=None,
):
    import jax
    import jax.numpy as jnp

    from gatv2_tpu.config import ModelConfig, TrainConfig
    from gatv2_tpu.models.gatv2 import init_params
    from gatv2_tpu.train import optim
    from gatv2_tpu.train.loop import make_multi_epoch_runner

    n, e, f, c, layers, heads, outdims = CONFIGS[name]
    k1, k2, reps = _rep_plan(e, k1, k2, reps)
    g = _bench_graph(name, n, e, f, c, seed)
    config = ModelConfig(
        num_layers=layers, heads=heads, out_dims=outdims,
        num_classes=c, in_dim=f, matmul_precision=precision,
        # fit 60M+-edge full-graph in HBM. (Measured, round 5: even with
        # the bf16-residual tier, remat-off at products-full exceeds HBM
        # by 2.6 GB — the backward's node-space f32 tables dominate, not
        # the residuals — so remat stays on for every tier.)
        remat=(e >= 30_000_000),
        streams=streams,
    )
    tc = TrainConfig(optimizer="adam", lr=0.01, seed=seed, impl=impl)
    edge_tiles = None
    num_valid = None
    feats_np, labels_np = g.features, g.labels
    sell_overhead = None
    if impl == "pallas":
        from gatv2_tpu.ops.pallas_attention import setup_full_graph

        edge_tiles, feats_np, labels_np, num_valid = setup_full_graph(
            g, heads, outdims, tile_e=tile_e
        )
    elif impl == "sell":
        from gatv2_tpu.ops.sell_attention import setup_full_graph_sell

        edge_tiles, feats_np, labels_np, num_valid = setup_full_graph_sell(
            g, heads, outdims, budget_bytes=chunk_budget
        )
        sell_overhead = edge_tiles.pad_overhead
    feats = jnp.asarray(feats_np)
    labels = jnp.asarray(labels_np)
    if impl in ("pallas", "sell"):
        # these paths read edges from edge_tiles; don't ship the COO
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

    diffs, final_loss = _differenced_timing(run_once, k1, k2, reps)
    epoch_ms, timing = _timing_fields(diffs)
    edges_per_s = e * layers / (epoch_ms / 1e3)
    fl = flops_per_epoch(
        name,
        impl,
        getattr(edge_tiles, "num_chunks", 1) if edge_tiles is not None else 1,
        sell_overhead=sell_overhead or 1.0,
        sell_e2_overhead=(
            edge_tiles.e2_ell / max(e, 1) if impl == "sell" else None
        ),
    )
    device = str(jax.devices()[0])
    achieved = fl["model_gflop"] / epoch_ms  # GFLOP / ms == TFLOP/s
    achieved_total = (fl["model_gflop"] + fl["structural_gflop"]) / epoch_ms
    peak = _peak_tflops(device)
    return {
        "config": name,
        **timing,
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
        "host_cpus": _host_cpus(),
    }


def _rep_plan(e: int, k1, k2, reps):
    """Default (k1, k2, reps) program-size tier by edge count — ONE table
    shared by the sharded and unsharded benches so their rows always use
    identical methodology. Every tier gets >= 3 reps (no single-sample
    rows); median + min are both reported (min is the contention-free
    floor on the tunneled chip, median the honest expectation). Big
    graphs: fewer epochs per program (compile time + HBM headroom); tiny
    graphs: dispatch noise dominates, so longer programs + more repeats."""
    if k1 is not None:
        return k1, k2, reps
    if e >= 30_000_000:
        return 1, 2, 3
    if e >= 4_000_000:
        return 1, 3, 5
    if e >= 500_000:
        return 8, 40, 5
    # sub-2ms epochs are dispatch-noise-dominated through the tunnel:
    # round-3 measured 99.3% spread on cora with a 80-epoch diff body.
    # 300 epochs of diff amortizes the same absolute jitter ~4x further.
    return 10, 310, 7


def _differenced_timing(run_once, k1, k2, reps):
    """Compile both program sizes, then collect reps differenced timings
    ((k2-epoch time - k1-epoch time) / (k2 - k1), ms) — cancels fixed
    dispatch/transfer overhead exactly. Returns (diffs, final_loss)."""
    run_once(k1)  # compile
    run_once(k2)  # compile
    diffs = []
    final_loss = None
    for _ in range(reps):
        t_small, _ = run_once(k1)
        t_large, final_loss = run_once(k2)
        diffs.append((t_large - t_small) / (k2 - k1) * 1e3)
    return diffs, final_loss


def _timing_fields(diffs):
    epoch_ms = float(np.median(diffs))
    variance_pct = (
        (max(diffs) - min(diffs)) / epoch_ms * 100.0 if len(diffs) > 1 else 0.0
    )
    fields = {
        "epoch_ms": epoch_ms,
        "epoch_ms_min": float(min(diffs)),
        "epoch_ms_all": [round(d, 4) for d in diffs],
        "variance_pct": round(variance_pct, 1),
    }
    if epoch_ms < 3.0:
        # physics note for readers of the sweep: a sub-3ms program body
        # rides under the tunnel's dispatch jitter; epoch_ms_min is the
        # contention-free floor and the honest per-epoch number there
        fields["dispatch_bound"] = True
    return epoch_ms, fields


def _host_cpus() -> int:
    """CPUs actually available to this process (affinity quota, not the
    machine's core count) — contention context for the timing numbers."""
    import os

    try:
        return len(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        return os.cpu_count() or 1


def comm_volume_table(pg, plan, heads, outdims) -> list[dict]:
    """Analytic per-layer ICI communication volume of the sharded forward
    (the backward moves the same rows in transpose — grad-of-all_gather is
    a reduce_scatter — so a train step is ~2x these bytes).

    all_gather: each chip receives every OTHER shard's padded node block.
    halo (boundary-only all_to_all): each chip receives (S-1) * M rows,
    M = the padded per-pair cross-shard cut (HaloPlan.m_per_pair); the
    diagonal block of the S*M-row table never crosses ICI.
    """
    s = pg.num_shards
    rows_ag = pg.padded_num_nodes - pg.nodes_per_shard
    rows_halo = (s - 1) * plan.m_per_pair if plan is not None else None
    out = []
    for l, (h, d) in enumerate(zip(heads, outdims)):
        hd = h * d
        row = {
            "layer": l,
            "hd": hd,
            "all_gather_mb_per_chip": round(rows_ag * hd * 4 / 1e6, 3),
        }
        if rows_halo is not None:
            row["halo_mb_per_chip"] = round(rows_halo * hd * 4 / 1e6, 3)
            row["halo_vs_ag"] = round(rows_halo / max(rows_ag, 1), 4)
        out.append(row)
    return out


def bench_mesh_config(
    name, n_devices, *, halo=True, overlap=False, k1=None, k2=None,
    reps=None, impl="pallas", seed=0, precision="highest", tile_e=None,
    streams="f32",
):
    """Sharded (edge-partitioned) scaling bench: the full multi-chip train
    step — halo exchange / all_gather collectives included — timed with the
    same differenced two-program scheme as bench_config, on an n_devices
    'graph' mesh. On the single real TPU chip, --mesh 1 measures the
    sharding machinery's overhead vs the unsharded path; on a virtual CPU
    mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N --platform
    cpu) it validates the harness and the comm-volume model for real
    multi-chip runs (SCALING.md)."""
    import jax
    import jax.numpy as jnp

    from gatv2_tpu.config import ModelConfig, TrainConfig
    from gatv2_tpu.models.gatv2 import init_params_for_variant
    from gatv2_tpu.parallel.mesh import make_mesh
    from gatv2_tpu.parallel.partition import (
        halo_exchange_plan,
        overlap_split_plan,
        partition_graph,
        prepare_overlap_tiles,
        prepare_partitioned_tiles,
    )
    from gatv2_tpu.parallel.sharded import (
        device_put_params,
        device_put_partitioned,
        make_sharded_multi_epoch_runner,
    )
    from gatv2_tpu.train import optim

    n, e, f, c, layers, heads, outdims = CONFIGS[name]
    k1, k2, reps = _rep_plan(e, k1, k2, reps)
    g = _bench_graph(name, n, e, f, c, seed)
    config = ModelConfig(
        num_layers=layers, heads=heads, out_dims=outdims,
        num_classes=c, in_dim=f, matmul_precision=precision,
        # same policy as the unsharded bench, evaluated on PER-SHARD edges,
        # so remat never differs between the rows a scaling table compares
        remat=(e // n_devices >= 30_000_000),
        streams=streams,
    )
    tc = TrainConfig(optimizer="adam", lr=0.01, seed=seed, impl=impl)
    mesh = make_mesh(n_devices)
    pg = partition_graph(g, n_devices)
    plan = halo_exchange_plan(pg) if (halo and n_devices > 1) else None
    if plan is not None and plan.halo_size >= pg.padded_num_nodes:
        plan = None  # no locality; dense all_gather moves less
    tiles = ov = ov_tiles = None
    if overlap and plan is not None:
        split = overlap_split_plan(pg, plan)
        if impl == "pallas":
            ov_tiles = prepare_overlap_tiles(
                pg, plan, split, tile_e=tile_e or 128
            )
        elif impl == "sell":
            from gatv2_tpu.parallel.partition import (
                prepare_overlap_sell_tiles,
            )

            ov_tiles = prepare_overlap_sell_tiles(pg, plan, split)
        else:
            ov = split
    elif impl == "pallas":
        from gatv2_tpu.ops.pallas_attention import (
            STATS_L,
            default_chunk_budget,
            suggest_num_chunks,
        )

        # same chunk policy as setup_full_graph, on PER-SHARD edges: the
        # streamed-operand backward materializes [E_shard, 2*hd + 128]
        # per-edge streams, which at products-sub scale (8.25 M padded
        # edges x 640 lanes = 21 GB f32) OOMs a 16 GB chip unchunked
        max_hd = max(-(-h * d // 128) * 128 for h, d in zip(heads, outdims))
        kernel_hd = max(
            -(-min(h, STATS_L) * d // 128) * 128
            for h, d in zip(heads, outdims)
        )
        e_shard = pg.edges_per_shard
        budget = default_chunk_budget(e_shard)
        tiles = prepare_partitioned_tiles(
            pg, tile_e=tile_e or 128,
            num_chunks=suggest_num_chunks(e_shard, max_hd,
                                          budget_bytes=budget),
            halo_plan=plan, max_hd=kernel_hd,
        )
    elif impl == "sell":
        from gatv2_tpu.parallel.partition import (
            prepare_partitioned_sell_tiles,
        )

        tiles = prepare_partitioned_sell_tiles(
            pg, halo_plan=plan,
            # auto-chunked for every mesh size (worst shard decides; the
            # chunk grid is uniform across shards)
            num_chunks=None,
            heads=heads, out_dims=outdims,
        )
    feats, src, dst_l, labels = device_put_partitioned(pg, mesh)

    runners = {
        k: make_sharded_multi_epoch_runner(
            config, tc, mesh, pg.num_real_nodes, k,
            edge_tiles=tiles, halo_plan=plan, overlap_split=ov,
            overlap_tiles=ov_tiles,
            interpret=jax.default_backend() == "cpu",
        )
        for k in (k1, k2)
    }

    def run_once(k):
        params = device_put_params(
            init_params_for_variant(config, jax.random.PRNGKey(seed)),
            config, mesh,
        )
        opt_state = optim.init_opt_state(params, "adam")
        t0 = time.perf_counter()
        params, opt_state, losses, accs = runners[k](
            params, opt_state, jnp.asarray(0, jnp.int32),
            feats, src, dst_l, labels,
        )
        final_loss = float(losses[-1])
        return time.perf_counter() - t0, final_loss

    diffs, final_loss = _differenced_timing(run_once, k1, k2, reps)
    epoch_ms, timing = _timing_fields(diffs)
    edges_per_s = e * layers / (epoch_ms / 1e3)
    return {
        "config": name,
        "mesh": n_devices,
        "halo": "boundary" if plan is not None else "all_gather",
        "overlap": bool(overlap and plan is not None),
        **timing,
        "edges_per_s": edges_per_s,
        "edges_per_s_per_chip": edges_per_s / n_devices,
        "halo_rows_per_chip": plan.halo_size if plan is not None else None,
        "comm_volume": comm_volume_table(pg, plan, heads, outdims),
        "final_loss": final_loss,
        "device": str(jax.devices()[0]),
        "host_cpus": _host_cpus(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="citeseer3", choices=list(CONFIGS))
    ap.add_argument(
        "--impl", default="auto", choices=["auto", "xla", "pallas", "sell"],
        help="attention kernel family; 'auto' (default) resolves like the "
             "CLI: sell on an accelerator, xla on CPU — so the headline "
             "measures the framework's actual default path",
    )
    ap.add_argument("--precision", default="highest",
                    choices=["highest", "high", "default"])
    ap.add_argument("--streams", default="f32", choices=["f32", "bf16"],
                    help="SELL stream tier (bf16 = rounded projections + "
                         "bf16 residual storage; transport stays f32)")
    ap.add_argument("--chunk-budget-gb", type=float, default=None,
                    help="override the SELL edge-temporary chunking budget "
                         "(default: ops.pallas_attention.default_chunk_budget"
                         "; fewer/bigger chunks cut scan-stacking copies at "
                         "more transient HBM)")
    ap.add_argument("--all", action="store_true", help="bench every config (stderr)")
    ap.add_argument("--tile-e", type=int, default=None,
                    help="override the Pallas edge-tile size (default: auto)")
    ap.add_argument("--mesh", type=int, default=0,
                    help="N>0: bench the sharded (edge-partitioned) step on "
                         "an N-device mesh (see bench_mesh_config)")
    ap.add_argument("--no-halo", action="store_true",
                    help="--mesh: force the dense all_gather exchange")
    ap.add_argument("--overlap", action="store_true",
                    help="--mesh: two-pass halo/compute-overlap layers")
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (e.g. cpu for virtual meshes "
                         "with XLA_FLAGS=--xla_force_host_platform_device_count=N)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.impl == "auto":
        import jax

        args.impl = "sell" if jax.default_backend() != "cpu" else "xla"

    if args.mesh > 0:
        if args.all:
            ap.error("--all cannot be combined with --mesh")
        r = bench_mesh_config(
            args.config, args.mesh, halo=not args.no_halo,
            overlap=args.overlap, impl=args.impl, precision=args.precision,
            tile_e=args.tile_e, streams=args.streams,
        )
        result = {
            "metric": f"sharded_epoch_time_{args.config}_mesh{args.mesh}",
            "value": round(r["epoch_ms"], 3),
            "unit": "ms",
            "vs_baseline": None,
            **{k: r[k] for k in (
                "mesh", "halo", "overlap", "edges_per_s",
                "edges_per_s_per_chip", "variance_pct", "device",
            )},
            "comm_volume": r["comm_volume"],
            "impl": args.impl,
        }
        if r.get("dispatch_bound"):
            result["dispatch_bound"] = True
            result["epoch_ms_min"] = round(r["epoch_ms_min"], 4)
        print(json.dumps(result))
        return

    r = None
    if args.all:
        for name in CONFIGS:
            if name == "products-full-4h":
                continue  # multi-chip only (per-shard HBM plan: SCALING.md)
            rr = bench_config(name, impl=args.impl, precision=args.precision, tile_e=args.tile_e, streams=args.streams)
            print(json.dumps(rr), file=sys.stderr)
            if name == args.config:
                r = rr  # reuse for the headline line (no duplicate run)

    if r is None:
        r = bench_config(args.config, impl=args.impl, precision=args.precision, tile_e=args.tile_e, streams=args.streams, chunk_budget=(int(args.chunk_budget_gb * (1 << 30)) if args.chunk_budget_gb else None))
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
    # physics flag from _timing_fields: sub-3ms bodies ride under the
    # tunnel's dispatch jitter, epoch_ms_min is the honest floor there.
    # (round-4 sweep rows lost this because the headline dict rebuilt
    # fields by hand — pass it through explicitly.)
    if r.get("dispatch_bound"):
        result["dispatch_bound"] = True
        result["epoch_ms_min"] = round(r["epoch_ms_min"], 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
