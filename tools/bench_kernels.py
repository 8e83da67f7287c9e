#!/usr/bin/env python
"""Micro-benchmark the fused attention kernels alone (no dense projections,
no optimizer): forward and forward+backward, per config, on the current
device — the instrument behind BENCH_SWEEP's roofline paragraph.

Times K repetitions of the op inside ONE lax.scan program (differenced
against a smaller program, same methodology as bench.py) so dispatch and
H2D are cancelled; reports per-call ms, edge throughput, and achieved
device TFLOP/s against the structural-FLOP model of the streamed-operand
kernels (bench.flops_per_epoch counts the same passes for the whole epoch;
here we count one layer's attention only).

Usage: python tools/bench_kernels.py [--config arxiv] [--hd 256]
       [--mode fwd|fwdbwd] [--precision highest] [--impl pallas|sell]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import CONFIGS, PEAK_BF16_TFLOPS, _peak_tflops  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="arxiv", choices=list(CONFIGS))
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--mode", default="fwdbwd", choices=["fwd", "fwdbwd"])
    ap.add_argument("--impl", default="pallas", choices=["pallas", "sell"])
    ap.add_argument("--precision", default="highest",
                    choices=["highest", "high", "default"])
    ap.add_argument("--tile-e", type=int, default=None)
    ap.add_argument("--k", type=int, default=None,
                    help="calls per large program (default by scale)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from gatv2_tpu.data.synthetic import random_graph
    from gatv2_tpu.ops.pallas_attention import (
        edge_attention_pallas,
        prepare_edge_tiles,
        suggest_num_chunks,
    )

    n, e, f, c, _, _, _ = CONFIGS[args.config]
    h, d = args.heads, args.dim
    hd = -(-h * d // 128) * 128
    g = random_graph(n, e, f, c, seed=0)
    # same chunking policy as setup_full_graph: without it, products-scale
    # configs would take the unchunked emit_c1 path and OOM on O(E)-wide
    # edge streams (and the structural-FLOP model below would mislabel the
    # backward pass count)
    from gatv2_tpu.ops.pallas_attention import default_chunk_budget

    budget = default_chunk_budget(e)
    if args.impl == "sell":
        from gatv2_tpu.ops.sell_attention import (
            prepare_sell_tiles,
            suggest_chunks_for_graph,
        )

        # same chunking policy the trainer uses (shared helper)
        et = prepare_sell_tiles(
            g.row_ptr, g.col_idx, g.num_nodes,
            num_chunks=suggest_chunks_for_graph(
                g.row_ptr, g.col_idx, g.num_nodes, (h,), (d,),
                budget_bytes=budget,
            ),
        )
    else:
        et = prepare_edge_tiles(
            g.row_ptr, g.col_idx, g.num_nodes, tile_e=args.tile_e, max_hd=hd,
            num_chunks=suggest_num_chunks(e, hd, budget_bytes=budget),
        )
    n_pad = et.padded_num_nodes
    key = jax.random.PRNGKey(0)
    zs = jax.random.normal(key, (n_pad, h * d), jnp.float32)
    zd = jax.random.normal(jax.random.PRNGKey(1), (n_pad, h * d), jnp.float32)
    a = jax.random.normal(jax.random.PRNGKey(2), (h, d), jnp.float32) * 0.1

    if args.impl == "sell":
        from gatv2_tpu.ops.sell_attention import sell_attention

        def op(zs, zd, a):
            return sell_attention(
                zs, zd, a, None, None, n_pad, negative_slope=0.2,
                sell_tiles=et, precision=args.precision,
            )
    else:
        def op(zs, zd, a):
            return edge_attention_pallas(
                zs, zd, a, None, None, n_pad, negative_slope=0.2,
                edge_tiles=et, precision=args.precision,
            )

    if args.mode == "fwd":
        def call(zs, zd, a):
            return jnp.sum(op(zs, zd, a))
    else:
        def call(zs, zd, a):
            def loss(zs, zd, a):
                return jnp.sum(jnp.sin(op(zs, zd, a)))

            gz, gd, ga = jax.grad(loss, argnums=(0, 1, 2))(zs, zd, a)
            return jnp.sum(gz) + jnp.sum(gd) + jnp.sum(ga)

    k_small = 2
    k_large = args.k or (6 if e >= 4_000_000 else 22)

    def make_runner(k):
        def run(zs, zd, a):
            def body(carry, _):
                # fold the carry into zs so scan iterations can't be CSE'd
                out = call(zs + carry * 1e-30, zd, a)
                return out, ()

            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return out

        return jax.jit(run)

    runners = {k: make_runner(k) for k in (k_small, k_large)}

    def time_once(k):
        t0 = time.perf_counter()
        v = float(runners[k](zs, zd, a))
        return time.perf_counter() - t0, v

    time_once(k_small)
    time_once(k_large)
    diffs = []
    for _ in range(args.reps):
        t_s, _ = time_once(k_small)
        t_l, _ = time_once(k_large)
        diffs.append((t_l - t_s) / (k_large - k_small) * 1e3)
    ms = float(np.median(diffs))

    # structural MXU FLOPs for ONE layer's attention (see bench.flops_per_epoch)
    chunked = et.num_chunks > 1
    if args.impl == "sell":
        # [128, hd] x [hd, hd] products per 128-edge column: 1 fwd + 2
        # bwd phase 1 on the dst-side layout (e_ell padded edges); when
        # chunked, phase 2b adds 3 on the SRC-side layout (e2_ell)
        prods_d = 1.0 if args.mode == "fwd" else 3.0
        prods_s = 3.0 if (chunked and args.mode == "fwdbwd") else 0.0
        gflop = (
            (prods_d * et.e_ell + prods_s * et.e2_ell) * 2.0 * hd * hd / 1e9
        )
    else:
        fwd_hd, bwd_hd = 3.0, (9.0 if chunked else 6.0)
        passes_hd = fwd_hd if args.mode == "fwd" else fwd_hd + bwd_hd
        passes_128 = 2.0
        gflop = 2.0 * e * 128 * (passes_hd * hd + passes_128 * 128) / 1e9
    device = str(jax.devices()[0])
    peak = _peak_tflops(device)
    out = {
        "config": args.config,
        "mode": args.mode,
        "impl": args.impl,
        "heads": h,
        "dim": d,
        "tile_e": getattr(et, "tile_e", None),
        "num_chunks": et.num_chunks,
        "precision": args.precision,
        "ms_per_call": round(ms, 4),
        "ms_min": round(float(min(diffs)), 4),
        "edges_per_s": round(e / (ms / 1e3)),
        "structural_gflop": round(gflop, 2),
        "achieved_device_tflops": round(gflop / ms, 2),
        "pct_of_bf16_peak": round(gflop / ms / peak * 100, 2) if peak else None,
        "device": device,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
