#!/usr/bin/env python
"""At-scale gradient error of the bf16x3 (--precision high) tier vs
exact f32, on the SELL kernels — the measurement the bf16x3-default
decision (round-2 VERDICT 1c) was waiting for. tpu_smoke checks this at
toy scale (N=600); cancellation error can grow with neighborhood sizes,
so this runs the real arxiv-scale graph on the chip.

Usage: timeout 580 python tools/grad_error_at_scale.py \
           [--nodes 169343 --edges 1166243] [--impl sell]
Prints one JSON line with per-input relative-error stats.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=169343)
    ap.add_argument("--edges", type=int, default=1166243)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--impl", default="sell", choices=["sell", "pallas"])
    ap.add_argument("--streams", default=None, choices=["bf16"],
                    help="measure the bf16-stream tier instead of the "
                         "bf16x3 matmul tier (sell only): error of "
                         "streams='bf16' vs exact f32, both at "
                         "precision='highest'")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gatv2_tpu.data.synthetic import random_graph

    g = random_graph(args.nodes, args.edges, 8, 4, seed=args.seed)
    h, d = args.heads, args.dim
    rng = np.random.default_rng(args.seed + 7)
    zs = jnp.asarray(rng.standard_normal((g.num_nodes, h, d)), jnp.float32)
    zd = jnp.asarray(rng.standard_normal((g.num_nodes, h, d)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((h, d)), jnp.float32)

    if args.impl == "sell":
        from gatv2_tpu.ops.sell_attention import (
            prepare_sell_tiles,
            sell_attention,
        )

        tiles = prepare_sell_tiles(g.row_ptr, g.col_idx, g.num_nodes)

        def make_loss(precision, streams="f32"):
            def loss(zs, zd, a):
                return jnp.sum(jnp.sin(sell_attention(
                    zs, zd, a, None, None, g.num_nodes, negative_slope=0.2,
                    sell_tiles=tiles, precision=precision, streams=streams,
                )))
            return loss
    else:
        from gatv2_tpu.ops.pallas_attention import (
            edge_attention_pallas,
            prepare_edge_tiles,
        )

        tiles = prepare_edge_tiles(g.row_ptr, g.col_idx, g.num_nodes)

        def make_loss(precision):
            def loss(zs, zd, a):
                return jnp.sum(jnp.sin(edge_attention_pallas(
                    zs, zd, a, None, None, g.num_nodes, negative_slope=0.2,
                    edge_tiles=tiles, precision=precision,
                )))
            return loss

    out = {"impl": args.impl, "nodes": g.num_nodes,
           "edges": int(g.num_edges), "heads": h, "dim": d}
    if args.streams == "bf16":
        if args.impl != "sell":
            raise SystemExit("--streams bf16 is a sell-only tier")
        out["tier"] = "streams_bf16_vs_f32"
        variants = [("highest", {"precision": "highest"}),
                    ("high", {"precision": "highest", "streams": "bf16"})]
    else:
        out["tier"] = "precision_high_vs_highest"
        variants = [("highest", {"precision": "highest"}),
                    ("high", {"precision": "high"})]
    grads = {}
    for key, kw in variants:
        v, gr = jax.jit(
            jax.value_and_grad(make_loss(**kw), argnums=(0, 1, 2))
        )(zs, zd, a)
        grads[key] = [np.asarray(x) for x in gr]
        out[f"loss_{key}"] = float(v)
    names = ("d_zs", "d_zd", "d_a")
    for name, ge, gx in zip(names, grads["high"], grads["highest"]):
        err = np.abs(ge - gx)
        scale = np.abs(gx).max() + 1e-12
        rel = err / scale
        out[name] = {
            "rel_max": float(rel.max()),
            "rel_p9999": float(np.percentile(rel, 99.99)),
            "rel_p99": float(np.percentile(rel, 99)),
        }
    out["loss_rel_err"] = abs(out["loss_high"] - out["loss_highest"]) / (
        abs(out["loss_highest"]) + 1e-12
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
