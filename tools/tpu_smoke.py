#!/usr/bin/env python
"""Real-TPU kernel smoke: lowers and runs every round-3 Pallas kernel path
on the chip and checks numerics against the XLA oracle computed on the
SAME device — the fast gate to run before a full sweep whenever the axon
tunnel comes back (interpret-mode CPU tests cannot exercise Mosaic
lowering, 8x128 tile constraints, or the real DMA paths).

Covers, in ~a minute of chip time:
  1. forward + backward, unchunked (emit_c1 packet path), h=4 d=64
  2. forward + backward, chunked (num_chunks=3, streaming recompute path)
  3. precision='high' (bf16x3 + exact_arg splits on the real MXU)
  4. 17-head group split (STATS_L boundary)
  5. merge path (edge_attention_pallas_merge, 2 parts)
  6. SELL-layout kernels (ops/sell_attention.py): fwd + bwd, h=4 d=64 and
     the lane-pad case h=2 d=60 — the [128, 1] mask stream and the
     head-replicated representation only prove out on real Mosaic lowering
  7. SELL merge path (sell_attention_merge, 2 parts — the halo-overlap
     building block: unnormalized forward + packed [m | l] stats)
  8. SELL streams='bf16' (bf16 stream DMAs + in-kernel upcasts), both
     chunk modes, against exact-kernels-at-rounded-inputs

Prints one JSON line per check and 'SMOKE OK' at the end; exits nonzero on
the first failure.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from gatv2_tpu.data.synthetic import random_graph
    from gatv2_tpu.ops.attention import _edge_attention_xla
    from gatv2_tpu.ops.pallas_attention import (
        edge_attention_pallas,
        edge_attention_pallas_merge,
        prepare_edge_tiles,
    )

    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev)}), flush=True)
    if dev.platform == "cpu":
        print("WARNING: running on CPU — this smoke only means something "
              "on the real chip", file=sys.stderr)

    g = random_graph(1000, 12000, 8, 4, seed=5)
    pe = g.padded_edges(128)
    src, dst = jnp.asarray(pe.src), jnp.asarray(pe.dst)
    failures = 0

    def check(tag, h, d, *, num_chunks=1, precision="highest", tol=1e-4):
        nonlocal failures
        rng = np.random.default_rng(17)
        zs = jnp.asarray(rng.standard_normal((g.num_nodes, h, d)), jnp.float32)
        zd = jnp.asarray(rng.standard_normal((g.num_nodes, h, d)), jnp.float32)
        a = jnp.asarray(rng.standard_normal((h, d)), jnp.float32)
        et = prepare_edge_tiles(
            g.row_ptr, g.col_idx, g.num_nodes, num_chunks=num_chunks
        )

        def loss_pl(zs, zd, a):
            return jnp.sum(jnp.sin(edge_attention_pallas(
                zs, zd, a, None, None, g.num_nodes, negative_slope=0.2,
                edge_tiles=et, precision=precision,
            )))

        def loss_xla(zs, zd, a):
            return jnp.sum(jnp.sin(_edge_attention_xla(
                zs, zd, a, src, dst, g.num_nodes, negative_slope=0.2,
            )))

        try:
            v_pl, g_pl = jax.jit(jax.value_and_grad(
                loss_pl, argnums=(0, 1, 2)))(zs, zd, a)
            v_x, g_x = jax.jit(jax.value_and_grad(
                loss_xla, argnums=(0, 1, 2)))(zs, zd, a)
            errs = []
            for p, x in zip(g_pl, g_x):
                p, x = np.asarray(p), np.asarray(x)
                errs.append(float(np.abs(p - x).max() /
                                  (np.abs(x).max() + 1e-12)))
            verr = abs(float(v_pl) - float(v_x)) / (abs(float(v_x)) + 1e-12)
            ok = verr < tol and all(e < tol for e in errs)
            print(json.dumps({
                "check": tag, "ok": bool(ok), "val_rel_err": verr,
                "grad_rel_errs": errs,
            }), flush=True)
            if not ok:
                failures += 1
        except Exception as e:  # lowering/runtime failure: report and go on
            print(json.dumps({
                "check": tag, "ok": False,
                "error": f"{type(e).__name__}: {str(e)[:400]}",
            }), flush=True)
            failures += 1

    check("unchunked_h4d64", 4, 64)
    check("chunked3_h4d64", 4, 64, num_chunks=3)
    check("high_precision_h4d64", 4, 64, precision="high", tol=3e-4)
    check("heads17_group_split", 17, 8)

    from gatv2_tpu.ops.sell_attention import (
        prepare_sell_tiles,
        sell_attention,
    )

    def check_sell(tag, h, d, *, precision="highest", tol=1e-4):
        nonlocal failures
        rng = np.random.default_rng(31)
        zs = jnp.asarray(rng.standard_normal((g.num_nodes, h, d)), jnp.float32)
        zd = jnp.asarray(rng.standard_normal((g.num_nodes, h, d)), jnp.float32)
        a = jnp.asarray(rng.standard_normal((h, d)), jnp.float32)
        st = prepare_sell_tiles(g.row_ptr, g.col_idx, g.num_nodes)

        def loss_sl(zs, zd, a):
            return jnp.sum(jnp.sin(sell_attention(
                zs, zd, a, None, None, g.num_nodes, negative_slope=0.2,
                sell_tiles=st, precision=precision,
            )))

        def loss_xla(zs, zd, a):
            return jnp.sum(jnp.sin(_edge_attention_xla(
                zs, zd, a, src, dst, g.num_nodes, negative_slope=0.2,
            )))

        try:
            v_s, g_s = jax.jit(jax.value_and_grad(
                loss_sl, argnums=(0, 1, 2)))(zs, zd, a)
            v_x, g_x = jax.jit(jax.value_and_grad(
                loss_xla, argnums=(0, 1, 2)))(zs, zd, a)
            errs = []
            for p, x in zip(g_s, g_x):
                p, x = np.asarray(p), np.asarray(x)
                errs.append(float(np.abs(p - x).max() /
                                  (np.abs(x).max() + 1e-12)))
            verr = abs(float(v_s) - float(v_x)) / (abs(float(v_x)) + 1e-12)
            ok = verr < tol and all(e < tol for e in errs)
            print(json.dumps({
                "check": tag, "ok": bool(ok), "val_rel_err": verr,
                "grad_rel_errs": errs,
            }), flush=True)
            if not ok:
                failures += 1
        except Exception as e:
            print(json.dumps({
                "check": tag, "ok": False,
                "error": f"{type(e).__name__}: {str(e)[:400]}",
            }), flush=True)
            failures += 1

    check_sell("sell_h4d64", 4, 64)
    check_sell("sell_lanepad_h2d60", 2, 60)
    check_sell("sell_high_precision", 4, 64, precision="high", tol=3e-4)

    # streams='bf16' (bf16 DMA tiles + upcasts on real Mosaic): contract is
    # exact-kernels-at-bf16-rounded-inputs (tests/test_sell.py), checked for
    # both chunk modes
    def check_sell_bf16(tag, *, num_chunks=1):
        nonlocal failures
        rng = np.random.default_rng(37)
        h, d = 4, 64
        zs = jnp.asarray(rng.standard_normal((g.num_nodes, h, d)), jnp.float32)
        zd = jnp.asarray(rng.standard_normal((g.num_nodes, h, d)), jnp.float32)
        a = jnp.asarray(rng.standard_normal((h, d)), jnp.float32)
        zs_r = zs.astype(jnp.bfloat16).astype(jnp.float32)
        zd_r = zd.astype(jnp.bfloat16).astype(jnp.float32)
        st = prepare_sell_tiles(
            g.row_ptr, g.col_idx, g.num_nodes, num_chunks=num_chunks
        )

        def mk(streams):
            def loss(zs_, zd_, a_):
                return jnp.sum(jnp.sin(sell_attention(
                    zs_, zd_, a_, None, None, g.num_nodes,
                    negative_slope=0.2, sell_tiles=st, streams=streams,
                )))
            return loss

        try:
            v_b, g_b = jax.jit(jax.value_and_grad(
                mk("bf16"), argnums=(0, 1, 2)))(zs, zd, a)
            v_e, g_e = jax.jit(jax.value_and_grad(
                mk("f32"), argnums=(0, 1, 2)))(zs_r, zd_r, a)
            errs = []
            for p, x in zip(g_b, g_e):
                p, x = np.asarray(p), np.asarray(x)
                errs.append(float(np.abs(p - x).max() /
                                  (np.abs(x).max() + 1e-12)))
            verr = abs(float(v_b) - float(v_e)) / (abs(float(v_e)) + 1e-12)
            ok = verr < 1e-4 and all(e < 1e-2 for e in errs)
            print(json.dumps({
                "check": tag, "ok": bool(ok), "val_rel_err": verr,
                "grad_rel_errs": errs,
            }), flush=True)
            if not ok:
                failures += 1
        except Exception as e:
            print(json.dumps({
                "check": tag, "ok": False,
                "error": f"{type(e).__name__}: {str(e)[:400]}",
            }), flush=True)
            failures += 1

    check_sell_bf16("sell_bf16_streams_unchunked")
    check_sell_bf16("sell_bf16_streams_chunked3", num_chunks=3)

    # SELL merge path (the halo-overlap building block): 2 edge subsets
    try:
        from gatv2_tpu.ops.sell_attention import sell_attention_merge

        rng = np.random.default_rng(29)
        h, d = 2, 32
        zs = jnp.asarray(rng.standard_normal((g.num_nodes, h, d)), jnp.float32)
        zd = jnp.asarray(rng.standard_normal((g.num_nodes, h, d)), jnp.float32)
        a = jnp.asarray(rng.standard_normal((h, d)), jnp.float32)
        cut = g.num_edges // 2
        sts = []
        for piece in (slice(0, cut), slice(cut, g.num_edges)):
            dsts = g.dst[piece]
            srcs = g.col_idx[piece]
            counts = np.bincount(dsts, minlength=g.num_nodes)
            rp = np.zeros(g.num_nodes + 1, np.int64)
            np.cumsum(counts, out=rp[1:])
            order = np.argsort(dsts, kind="stable")
            sts.append(prepare_sell_tiles(
                rp, srcs[order], g.num_nodes, num_src_nodes=g.num_nodes,
            ))

        def loss_m(zs, zd, a):
            return jnp.sum(jnp.sin(sell_attention_merge(
                (zs, zs), zd, a, g.num_nodes, negative_slope=0.2,
                sell_tiles_parts=sts,
            )))

        def loss_x(zs, zd, a):
            return jnp.sum(jnp.sin(_edge_attention_xla(
                zs, zd, a, src, dst, g.num_nodes, negative_slope=0.2,
            )))

        v_m, gm = jax.jit(jax.value_and_grad(loss_m, argnums=(1, 2)))(
            zs, zd, a)
        v_x, gx = jax.jit(jax.value_and_grad(loss_x, argnums=(1, 2)))(
            zs, zd, a)
        verr = abs(float(v_m) - float(v_x)) / (abs(float(v_x)) + 1e-12)
        errs = [
            float(np.abs(np.asarray(p) - np.asarray(x)).max()
                  / (np.abs(np.asarray(x)).max() + 1e-12))
            for p, x in zip(gm, gx)
        ]
        ok = verr < 1e-4 and all(e < 1e-4 for e in errs)
        print(json.dumps({
            "check": "sell_merge_2part", "ok": bool(ok),
            "val_rel_err": verr, "grad_rel_errs": errs,
        }), flush=True)
        if not ok:
            failures += 1
    except Exception as e:
        print(json.dumps({
            "check": "sell_merge_2part", "ok": False,
            "error": f"{type(e).__name__}: {str(e)[:400]}",
        }), flush=True)
        failures += 1

    # merge path (the halo-overlap building block): split edges in two
    try:
        rng = np.random.default_rng(23)
        h, d = 2, 32
        zs = jnp.asarray(rng.standard_normal((g.num_nodes, h, d)), jnp.float32)
        zd = jnp.asarray(rng.standard_normal((g.num_nodes, h, d)), jnp.float32)
        a = jnp.asarray(rng.standard_normal((h, d)), jnp.float32)
        cut = g.num_edges // 2
        ets = []
        for piece in (slice(0, cut), slice(cut, g.num_edges)):
            dsts = g.dst[piece]
            srcs = g.col_idx[piece]
            counts = np.bincount(dsts, minlength=g.num_nodes)
            rp = np.zeros(g.num_nodes + 1, np.int64)
            np.cumsum(counts, out=rp[1:])
            order = np.argsort(dsts, kind="stable")
            ets.append(prepare_edge_tiles(
                rp, srcs[order], g.num_nodes,
                num_src_nodes=g.num_nodes,
            ))

        def loss_merge(zs, zd, a):
            return jnp.sum(jnp.sin(edge_attention_pallas_merge(
                (zs, zs), zd, a, g.num_nodes, negative_slope=0.2,
                edge_tiles_parts=ets,
            )))

        def loss_xla2(zs, zd, a):
            return jnp.sum(jnp.sin(_edge_attention_xla(
                zs, zd, a, src, dst, g.num_nodes, negative_slope=0.2,
            )))

        v_m, gm = jax.jit(jax.value_and_grad(loss_merge, argnums=(1, 2)))(
            zs, zd, a)
        v_x, gx = jax.jit(jax.value_and_grad(loss_xla2, argnums=(1, 2)))(
            zs, zd, a)
        verr = abs(float(v_m) - float(v_x)) / (abs(float(v_x)) + 1e-12)
        errs = [
            float(np.abs(np.asarray(p) - np.asarray(x)).max()
                  / (np.abs(np.asarray(x)).max() + 1e-12))
            for p, x in zip(gm, gx)
        ]
        ok = verr < 1e-4 and all(e < 1e-4 for e in errs)
        print(json.dumps({
            "check": "merge_2part", "ok": bool(ok), "val_rel_err": verr,
            "grad_rel_errs": errs,
        }), flush=True)
        if not ok:
            failures += 1
    except Exception as e:
        print(json.dumps({
            "check": "merge_2part", "ok": False,
            "error": f"{type(e).__name__}: {str(e)[:400]}",
        }), flush=True)
        failures += 1

    if failures:
        print(f"SMOKE FAILED ({failures} checks)", flush=True)
        return 1
    print("SMOKE OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
