#!/usr/bin/env python
"""Capture a jax.profiler trace of bench epochs on the real chip and
aggregate device time per op — the measured roofline split VERDICT r3
task #3 asks for: how much of an epoch is Pallas kernel time vs XLA
gather/scatter traffic vs dense matmuls vs everything else.

Usage:
    python tools/profile_roofline.py --config arxiv --impl sell \
        [--precision highest] [--epochs 20] [--top 30] [--out trace_dir]

Prints a JSON summary (total device time, per-op-category split, top ops)
to stdout. The raw trace stays in --out for tensorboard inspection.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def capture(config, impl, precision, epochs, out_dir, tile_e=None):
    import jax
    import jax.numpy as jnp

    import bench
    from gatv2_tpu.config import ModelConfig, TrainConfig
    from gatv2_tpu.models.gatv2 import init_params
    from gatv2_tpu.train import optim
    from gatv2_tpu.train.loop import make_multi_epoch_runner

    n, e, f, c, layers, heads, outdims = bench.CONFIGS[config]
    g = bench._bench_graph(config, n, e, f, c, seed=0)
    mc = ModelConfig(
        num_layers=layers, heads=heads, out_dims=outdims, num_classes=c,
        in_dim=f, matmul_precision=precision, remat=(e >= 30_000_000),
    )
    tc = TrainConfig(optimizer="adam", lr=0.01, seed=0, impl=impl)
    edge_tiles = None
    num_valid = None
    feats_np, labels_np = g.features, g.labels
    if impl == "pallas":
        from gatv2_tpu.ops.pallas_attention import setup_full_graph

        edge_tiles, feats_np, labels_np, num_valid = setup_full_graph(
            g, heads, outdims, tile_e=tile_e)
    elif impl == "sell":
        from gatv2_tpu.ops.sell_attention import setup_full_graph_sell

        edge_tiles, feats_np, labels_np, num_valid = setup_full_graph_sell(
            g, heads, outdims)
    feats = jnp.asarray(feats_np)
    labels = jnp.asarray(labels_np)
    if impl in ("pallas", "sell"):
        src = dst = jnp.zeros(1, jnp.int32)
    else:
        pe = g.padded_edges(128)
        src, dst = jnp.asarray(pe.src), jnp.asarray(pe.dst)

    runner = make_multi_epoch_runner(
        mc, tc, epochs, edge_tiles=edge_tiles, num_valid=num_valid)

    def run_once():
        params = init_params(mc, jax.random.PRNGKey(0))
        opt_state = optim.init_opt_state(params, "adam")
        _, _, losses, _ = runner(
            params, opt_state, jnp.asarray(0, jnp.int32),
            feats, src, dst, labels)
        return float(losses[-1])

    run_once()  # compile outside the trace
    jax.profiler.start_trace(out_dir)
    run_once()
    jax.profiler.stop_trace()


_OPCODE_RE = None


def _opcode_and_lhs(name: str) -> tuple[str, str]:
    """Split an HLO instruction text into (opcode, lhs-name). The full
    text embeds OPERAND names ('%copy-done.26' as a fusion input), so
    categorizing on raw substrings misfiles ops; the opcode is the token
    right before the first '(' after '=' (skipping the output type,
    which may itself be a parenthesized tuple)."""
    global _OPCODE_RE
    import re

    if _OPCODE_RE is None:
        _OPCODE_RE = re.compile(
            r"=\s*(?:\([^=]*?\)|\S+)\s+([a-z][a-z0-9-]*)\("
        )
    lhs = name.split(" = ", 1)[0].lstrip("%")
    m = _OPCODE_RE.search(name)
    return (m.group(1) if m else ""), lhs


def categorize(name: str) -> str:
    op, lhs = _opcode_and_lhs(name)
    lhs_l = lhs.lower()
    if op == "custom-call" or "pallas" in lhs_l:
        return "pallas_kernel"
    if op in ("all-reduce", "all-gather", "all-to-all", "reduce-scatter",
              "collective-permute"):
        return "collective"
    if op in ("gather", "dynamic-slice"):
        return "gather_slice"
    if op in ("scatter", "dynamic-update-slice"):
        return "scatter_update"
    if op in ("dot", "convolution"):
        return "dense_matmul"
    if op in ("copy", "copy-start", "copy-done", "transpose", "reshape",
              "bitcast", "pad", "slice", "concatenate"):
        return "layout_copy"
    if op == "fusion":
        # gather fusions (XLA row-gathers feeding the kernels) carry a
        # clamped s32 index operand — detect via the operand text; the
        # lhs name itself is anonymous (%fusion.N)
        if "gather" in lhs_l or "pad_clamp_fusion" in name.lower():
            return "gather_slice"
        if "scatter" in lhs_l:
            return "scatter_update"
        return "fusion_elementwise"
    if op in ("while", "conditional", "call"):
        return "control_flow"
    return "other"


def summarize(out_dir: str, top: int):
    # xplane protobuf -> per-op device duration, via tensorflow's
    # generated proto (no TF runtime work, just parsing).
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{out_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {out_dir}")
    path = max(paths, key=lambda p: pathlib.Path(p).stat().st_mtime)
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(pathlib.Path(path).read_bytes())

    def line_events(line, ev_meta):
        return sorted(
            ((ev.offset_ps, ev.duration_ps, ev_meta[ev.metadata_id].name)
             for ev in line.events),
            key=lambda t: (t[0], -t[1]),
        )

    def self_times(events):
        """Nesting-aware self time per op: events on an XLA Ops line nest
        (a `while` spans its whole body), so each op's self time is its
        duration minus the durations of events directly nested inside it
        — a stack sweep over (offset, duration)-sorted events."""
        per_op: dict[str, float] = {}
        stack: list[list] = []  # [start, end, name, child_cover]
        def pop_one():
            s, e, nm, cover = stack.pop()
            self_ps = max(0.0, (e - s) - cover)
            per_op[nm] = per_op.get(nm, 0.0) + self_ps
            if stack:
                stack[-1][3] += e - s
        for off, dur, name in events:
            while stack and off >= stack[-1][1]:
                pop_one()
            stack.append([off, off + dur, name, 0.0])
        while stack:
            pop_one()
        return per_op

    per_op: dict[str, float] = {}
    async_op: dict[str, float] = {}
    module_ms = 0.0
    for plane in xspace.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name == "XLA Ops":
                for nm, ps in self_times(line_events(line, ev_meta)).items():
                    per_op[nm] = per_op.get(nm, 0.0) + ps / 1e9
            elif line.name == "Async XLA Ops":
                for ev in line.events:
                    nm = ev_meta[ev.metadata_id].name
                    async_op[nm] = async_op.get(nm, 0.0) \
                        + ev.duration_ps / 1e9
            elif line.name == "XLA Modules":
                module_ms += sum(e.duration_ps for e in line.events) / 1e9

    total_ms = sum(per_op.values())
    cats: dict[str, float] = {}
    for name, ms in per_op.items():
        cats[categorize(name)] = cats.get(categorize(name), 0.0) + ms
    top_ops = sorted(per_op.items(), key=lambda kv: -kv[1])[:top]
    top_async = sorted(async_op.items(), key=lambda kv: -kv[1])[:10]
    return {
        "xplane": path,
        "device_total_ms": round(total_ms, 3),
        "module_total_ms": round(module_ms, 3),
        "async_copy_total_ms": round(sum(async_op.values()), 3),
        "categories_ms": {k: round(v, 3)
                          for k, v in sorted(cats.items(),
                                             key=lambda kv: -kv[1])},
        "categories_pct": {k: round(v / total_ms * 100, 1)
                           for k, v in sorted(cats.items(),
                                              key=lambda kv: -kv[1])},
        "top_ops": [
            {"op": n[:160], "ms": round(ms, 3),
             "pct": round(ms / total_ms * 100, 1), "cat": categorize(n)}
            for n, ms in top_ops
        ],
        "top_async_ops": [
            {"op": n[:160], "ms": round(ms, 3)} for n, ms in top_async
        ],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="arxiv")
    ap.add_argument("--impl", default="sell")
    ap.add_argument("--precision", default="highest")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--tile-e", type=int, default=None)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default=None)
    ap.add_argument("--parse-only", action="store_true",
                    help="skip capture; summarize an existing --out dir")
    args = ap.parse_args()
    out_dir = args.out or f"/tmp/roofline_{args.config}_{args.impl}"
    if not args.parse_only:
        capture(args.config, args.impl, args.precision, args.epochs,
                out_dir, tile_e=args.tile_e)
    s = summarize(out_dir, args.top)
    s["config"] = args.config
    s["impl"] = args.impl
    s["precision"] = args.precision
    s["epochs_traced"] = args.epochs
    print(json.dumps(s, indent=1))


if __name__ == "__main__":
    main()
