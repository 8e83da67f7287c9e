#!/usr/bin/env python
"""Measure the products-full-4h sharding plan at real scale, host-side.

SCALING.md §5 argues the reference's 4-head full-Products config
(N=2,449,029, E=61,859,140, heads (4,1,1)) fits 2x 16 GB chips; the halo
fraction phi there was assumed. This tool builds a community-structured
synthetic at the REAL scale (communities as contiguous id blocks, like a
clustered real-graph ordering; --p-local intra-community edge probability),
runs the actual partitioner + halo planner, and prints the MEASURED
per-shard numbers the plan depends on:

  - edge balance across shards (max/min)
  - halo rows per shard and phi = exchanged rows / N
  - boundary-exchange vs all_gather bytes per layer
  - the per-shard HBM table of SCALING.md §5 with the measured phi

No device needed — everything is numpy on the host. ~62M-edge arrays need
~8 GB RAM. Reference catalog entry: /root/reference/README.md:40-43.

Usage: python tools/plan_products_4h.py [--shards 2 4] [--p-local 0.9]
       [--scale 1.0]   (scale < 1 shrinks N and E for a quick check)
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

N_FULL = 2_449_029
E_FULL = 61_859_140
F_IN = 100
HEADS = (4, 1, 1)
OUTDIMS = (64, 32, 16)
COMMUNITIES = 16


def build_graph(n: int, e: int, p_local: float, seed: int = 0):
    """dst-CSR community graph: node ids are contiguous per community (the
    clustered ordering a real preprocessed Products graph would have)."""
    rng = np.random.default_rng(seed)
    comm_of = lambda ids: ids * COMMUNITIES // n  # noqa: E731
    comm_lo = np.arange(COMMUNITIES) * n // COMMUNITIES
    comm_hi = np.arange(1, COMMUNITIES + 1) * n // COMMUNITIES

    dst = np.sort(rng.integers(0, n, e).astype(np.int64), kind="stable")
    local = rng.random(e) < p_local
    c = comm_of(dst)
    span = (comm_hi - comm_lo)[c]
    src_local = comm_lo[c] + (rng.random(e) * span).astype(np.int64)
    src_global = rng.integers(0, n, e)
    src = np.where(local, src_local, src_global).astype(np.int64)

    counts = np.bincount(dst, minlength=n)
    row_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=row_ptr[1:])

    from gatv2_tpu.data.graph import Graph

    return Graph(
        features=np.zeros((n, 1), np.float32),  # placeholder; sizes are analytic
        row_ptr=row_ptr,
        col_idx=src.astype(np.int32),
        labels=np.zeros(n, np.int32),
    )


def hbm_table(n, e, s, phi, halo_disabled):
    """SCALING.md §5 per-shard HBM components (bytes), 4-head config."""
    nps = -(-n // s)
    hd0 = 256  # 4 heads x 64, lane width
    gather_rows = n - nps if halo_disabled else int(phi * n)
    budget = 2 << 30  # suggest_num_chunks budget at this scale
    rows = {
        "features [nps, 100] f32": nps * F_IN * 4,
        "edge-tile int streams (~24 B/edge)": (e // s) * 24,
        "zs_loc + zd_loc [nps, 256] x2": nps * hd0 * 4 * 2,
        f"gather space [{'(S-1)/S * N' if halo_disabled else 'phi*N'}, 256]":
            gather_rows * hd0 * 4,
        "out [nps, 256]": nps * hd0 * 4,
        "softmax residuals (16 lanes x2)": nps * 16 * 4 * 2,
        "chunked edge streams (budget)": budget,
    }
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--p-local", type=float, default=0.9)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    n = int(N_FULL * args.scale)
    e = int(E_FULL * args.scale)
    print(f"building community graph: N={n:,} E={e:,} "
          f"p_local={args.p_local} communities={COMMUNITIES}",
          file=sys.stderr, flush=True)
    g = build_graph(n, e, args.p_local, args.seed)

    from gatv2_tpu.parallel.partition import halo_exchange_plan, partition_graph

    for s in args.shards:
        pg = partition_graph(g, s)
        print(f"\n== {s} shards ==")
        print(f"balance: {pg.balance_report()}")
        plan = halo_exchange_plan(pg)
        disabled = plan.halo_size >= pg.padded_num_nodes
        phi = plan.halo_size / n
        print(f"halo rows/shard: {plan.halo_size:,} (m_per_pair "
              f"{plan.m_per_pair:,}) -> phi = {phi:.4f}"
              + ("  [>= all_gather; dense fallback]" if disabled else ""))
        rows_ag = pg.padded_num_nodes - pg.nodes_per_shard
        for l, (h, d) in enumerate(zip(HEADS, OUTDIMS)):
            hd = h * d
            ag_mb = rows_ag * hd * 4 / 1e6
            halo_mb = (s - 1) * plan.m_per_pair * hd * 4 / 1e6
            print(f"layer {l}: all_gather {ag_mb:,.1f} MB/chip vs "
                  f"boundary {halo_mb:,.1f} MB/chip "
                  f"({halo_mb / max(ag_mb, 1e-9):.2%})")
        total = 0
        print("per-shard HBM (4-head config, measured phi):")
        for k, v in hbm_table(n, e, s, phi, disabled).items():
            total += v
            print(f"  {k:<44} {v / 1e9:6.2f} GB")
        print(f"  {'TOTAL (one layer live, per-layer remat)':<44} "
              f"{total / 1e9:6.2f} GB  (chip HBM: 16 GB v5e)")


if __name__ == "__main__":
    main()
