"""Minimal reproducer / bisector for the SELL + --precision high TPU fault.

Round-3 sweep leg `arxiv-sell-high` crashed the TPU worker ("kernel
fault") while `tools/tpu_smoke.py sell_high_precision` passes at toy
scale (N=600). This script runs ONE fwd+bwd of the SELL kernels at a
given (nodes, edges) under a given precision and prints OK/loss —
meant to be run in a subprocess under `timeout` from the host shell,
one scale per process, so a worker crash kills only that probe.

Usage:
    timeout 300 python tools/bisect_sell_high.py --nodes 20000 \
        --edges 140000 --precision high [--heads 4 --dim 64] [--fwd-only]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, required=True)
    ap.add_argument("--edges", type=int, required=True)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--precision", default="high",
                    choices=["highest", "high", "default"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--powerlaw", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gatv2_tpu.data.synthetic import powerlaw_graph, random_graph
    from gatv2_tpu.ops.sell_attention import (
        prepare_sell_tiles,
        sell_attention,
    )

    gen = powerlaw_graph if args.powerlaw else random_graph
    kw = {"alpha": 1.2} if args.powerlaw else {}
    g = gen(args.nodes, args.edges, 8, 4, seed=args.seed, **kw)
    h, d = args.heads, args.dim
    rng = np.random.default_rng(args.seed + 7)
    zs = jnp.asarray(rng.standard_normal((g.num_nodes, h, d)), jnp.float32)
    zd = jnp.asarray(rng.standard_normal((g.num_nodes, h, d)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((h, d)), jnp.float32)
    st = prepare_sell_tiles(g.row_ptr, g.col_idx, g.num_nodes)
    print(f"layout: e_ell={st.e_ell} e2_ell={st.e2_ell} "
          f"dst_tiles={st.num_dst_tiles} chunks={st.num_chunks}", flush=True)

    def loss(zs, zd, a):
        return jnp.sum(jnp.sin(sell_attention(
            zs, zd, a, None, None, g.num_nodes, negative_slope=0.2,
            sell_tiles=st, precision=args.precision,
        )))

    if args.fwd_only:
        v = jax.jit(loss)(zs, zd, a)
        print(f"OK fwd loss={float(v):.6f}", flush=True)
    else:
        v, grads = jax.jit(
            jax.value_and_grad(loss, argnums=(0, 1, 2)))(zs, zd, a)
        gn = [float(jnp.abs(x).max()) for x in grads]
        print(f"OK fwd+bwd loss={float(v):.6f} gmax={gn}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
