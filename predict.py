#!/usr/bin/env python
"""Inference entry point: load trained weights, write per-node predictions.

The reference has no inference path at all (training prints train-set
accuracy and exits). This runs the forward pass once (full-graph) and
writes `predictions.txt` (one predicted label per node) and optionally
`probs.txt` (softmax rows), using either a text weight dump
(--load-weights, reference debug format) or a checkpoint directory
(--checkpoint-dir).

Example:
    python train.py   --dataset citeseer --epochs 200 --optimizer adam \
        --lr 0.01 --save-weights w/
    python predict.py --dataset citeseer --load-weights w/ \
        --num-layers 2 --heads 1,1 --outdims 16,16 --out preds/
"""

from __future__ import annotations

import dataclasses
import pathlib
import sys

import numpy as np


def main(argv: list[str] | None = None) -> int:
    import os

    import jax

    if os.environ.get("GATV2_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["GATV2_PLATFORM"])
    import jax.numpy as jnp

    from gatv2_tpu import cli
    from gatv2_tpu.data.io import load_dataset
    from gatv2_tpu.models.gatv2 import model_forward
    from gatv2_tpu.models.params_io import load_params_txt

    p = cli.build_parser()
    p.add_argument("--out", type=str, default="predictions",
                   help="output directory")
    p.add_argument("--save-probs", action="store_true",
                   help="also write softmax probabilities (N x C floats)")
    model_config, train_config, args = cli.parse_args_from(p, argv)

    graph = load_dataset(train_config.dataset, train_config.data_root)
    model_config = dataclasses.replace(
        model_config, num_classes=graph.num_classes, in_dim=graph.feature_dim
    )

    if args.load_weights:
        params = load_params_txt(args.load_weights, model_config)
    elif args.checkpoint_dir:
        from gatv2_tpu.models.gatv2 import init_params
        from gatv2_tpu.train import checkpoint as ckpt

        path = ckpt.latest_path(args.checkpoint_dir)
        if path is None:
            raise SystemExit(f"no checkpoint found in {args.checkpoint_dir}")
        # shapes can coincide while semantics differ (edge vs node variant
        # have identical params): compare the stored model fingerprint
        import json

        stored = ckpt.read_meta(path).get("model_config")
        # JSON round-trip the current fingerprint too (tuples -> lists), so
        # the comparison is apples-to-apples with the stored one
        want = json.loads(json.dumps(ckpt.run_meta(model_config).get(
            "model_config"), default=str))
        if stored is not None and stored != want:
            diffs = [
                f"{k}: stored={stored.get(k)!r} current={want.get(k)!r}"
                for k in sorted(set(stored) | set(want))
                if stored.get(k) != want.get(k)
            ]
            raise SystemExit(
                "Error: checkpoint was trained with a different model "
                "configuration:\n  " + "\n  ".join(diffs)
            )
        template = init_params(model_config, jax.random.PRNGKey(0))
        params, _, epoch = ckpt.restore(path, template, {})
        print(f"Loaded checkpoint at epoch {epoch}")
    else:
        raise SystemExit("one of --load-weights / --checkpoint-dir is required")

    edge_tiles = None
    num_nodes = graph.num_nodes
    feats = graph.features
    if train_config.impl == "pallas":
        from gatv2_tpu.ops.pallas_attention import setup_full_graph

        edge_tiles, feats, _, _ = setup_full_graph(
            graph, model_config.heads, model_config.out_dims
        )
        src = jnp.zeros(1, jnp.int32)
        dst = jnp.zeros(1, jnp.int32)
    elif train_config.impl == "sell":
        from gatv2_tpu.ops.sell_attention import setup_full_graph_sell

        edge_tiles, feats, _, _ = setup_full_graph_sell(
            graph, model_config.heads, model_config.out_dims
        )
        src = jnp.zeros(1, jnp.int32)
        dst = jnp.zeros(1, jnp.int32)
    else:
        pe = graph.padded_edges(128)
        src = jnp.asarray(pe.src)
        dst = jnp.asarray(pe.dst)

    @jax.jit
    def forward(params, feats, src, dst, et):
        return model_forward(
            params, feats, src, dst, model_config,
            impl=train_config.impl, edge_tiles=et,
        )

    logits = forward(params, jnp.asarray(feats), src, dst, edge_tiles)[:num_nodes]
    preds = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int64)

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "predictions.txt", "w") as f:
        f.write(" ".join(map(str, preds)))
    if args.save_probs:
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        np.savetxt(out / "probs.txt", probs, fmt="%.6g")
    acc = float((preds == graph.labels).mean())
    print(
        f"Wrote {out}/predictions.txt ({num_nodes} nodes); "
        f"accuracy vs labels: {acc * 100:.2f}%"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
