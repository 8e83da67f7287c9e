#!/usr/bin/env python
"""Training entry point — the counterpart of the reference's `./train_node` /
`./train_edge` executables (GATv2_edge_based.cu:927 `main`).

Example (mirrors README.md:107):
    python train.py --num-layers 3 --heads 4,1,1 --outdims 64,32,16 \
        --epochs 200 --optimizer adam --beta1 0.9 --beta2 0.999 --lr 0.01 \
        --clip --dataset citeseer --data-root /data/graphs
"""

from __future__ import annotations

import dataclasses
import sys

import jax


def main(argv: list[str] | None = None) -> int:
    from gatv2_tpu import cli
    from gatv2_tpu.data.io import load_dataset, resolve_dataset_dir
    from gatv2_tpu.train.loop import Trainer
    from gatv2_tpu.train import checkpoint as ckpt
    from gatv2_tpu.utils.metrics import JsonlSink, device_memory_report

    import os

    if os.environ.get("GATV2_PLATFORM"):
        # honored before first device touch; env JAX_PLATFORMS alone can be
        # overridden by a sitecustomize pinning a hardware backend
        jax.config.update("jax_platforms", os.environ["GATV2_PLATFORM"])

    model_config, train_config, args = cli.parse_args(argv)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    print(cli.echo_config(model_config, train_config))
    data_root = train_config.data_root  # precedence resolved by the CLI
    dataset_dir = resolve_dataset_dir(train_config.dataset, data_root)
    print(f"Using dataset: {train_config.dataset}")
    print(f"Dataset path: {dataset_dir}/")

    graph = load_dataset(train_config.dataset, data_root)
    model_config = dataclasses.replace(
        model_config, num_classes=graph.num_classes, in_dim=graph.feature_dim
    )
    print(f"Max degree = {graph.max_degree}")
    print(f"Number of classes = {graph.num_classes}")
    print(
        f"Graph loaded: {graph.num_nodes} nodes, {graph.num_edges} edges, "
        f"input_feature_vector_dim = {graph.feature_dim}"
    )
    mem_before = device_memory_report()

    from gatv2_tpu.data.splits import load_split_files, random_splits

    splits = load_split_files(dataset_dir, graph.num_nodes)
    if splits is not None:
        print("Using split masks from dataset directory")
    elif args.split_fractions:
        fr = tuple(float(v) for v in args.split_fractions.split(","))
        splits = random_splits(graph.num_nodes, fr, seed=args.split_seed)
    if splits is not None:
        tr, va, te = splits.counts
        print(f"Split: {tr} train / {va} val / {te} test nodes")

    sink = JsonlSink(train_config.log_file) if train_config.log_file else None
    if args.mesh > 0 and train_config.batch_size > 0:
        from gatv2_tpu.train.minibatch import DataParallelMinibatchTrainer

        if args.overlap:
            print(
                "Warning: --overlap applies to full-graph --mesh training "
                "only; ignored in data-parallel minibatch mode (sampled "
                "subgraphs are device-local, there is no halo exchange).",
                file=sys.stderr,
            )
        print(
            f"Data-parallel minibatch mode: {args.mesh} devices x "
            f"batch_size={train_config.batch_size}, "
            f"fanouts={list(train_config.fanouts)}"
        )
        trainer = DataParallelMinibatchTrainer(
            graph, model_config, train_config, args.mesh,
            metrics_sink=sink, splits=splits,
        )
    elif args.mesh > 0:
        from gatv2_tpu.parallel.sharded import ShardedTrainer

        print(f"Sharded mode: edge-partitioned over {args.mesh} devices")
        trainer = ShardedTrainer(
            graph, model_config, train_config, args.mesh, metrics_sink=sink,
            splits=splits, overlap=args.overlap,
        )
    elif train_config.batch_size > 0:
        from gatv2_tpu.train.minibatch import MinibatchTrainer

        if args.overlap:
            print("Warning: --overlap requires --mesh; ignored.",
                  file=sys.stderr)
        print(
            f"Minibatch mode: batch_size={train_config.batch_size}, "
            f"fanouts={list(train_config.fanouts)}, "
            f"sampler={train_config.sampler_engine}"
        )
        trainer = MinibatchTrainer(
            graph, model_config, train_config, metrics_sink=sink,
            splits=splits,
        )
    else:
        if args.overlap:
            print("Warning: --overlap requires --mesh; ignored.",
                  file=sys.stderr)
        trainer = Trainer(
            graph, model_config, train_config, metrics_sink=sink,
            splits=splits,
        )

    if train_config.resume and train_config.checkpoint_dir:
        if ckpt.restore_into(
            train_config.checkpoint_dir, trainer,
            expect_meta=ckpt.run_meta(model_config, train_config),
        ):
            print(f"Resumed from checkpoint at epoch {trainer.epoch}")
            if hasattr(trainer, "sync_step_count"):
                trainer.sync_step_count()

    mem_after = device_memory_report()
    for dev in mem_after:
        used = (mem_after[dev] - mem_before.get(dev, 0)) / 1e6
        print(f"Device memory allocated on {dev}: {used:.1f} MB")

    if args.load_weights:
        if train_config.resume:
            # loading fresh weights on top of a restored checkpoint would
            # silently pair them with the checkpoint's warm Adam moments and
            # epoch counter, corrupting the first updates
            raise SystemExit(
                "Error: --load-weights cannot be combined with --resume "
                "(the restored optimizer state/epoch belong to the "
                "checkpointed weights)."
            )
        from gatv2_tpu.models.params_io import load_params_txt

        trainer.params = load_params_txt(args.load_weights, model_config)
        print(f"Loaded weights from {args.load_weights}/")

    import contextlib

    with contextlib.ExitStack() as stack:
        if args.profile:
            stack.enter_context(jax.profiler.trace(args.profile))
            print(f"Profiling to {args.profile}/")

        remaining = train_config.epochs - trainer.epoch
        every = train_config.checkpoint_every
        if train_config.checkpoint_dir and every > 0:
            while trainer.epoch < train_config.epochs:
                n = min(every, train_config.epochs - trainer.epoch)
                trainer.run(n)
                ckpt.save(
                    train_config.checkpoint_dir,
                    trainer.params,
                    trainer.opt_state,
                    trainer.epoch,
                    meta=ckpt.run_meta(model_config, train_config),
                )
        elif remaining > 0:
            trainer.run(remaining)
            if train_config.checkpoint_dir:
                ckpt.save(
                    train_config.checkpoint_dir,
                    trainer.params,
                    trainer.opt_state,
                    trainer.epoch,
                    meta=ckpt.run_meta(model_config, train_config),
                )
    if splits is not None:
        if train_config.batch_size > 0:
            if (
                args.eval_mode == "exact"
                and train_config.feature_residency == "host"
            ):
                # --feature-residency host exists precisely because the
                # full feature table exceeds device memory; exact eval
                # would upload all of it for one full-graph forward
                print(
                    "Note: --eval-mode exact needs the full feature table "
                    "on device; with --feature-residency host falling back "
                    "to sampled evaluation"
                )
                acc = trainer.evaluate("test")
            elif args.eval_mode == "exact":
                # one deterministic full-graph forward — the reference's
                # all-nodes evaluation semantics (E:514-550); sampled eval
                # stays available via --eval-mode sampled
                acc = trainer.evaluate_exact()["test"]
            else:
                acc = trainer.evaluate("test")
            print(f"Final Test Accuracy: {acc * 100:.2f}%")
        else:
            accs = trainer.evaluate()
            print(f"Final Test Accuracy: {accs['test'] * 100:.2f}%")
    if args.save_weights:
        from gatv2_tpu.models.params_io import save_params_txt

        save_params_txt(args.save_weights, trainer.params)
        print(f"Saved weights to {args.save_weights}/")
    if sink is not None:
        sink.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
