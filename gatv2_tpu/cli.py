"""Command-line interface with full parity to the reference's flag surface.

Reference CLI (README.md:85-104; parser at GATv2_edge_based.cu:936-1073):
  --num-layers L          (default 2)
  --heads h1,...,hL
  --outdims d1,...,dL
  --epochs N              (default 200)
  --optimizer sgd|adam    (default sgd)
  --beta1 B1 --beta2 B2   (defaults 0.9 / 0.999; error if outside (0,1) for
                           adam, warning that they're ignored for sgd)
  --lr A                  (default 1e-4)
  --clip                  (flag; fixed threshold 5.0)
  --dataset NAME          (default pubmed)
  --data-root PATH        (default ./data; env DATA_ROOT fallback)

Improvements over the reference (documented, intentional):
  - parsing is order-INsensitive (the reference requires --num-layers before
    --heads/--outdims, README.md:136-140);
  - extra framework flags: --impl, --variant, --seed, --log-file,
    --checkpoint-dir, --checkpoint-every, --resume, --mesh.
"""

from __future__ import annotations

import argparse
import os
import sys

from gatv2_tpu.config import ModelConfig, TrainConfig


def _resolve_impl(args) -> str:
    """Resolve --impl auto to the measured winner for the selected mode.

    Round-3/4 A/B on TPU v5e (SWEEP_R3/R4.jsonl): the SELL-layout
    kernels beat the streamed-operand pallas kernels on every full-graph
    config from pubmed scale up (1.9x at 44k edges, 1.8x at arxiv
    105 vs 190 ms, ~2x at products-full) and tie within dispatch noise
    on the sub-2ms tiny configs — there is no measured crossover below
    which pallas wins full-graph, so full-graph on an accelerator ->
    sell. Minibatch SELL exists (--impl sell --batch-size; per-batch
    fixed-geometry layouts, ops/sell_attention.sell_minibatch_geometry)
    but auto stays on the measured winner pallas until an A/B says
    otherwise (tools/bench_minibatch.py --impl sell). CPU has no Mosaic
    backend (kernels would run interpret-mode, far slower than XLA's
    fused scatter path) -> xla."""
    if args.impl != "auto":
        return args.impl
    if args.batch_size > 0:
        return "pallas"
    import jax

    return "sell" if jax.default_backend() != "cpu" else "xla"


def _int_list(s: str) -> list[int]:
    try:
        return [int(v) for v in s.split(",") if v != ""]
    except ValueError:
        raise argparse.ArgumentTypeError(f"expected comma-separated ints, got {s!r}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gatv2-tpu",
        description="TPU-native GATv2 node-classification training",
    )
    p.add_argument("--num-layers", type=int, default=2)
    p.add_argument("--heads", type=_int_list, default=None)
    p.add_argument("--outdims", type=_int_list, default=None)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--optimizer", choices=["sgd", "adam"], default="sgd")
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.999)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--clip", action="store_true")
    p.add_argument("--dataset", type=str, default="pubmed")
    p.add_argument("--data-root", type=str, default=None)
    # framework extensions
    p.add_argument("--impl", choices=["xla", "pallas", "sell", "auto"],
                   default="auto",
                   help="attention/aggregation implementation (sell = the "
                        "degree-sorted sliced-ELLPACK kernels; full-graph, "
                        "--mesh, or --batch-size minibatch). "
                        "The default 'auto' picks the measured winner: "
                        "sell for full-graph on an accelerator, pallas "
                        "for minibatch, xla on CPU (A/B tables in "
                        "BENCH_SWEEP.md)")
    p.add_argument("--variant", choices=["edge", "node"], default="edge",
                   help="reference variant semantics (last-layer activation order)")
    p.add_argument("--precision", choices=["highest", "high", "default"], default="highest",
                   help="MXU matmul precision: true-f32 (parity), bf16x3 "
                        "(near-f32, ~2x faster), or bf16 (fastest)")
    p.add_argument("--streams", choices=["f32", "bf16"], default="f32",
                   help="SELL stream tier: f32 (exact, default) or bf16 — "
                        "projections rounded once + attention residuals "
                        "stored bfloat16 (all math and transport stay "
                        "f32; halved residual footprint). sell impl only; "
                        "--overlap's merge path stays f32")
    p.add_argument("--seed", type=int, default=None,
                   help="PRNG seed (default: time-based, like the reference)")
    p.add_argument("--log-file", type=str, default=None,
                   help="JSONL per-epoch metrics sink")
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard the graph over this many devices (0 = single)")
    p.add_argument("--batch-size", type=int, default=0,
                   help="minibatch mode: seed nodes per sampled subgraph "
                        "(0 = full-graph training, like the reference)")
    p.add_argument("--fanouts", type=_int_list, default=None,
                   help="per-layer neighbor-sampling fanouts for --batch-size "
                        "mode (default: 10 per layer)")
    p.add_argument("--sampler-engine", choices=["auto", "native", "python"],
                   default="auto", help="neighbor-sampler implementation")
    p.add_argument("--feature-residency", choices=["device", "host"],
                   default="device",
                   help="minibatch features: device-resident table with "
                        "on-chip row gather (default), or per-batch host "
                        "gather for feature matrices larger than HBM")
    p.add_argument("--sample-budget", choices=["auto", "worst", "probe"],
                   default="auto",
                   help="static-shape budget for sampled subgraphs: "
                        "worst-case capped at graph size (auto, exact), "
                        "uncapped worst case, or probe-batch sizing "
                        "(cuts padding compute on large graphs)")
    p.add_argument("--eval-mode", choices=["exact", "sampled"],
                   default="exact",
                   help="minibatch-mode test evaluation: 'exact' = one "
                        "full-graph forward (every node sees its full "
                        "in-neighborhood; deterministic, the reference's "
                        "all-nodes semantics), 'sampled' = fanout-sampled "
                        "subgraph inference (fast, stochastic)")
    p.add_argument("--split-fractions", type=str, default=None,
                   metavar="TR,VA,TE",
                   help="random train/val/test split, e.g. 0.6,0.2,0.2 "
                        "(mask files in the dataset dir take precedence; "
                        "default: train+report on ALL nodes, like the "
                        "reference)")
    p.add_argument("--split-seed", type=int, default=0)
    p.add_argument("--overlap", action="store_true",
                   help="with --mesh: two-pass local/halo attention "
                        "structured so the boundary all_to_all overlaps "
                        "local-edge compute (xla impl + boundary halo only)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize layers in the backward pass "
                        "(less HBM, ~30%% slower; for huge graphs)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (fail fast on NaN/Inf; the "
                        "TPU-native counterpart of the reference's per-launch "
                        "cudaGetLastError checks)")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="capture a jax.profiler trace of training into DIR")
    p.add_argument("--save-weights", type=str, default=None, metavar="DIR",
                   help="dump final weights as text (reference "
                        "save_array_to_file format) into DIR")
    p.add_argument("--load-weights", type=str, default=None, metavar="DIR",
                   help="initialize weights from a --save-weights dump")
    return p


def parse_args_from(
    parser: argparse.ArgumentParser, argv: list[str] | None = None
) -> tuple[ModelConfig, TrainConfig, argparse.Namespace]:
    """parse_args against an extended parser (e.g. predict.py's)."""
    return _finish(parser.parse_args(argv))


def parse_args(argv: list[str] | None = None) -> tuple[ModelConfig, TrainConfig, argparse.Namespace]:
    return _finish(build_parser().parse_args(argv))


def _finish(args: argparse.Namespace) -> tuple[ModelConfig, TrainConfig, argparse.Namespace]:

    if args.num_layers < 1:
        raise SystemExit(
            f"Error: --num-layers must be >= 1 (got {args.num_layers})."
        )
    # The reference leaves head[]/out_dim[] UNINITIALIZED when the flags are
    # absent (`new int[L]` + no default write, GATv2_edge_based.cu:954-986) —
    # undefined behavior. We define sane defaults instead: 1 head / 16 dims.
    heads = args.heads if args.heads is not None else [1] * args.num_layers
    outdims = args.outdims if args.outdims is not None else [16] * args.num_layers
    if len(heads) != args.num_layers:
        raise SystemExit(
            f"Error: --heads must have {args.num_layers} comma-separated values "
            f"(got {len(heads)})."
        )
    if len(outdims) != args.num_layers:
        raise SystemExit(
            f"Error: --outdims must have {args.num_layers} comma-separated values "
            f"(got {len(outdims)})."
        )

    impl = _resolve_impl(args)
    model_config = ModelConfig(
        num_layers=args.num_layers,
        heads=tuple(heads),
        out_dims=tuple(outdims),
        variant=args.variant,
        matmul_precision=args.precision,
        remat=args.remat,
        streams=args.streams,
    )
    if args.streams == "bf16" and impl != "sell":
        print(
            "Warning: --streams bf16 applies to the SELL kernels only; "
            f"impl={impl!r} runs exact f32 streams.", file=sys.stderr,
        )
    train_config = TrainConfig(
        epochs=args.epochs,
        optimizer=args.optimizer,
        lr=args.lr,
        beta1=args.beta1,
        beta2=args.beta2,
        clip=args.clip,
        seed=args.seed,
        dataset=args.dataset,
        # resolve the documented precedence HERE so train_config.data_root
        # is directly usable: --data-root flag, else DATA_ROOT env, else
        # ./data (reference GATv2_edge_based.cu:1050-1073)
        data_root=(
            args.data_root
            if args.data_root is not None
            else os.environ.get("DATA_ROOT", "./data")
        ),
        impl=impl,
        batch_size=args.batch_size,
        fanouts=tuple(args.fanouts) if args.fanouts is not None
        else tuple([10] * args.num_layers if args.batch_size > 0 else []),
        sampler_engine=args.sampler_engine,
        sample_budget=args.sample_budget,
        feature_residency=args.feature_residency,
        log_file=args.log_file,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume,
    )
    try:
        warnings = train_config.validate()
    except ValueError as e:
        raise SystemExit(str(e))
    for w in warnings:
        print(w, file=sys.stderr)
    return model_config, train_config, args


def echo_config(model_config: ModelConfig, train_config: TrainConfig) -> str:
    """Config echo in the reference's format (README.md:111-118)."""
    return (
        "Configuration:\n"
        f"  Number of layers: {model_config.num_layers}\n"
        f"  Epochs: {train_config.epochs}\n"
        f"  Attention heads: [{', '.join(map(str, model_config.heads))}]\n"
        f"  Output dimensions: [{', '.join(map(str, model_config.out_dims))}]\n"
        f"  Gradient clipping: {'true' if train_config.clip else 'false'}\n"
        f"  Optimizer: {train_config.optimizer}\n"
        f"  Learning rate: {train_config.lr:g}\n"
    )
