#!/usr/bin/env python
"""Train the committed real datasets across implementations and record the
accuracy-parity table (ACCURACY.md).

Each (dataset, mode) cell runs in a subprocess so the backend can differ per
cell: xla/pallas run on the default backend (the real TPU chip when
tunneled), mesh-8 runs on an 8-virtual-device CPU mesh (the standard JAX way
to exercise the sharded path without a pod), dp runs data-parallel minibatch
on a 4-virtual-device CPU mesh.

Usage:
  python tools/run_accuracy.py            # full table -> ACCURACY.md
  python tools/run_accuracy.py --single dataset=digits mode=xla   # one cell
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

CONFIGS = {
    "karate": ["--num-layers", "2", "--heads", "2,2", "--outdims", "8,8",
               "--epochs", "200", "--optimizer", "adam", "--lr", "0.01",
               "--seed", "0"],
    "digits": ["--num-layers", "2", "--heads", "4,4", "--outdims", "16,16",
               "--epochs", "200", "--optimizer", "adam", "--lr", "0.01",
               "--seed", "0"],
}

MODES = {
    "xla": (["--impl", "xla"], {}),
    "pallas": (["--impl", "pallas"], {}),
    "sell": (["--impl", "sell"], {}),
    "mesh8-cpu": (
        ["--impl", "xla", "--mesh", "8"],
        {"GATV2_PLATFORM": "cpu",
         "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    ),
    "mesh8-pallas-cpu": (
        ["--impl", "pallas", "--mesh", "8"],
        {"GATV2_PLATFORM": "cpu",
         "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    ),
    "mesh8-sell-cpu": (
        ["--impl", "sell", "--mesh", "8"],
        {"GATV2_PLATFORM": "cpu",
         "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    ),
    "dp4-minibatch-cpu": (
        ["--impl", "xla", "--mesh", "4", "--batch-size", "128",
         "--fanouts", "10,10"],
        {"GATV2_PLATFORM": "cpu",
         "XLA_FLAGS": "--xla_force_host_platform_device_count=4"},
    ),
    # sampled-subgraph training on the default backend (TPU when tunneled):
    # per-batch fixed-shape tiles, exact full-graph test eval
    "minibatch-pallas": (
        ["--impl", "pallas", "--batch-size", "128", "--fanouts", "10,10"],
        {},
    ),
    "minibatch-sell": (
        ["--impl", "sell", "--batch-size", "128", "--fanouts", "10,10"],
        {},
    ),
}

# tiny karate (34 nodes) is not meaningful for sampled-minibatch modes
_SKIP = {("karate", "dp4-minibatch-cpu"), ("karate", "minibatch-pallas"),
         ("karate", "minibatch-sell")}


_DEFAULT_DEVICE = None


def _default_device() -> str:
    """The default backend's first device, queried once in a subprocess
    (the parent must stay backend-agnostic: mesh cells force CPU)."""
    global _DEFAULT_DEVICE
    if _DEFAULT_DEVICE is None:
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0])"],
                capture_output=True, text=True, timeout=300,
            )
            _DEFAULT_DEVICE = out.stdout.strip().splitlines()[-1] or "?"
        except Exception:
            _DEFAULT_DEVICE = "?"
    return _DEFAULT_DEVICE


def run_cell(dataset: str, mode: str) -> dict:
    args, env_over = MODES[mode]
    cmd = [sys.executable, str(REPO / "train.py"), "--dataset", dataset,
           "--data-root", str(REPO / "data"), *CONFIGS[dataset], *args]
    env = dict(os.environ, **env_over)
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=REPO, timeout=3600
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"{dataset}/{mode} failed rc={out.returncode}\n{out.stdout[-2000:]}"
            f"\n{out.stderr[-2000:]}"
        )
    test_acc = None
    final_loss = None
    # GATV2_PLATFORM pins the backend for mesh cells; otherwise the cell
    # ran the default backend (the real TPU when tunneled). The memory-
    # report line can't serve as the source: backends without
    # memory_stats() (CPU, some tunnels) never print it.
    device = (
        f"cpu x{env_over.get('XLA_FLAGS', '').split('=')[-1] or '?'} virtual"
        if env_over.get("GATV2_PLATFORM") == "cpu"
        else _default_device()
    )
    for line in out.stdout.splitlines():
        if line.startswith("Final Test Accuracy:"):
            test_acc = float(line.split(":")[1].strip().rstrip("%"))
        if line.startswith("Avg Loss:"):
            final_loss = float(line.split("Avg Loss:")[1].split(",")[0])
    if test_acc is None or final_loss is None:
        raise RuntimeError(
            f"{dataset}/{mode}: could not parse accuracy/loss from train.py "
            f"output (does the dataset ship split masks?)\n{out.stdout[-1500:]}"
        )
    return {"dataset": dataset, "mode": mode, "test_acc_pct": test_acc,
            "final_train_loss": final_loss, "device": device}


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "--single":
        kv = dict(a.split("=", 1) for a in argv[1:])
        print(json.dumps(run_cell(kv["dataset"], kv["mode"])))
        return 0

    results = []
    for dataset in CONFIGS:
        for mode in MODES:
            if (dataset, mode) in _SKIP:
                continue
            r = run_cell(dataset, mode)
            print(json.dumps(r), flush=True)
            results.append(r)

    write_markdown(results)
    return 0


def write_markdown(results: list[dict]) -> None:
    by_ds: dict[str, dict[str, dict]] = {}
    for r in results:
        by_ds.setdefault(r["dataset"], {})[r["mode"]] = r

    lines = [
        "# ACCURACY — real-dataset training parity",
        "",
        "Genuine (non-synthetic) datasets committed in-repo under `data/` in",
        "the reference's 4-file text format (+ split masks); generated from",
        "offline package data by `tools/make_real_datasets.py`:",
        "",
        "- **karate** — Zachary's karate club (networkx): 34 nodes /",
        "  156 directed edges / 2 classes; one-hot identity features.",
        "- **digits** — sklearn handwritten digits: 1,797 nodes (real 8x8",
        "  images, 64 features) / 21,651 edges (symmetrized 8-NN graph +",
        "  self-loops) / 10 classes.",
        "",
        "The reference's own catalog (Cora/Citeseer/Pubmed/Arxiv/Products,",
        "/root/reference/README.md:22-35) requires network downloads this",
        "environment cannot perform (zero egress); `tools/convert_ogb.py`",
        "converts locally-prepared OGB data when available. The datasets",
        "here serve the same purpose: end-to-end training on real features/",
        "labels with held-out test evaluation, across every execution path.",
        "",
        "Protocol: 2-layer GATv2, Adam lr=0.01, 200 epochs, seed 0, the",
        "committed deterministic split masks. Every cell lists the device",
        "it actually ran on (xla/pallas/sell + minibatch cells run the",
        "default backend — the real TPU chip when tunneled; mesh cells run",
        "virtual CPU meshes: 8-way edge-partitioned full-graph, 4-way",
        "data-parallel neighbor-sampled minibatch). All cells below were",
        "measured at one HEAD by tools/run_accuracy.py (round 5, current",
        "kernel generation).",
        "",
        "| dataset | mode | test accuracy | final train loss | device |",
        "|---|---|---|---|---|",
    ]
    for ds, modes in by_ds.items():
        for mode, r in modes.items():
            lines.append(
                f"| {ds} | {mode} | {r['test_acc_pct']:.2f}% | "
                f"{r['final_train_loss']:.4f} | {r.get('device', '?')} |"
            )
    lines.append("")
    for ds, modes in by_ds.items():
        accs = [r["test_acc_pct"] for r in modes.values()]
        if len(accs) > 1:
            lines.append(
                f"Cross-implementation spread ({ds}): "
                f"{max(accs) - min(accs):.2f} pp across {len(accs)} paths."
            )
    lines += [
        "",
        "Precision tiers, digits end-to-end (sell, 200 epochs): exact f32",
        "97.78%, bf16x3 (`--precision high`) 97.22%, bf16 (`--precision",
        "default`) 97.78% — all tiers train to full quality; the 0.56 pp",
        "bf16x3 delta sits at the edge of the table's cross-path spread.",
        "",
        "## Precision-tier disposition (at-scale gradient error, closed"
        " round 5)",
        "",
        "`tools/grad_error_at_scale.py` on the real chip at full arxiv",
        "scale (169,343 nodes / 1,166,243 edges, h=4 d=64):",
        "",
        "- **bf16x3 (`--precision high`) vs exact f32: rel err 0.0 — ",
        "  bit-identical, BOTH kernel families.** By construction: the",
        "  kernels route every precision-sensitive product (score SDDMM,",
        "  softmax-Jacobian terms) through exact f32 (`_kdot",
        "  sensitive=True`) and every one-hot/selector product through the",
        "  exact 3-term bf16 split (`exact_arg`, identical in both tiers),",
        "  so no matmul actually differs between 'high' and 'highest'.",
        "  This also explains the measured throughput neutrality (rounds",
        "  3-5): the tiers compile to the same passes. DISPOSITION:",
        "  `highest` stays the default; `high` is harmless but pointless",
        "  for these kernels.",
        "- **`--streams bf16` (rounded projections + bf16 residuals) vs",
        "  exact f32, same inputs:** loss rel err 4.7e-5; gradient",
        "  rel-to-max-err p99 <= 0.1% (d_zs 0.066%, d_zd 0.097%, d_a",
        "  0.046%), p99.99 1.5-5%, isolated tail maxima 19%/64% on single",
        "  elements where rounding flips a softmax winner (expected for",
        "  ANY input rounding; the tier itself is bit-equal to running the",
        "  exact kernels on the rounded projections). Throughput-neutral",
        "  (arxiv 104.1 ms vs 105.2). DISPOSITION: opt-in tier for",
        "  HBM-headroom; default stays exact f32.",
        "",
    ]
    (REPO / "ACCURACY.md").write_text("\n".join(lines))
    print(f"wrote {REPO / 'ACCURACY.md'}")


if __name__ == "__main__":
    sys.exit(main())
