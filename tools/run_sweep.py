#!/usr/bin/env python
"""Benchmark sweep driver: runs every bench leg on the real chip and
collects one JSONL file + a BENCH_SWEEP-ready markdown table.

Legs (all on the single real TPU via bench.py's differenced two-program
timing; each under its own timeout so one hang cannot kill the sweep):

  1. full-graph sweep: every CONFIGS row, impl=pallas, exact f32
  2. precision=high points: arxiv/arxiv-pl/products-full (bf16x3 tier)
  3. mesh=1 overhead rows: citeseer3 + products-sub via --mesh 1
     (sharding machinery cost with no real communication -> SCALING.md §3)
  4. impl=sell A/B rows on every config (the SELL-layout kernels,
     ops/sell_attention.py)
  5. optional --tile-e study on arxiv (128/256/512)

Transient-worker retry: the tunneled single-chip worker intermittently
dies between processes (observed as `UNAVAILABLE: TPU worker process
crashed or restarted ... kernel fault` and `FAILED_PRECONDITION: TPU
backend error`; round-3's `arxiv-sell-high` "kernel fault" was exactly
this — the identical leg passes deterministically when re-run, see
tools/bisect_sell_high.py). Legs whose stderr matches those signatures
are retried up to 2 times after a settle delay, and the error record
notes how many attempts were made.

Usage:  python tools/run_sweep.py [--out SWEEP_R4.jsonl] [--tile-study]
Rerun-safe: legs already present in --out (same tag) are skipped.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent

# stderr signatures of a flaky worker/tunnel (not a real program bug):
# retrying is both safe and the correct interpretation.
TRANSIENT_SIGNATURES = (
    "TPU worker process crashed or restarted",
    "FAILED_PRECONDITION: TPU backend error",
    "UNAVAILABLE: Connection reset",
    "failed to connect to all addresses",
)
RETRY_SETTLE_S = 30

LEGS: list[tuple[str, list[str], int]] = [
    # (tag, bench.py args, timeout seconds). Every leg names its --impl
    # explicitly (bench.py's default is 'auto' = the CLI's resolution,
    # which would alias the A/B pairs).
    # Ordered by decision value (A/B pairs adjacent) so a truncated sweep
    # still answers the round's headline question: does the SELL layout
    # beat the one-hot pallas kernels on large graphs?
    ("arxiv", ["--config", "arxiv", "--impl", "pallas"], 1800),
    ("arxiv-sell", ["--config", "arxiv", "--impl", "sell"], 1800),
    ("citeseer3", ["--config", "citeseer3", "--impl", "pallas"], 900),
    ("citeseer3-sell", ["--config", "citeseer3", "--impl", "sell"], 900),
    # hub-heavy (Zipf) degree profile: the regime real graphs have
    ("arxiv-pl", ["--config", "arxiv-pl", "--impl", "pallas"], 1800),
    ("arxiv-pl-sell", ["--config", "arxiv-pl", "--impl", "sell"], 1800),
    ("products-sub", ["--config", "products-sub", "--impl", "pallas"], 3600),
    ("products-sub-sell", ["--config", "products-sub", "--impl", "sell"], 3600),
    ("arxiv-high",
     ["--config", "arxiv", "--impl", "pallas", "--precision", "high"], 1800),
    ("arxiv-sell-high",
     ["--config", "arxiv", "--impl", "sell", "--precision", "high"], 1800),
    # hub regime under bf16x3: exercises virtual-row splitting + _kdot
    # splits together (round-3's crashed combination class, now retried)
    ("arxiv-pl-sell-high",
     ["--config", "arxiv-pl", "--impl", "sell", "--precision", "high"],
     1800),
    ("pubmed", ["--config", "pubmed", "--impl", "pallas"], 900),
    ("pubmed-sell", ["--config", "pubmed", "--impl", "sell"], 900),
    ("cora", ["--config", "cora", "--impl", "pallas"], 900),
    ("cora-sell", ["--config", "cora", "--impl", "sell"], 900),
    ("citeseer3-mesh1",
     ["--config", "citeseer3", "--impl", "pallas", "--mesh", "1"], 1800),
    ("products-sub-mesh1",
     ["--config", "products-sub", "--impl", "pallas", "--mesh", "1"], 3600),
    ("products-sub-mesh1-sell",
     ["--config", "products-sub", "--mesh", "1", "--impl", "sell"], 3600),
    ("products-full", ["--config", "products-full", "--impl", "pallas"], 5400),
    ("products-full-sell",
     ["--config", "products-full", "--impl", "sell"], 5400),
    ("products-full-high",
     ["--config", "products-full", "--impl", "pallas", "--precision", "high"],
     5400),
]

TILE_LEGS = [
    (f"arxiv-te{te}",
     ["--config", "arxiv", "--impl", "pallas", "--tile-e", str(te)], 1800)
    for te in (128, 256, 512)
]


def run_leg(tag: str, args: list[str], timeout_s: int) -> dict:
    cmd = [sys.executable, str(REPO / "bench.py"), *args]
    attempts = 0
    retry_signatures: list[str] = []
    while True:
        attempts += 1
        print(f"[sweep] {tag} (attempt {attempts}): {' '.join(args)}",
              file=sys.stderr, flush=True)
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=timeout_s,
                cwd=REPO,
            )
        except subprocess.TimeoutExpired:
            return {"tag": tag, "error": f"timeout after {timeout_s}s",
                    "attempts": attempts}
        if out.returncode != 0:
            err = out.stderr.strip()
            sig = next((s for s in TRANSIENT_SIGNATURES if s in err), None)
            if attempts <= 2 and sig is not None:
                retry_signatures.append(sig)
                print(f"[sweep] {tag}: transient worker error, retrying "
                      f"in {RETRY_SETTLE_S}s", file=sys.stderr, flush=True)
                time.sleep(RETRY_SETTLE_S)
                continue
            return {"tag": tag, "error": err[-2000:], "attempts": attempts,
                    **({"retry_signatures": retry_signatures}
                       if retry_signatures else {})}
        lines = out.stdout.strip().splitlines()
        if not lines:
            return {
                "tag": tag, "attempts": attempts,
                "error":
                    f"no stdout (stderr tail: {out.stderr.strip()[-500:]})",
            }
        line = lines[-1]
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            return {"tag": tag, "error": f"unparseable output: {line[:500]}",
                    "attempts": attempts}
        rec["tag"] = tag
        if attempts > 1:
            rec["attempts"] = attempts
            rec["retry_signatures"] = retry_signatures
            if attempts > 2:
                # Both retries consumed: the "transient" adjudication no
                # longer holds for this leg — mark it red so it cannot be
                # silently absorbed (round-4 VERDICT weak #5). The
                # measurement is kept for inspection but red legs must not
                # be quoted as green numbers.
                rec["red"] = "both retries consumed in one sweep"
        return rec


def markdown_table(records: list[dict]) -> str:
    cols = [
        ("tag", "config"), ("value", "epoch ms"), ("edges_per_s", "edges/s"),
        ("achieved_model_tflops", "model TFLOP/s"),
        ("achieved_device_tflops", "device TFLOP/s"), ("mfu", "MFU %"),
        ("variance_pct", "variance %"), ("_flags", "flags"),
    ]
    lines = [
        "| " + " | ".join(h for _, h in cols) + " |",
        "|" + "---|" * len(cols),
    ]
    for r in records:
        if "error" in r:
            # keep the column grid intact: error text in column 2, the
            # rest dashed
            cells = [r["tag"], f"ERROR: {r['error'][:60]}"]
            cells += ["—"] * (len(cols) - 2)
            lines.append("| " + " | ".join(cells) + " |")
            continue
        cells = []
        for k, _ in cols:
            if k == "_flags":
                flags = []
                if r.get("red"):
                    flags.append(f"RED: {r['red']}")
                if r.get("attempts", 1) > 1:
                    flags.append(f"attempts={r['attempts']}")
                if r.get("dispatch_bound"):
                    flags.append(
                        f"dispatch_bound (min {r.get('epoch_ms_min')} ms)"
                    )
                cells.append("; ".join(flags) or "—")
                continue
            v = r.get(k)
            if v is None:
                v = "—"  # mesh legs don't report tflops/MFU
            elif isinstance(v, float):
                v = f"{v:,.2f}" if v < 1e4 else f"{v:,.0f}"
            cells.append(str(v))
        lines.append("| " + " | ".join(cells) + " |")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "SWEEP_R5.jsonl"))
    ap.add_argument("--tile-study", action="store_true")
    ap.add_argument("--no-sell", action="store_true",
                    help="skip the *-sell legs (e.g. when tpu_smoke's "
                         "sell checks failed on this chip)")
    ap.add_argument("--only", default=None,
                    help="comma-separated leg tags to run (subset sweep, "
                         "e.g. a HEAD re-baseline of the products legs)")
    ap.add_argument("--prev", default=str(REPO / "SWEEP_R4.jsonl"),
                    help="previous round's sweep JSONL: a leg that needed "
                         "a retry there AND here is marked red (recurring "
                         "fault, not a transient)")
    args = ap.parse_args()

    prev_retried = set()
    prev_path = pathlib.Path(args.prev)
    if prev_path.exists():
        for line in prev_path.read_text().splitlines():
            rec = json.loads(line)
            if rec.get("attempts", 1) > 1:
                prev_retried.add(rec["tag"])

    out_path = pathlib.Path(args.out)
    done = set()
    records = []
    if out_path.exists():
        for line in out_path.read_text().splitlines():
            rec = json.loads(line)
            if "error" not in rec:
                done.add(rec["tag"])
                records.append(rec)

    legs = LEGS + (TILE_LEGS if args.tile_study else [])
    if args.no_sell:
        legs = [leg for leg in legs if "-sell" not in leg[0]]
    if args.only:
        want = {t.strip() for t in args.only.split(",")}
        legs = [leg for leg in legs if leg[0] in want]
        missing = want - {leg[0] for leg in legs}
        if missing:
            ap.error(f"unknown --only tags: {sorted(missing)}")
    with out_path.open("a") as f:
        for tag, leg_args, timeout_s in legs:
            if tag in done:
                print(f"[sweep] {tag}: already done, skipping",
                      file=sys.stderr)
                continue
            rec = run_leg(tag, leg_args, timeout_s)
            if (rec.get("attempts", 1) > 1 and tag in prev_retried
                    and "red" not in rec):
                rec["red"] = (
                    "retried in two consecutive sweeps "
                    f"(see {prev_path.name}) — recurring, not transient"
                )
            f.write(json.dumps(rec) + "\n")
            f.flush()
            if "error" not in rec:
                records.append(rec)
            print(f"[sweep] {tag}: {json.dumps(rec)[:200]}",
                  file=sys.stderr, flush=True)

    print(markdown_table(records))


if __name__ == "__main__":
    main()
