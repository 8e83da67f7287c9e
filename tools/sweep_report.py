#!/usr/bin/env python
"""Turn a sweep JSONL (tools/run_sweep.py output) into the round
analysis: the pallas-vs-SELL A/B table, round-over-round deltas against
the recorded round-2 AND round-3 medians, and a verdict against the
standing targets (arxiv >= 30 M edges/s, products-full >= 14 M
edges/s). Markdown to stdout, ready to paste into BENCH_SWEEP.md.

Usage: python tools/sweep_report.py [--in SWEEP_R4.jsonl]
"""

from __future__ import annotations

import argparse
import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent

# round-2 medians (BENCH_SWEEP.md round-2 table, TPU v5e, exact f32)
ROUND2_MS = {
    "citeseer3": 1.90,
    "cora": 1.58,
    "pubmed": 11.2,
    "arxiv": 240.0,
    "products-sub": 3151.0,
    "products-full": 26528.0,
}
# round-3 medians (SWEEP_R3.jsonl, best of pallas/sell per config)
ROUND3_MS = {
    "citeseer3": 1.737,
    "cora": 1.513,
    "pubmed": 4.839,
    "arxiv": 135.214,
    "products-sub": 1247.795,
    "products-full": 9293.225,
}
# round-4 medians (SWEEP_R4.jsonl, best of pallas/sell per config)
ROUND4_MS = {
    "citeseer3": 1.503,
    "cora": 1.349,
    "pubmed": 4.356,
    "arxiv": 105.416,
    "products-sub": 1121.883,
    "products-full": 8336.024,
}
# arxiv target met in round 4 (33.2 M); round-5 target from VERDICT #2:
# products-full at arxiv parity (>= 30 M) or a measured >= 70%-of-roof proof
TARGETS_EDGES_PER_S = {"arxiv": 30e6, "products-full": 30e6}


def load(path: pathlib.Path) -> dict:
    recs = {}
    for line in path.read_text().splitlines():
        r = json.loads(line)
        if "error" not in r:
            recs[r["tag"]] = r
    return recs


def fmt(v, nd=2):
    return "—" if v is None else f"{v:,.{nd}f}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", default=str(REPO / "SWEEP_R5.jsonl"))
    args = ap.parse_args()
    recs = load(pathlib.Path(args.inp))

    flagged = [
        t for t, r in recs.items()
        if r.get("red") or r.get("attempts", 1) > 1
    ]
    if flagged:
        print("## Flagged legs (retries / red)\n")
        for t in sorted(flagged):
            r = recs[t]
            bits = []
            if r.get("red"):
                bits.append(f"RED: {r['red']}")
            if r.get("attempts", 1) > 1:
                bits.append(
                    f"attempts={r['attempts']} "
                    f"({', '.join(r.get('retry_signatures', []))})"
                )
            print(f"- {t}: {'; '.join(bits)}")
        print()

    print("## A/B: streamed-operand (pallas) vs SELL\n")
    print("| config | pallas ms | sell ms | sell speedup | pallas Medges/s"
          " | sell Medges/s | r2 ms | best vs r2 | r4 best ms | vs r4 |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    verdict = []
    for cfg in ("citeseer3", "cora", "pubmed", "arxiv", "products-sub",
                "products-full"):
        p = recs.get(cfg)
        s = recs.get(f"{cfg}-sell")
        p_ms = p and p.get("value")
        s_ms = s and s.get("value")
        speed = (p_ms / s_ms) if (p_ms and s_ms) else None
        best = min(x for x in (p_ms, s_ms) if x) if (p_ms or s_ms) else None
        r2 = ROUND2_MS.get(cfg)
        r4 = ROUND4_MS.get(cfg)
        gain = (r2 / best) if (best and r2) else None
        gain4 = (r4 / best) if (best and r4) else None
        print(
            f"| {cfg} | {fmt(p_ms)} | {fmt(s_ms)} | "
            f"{fmt(speed)}x | "
            f"{fmt(p and p.get('edges_per_s', 0) / 1e6)} | "
            f"{fmt(s and s.get('edges_per_s', 0) / 1e6)} | "
            f"{fmt(r2)} | {fmt(gain)}x | {fmt(r4)} | {fmt(gain4)}x |"
        )
        tgt = TARGETS_EDGES_PER_S.get(cfg)
        if tgt:
            if not (p or s):
                verdict.append(f"- {cfg}: not measured yet")
                continue
            got = max((r.get("edges_per_s") or 0) for r in (p, s) if r)
            verdict.append(
                f"- {cfg}: target {tgt/1e6:.0f} M edges/s, best measured "
                f"{got/1e6:.1f} M -> "
                + ("MET" if got >= tgt else "NOT MET")
            )

    print("\n## Standing targets\n")
    print("\n".join(verdict) if verdict else "- (no target rows measured)")

    hi = [t for t in recs if t.endswith("-high")]
    if hi:
        print("\n## bf16x3 ('high') points\n")
        for t in sorted(hi):
            r = recs[t]
            base = recs.get(t[: -len("-high")])
            rel = (
                f" ({base['value'] / r['value']:.2f}x vs exact)"
                if base and r.get("value")
                else ""
            )
            print(f"- {t}: {fmt(r.get('value'))} ms{rel}")

    mesh = [t for t in recs if "mesh1" in t]
    if mesh:
        print("\n## mesh=1 sharding overhead (fill SCALING.md §3)\n")
        for t in sorted(mesh):
            r = recs[t]
            base_tag = t.replace("-mesh1", "")
            base = recs.get(base_tag)
            ov = (
                f" ({r['value'] / base['value'] - 1:+.1%} vs unsharded)"
                if base and base.get("value")
                else ""
            )
            print(f"- {t}: {fmt(r.get('value'))} ms{ov}")

    missing = [
        t for t in (
            list(ROUND2_MS)
            + [f"{c}-sell" for c in ROUND2_MS]
        ) if t not in recs
    ]
    if missing:
        print(f"\n(legs not yet measured: {', '.join(missing)})")


if __name__ == "__main__":
    main()
