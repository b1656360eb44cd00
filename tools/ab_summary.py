"""Summarize tools/ab_r3.jsonl into a markdown table (BASELINE.md material).

Usage: python tools/ab_summary.py [path]
No jax import — safe to run while benches are in flight.
"""

from __future__ import annotations

import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "tools/ab_r3.jsonl"
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            cfg = rec["config"]
            res = rec.get("result")
            if not res:
                rows.append((cfg, None, None, None, None, None))
                continue
            extra = res.get("extra", {})
            sw = res.get("value")
            rows.append((
                cfg,
                sw if isinstance(sw, (int, float)) and sw == sw else None,
                extra.get("train_step_ms"),
                extra.get("train_crops_per_sec"),
                extra.get("train_step_ms_bs4") or extra.get(
                    "train_crops_per_sec_bs4"),
                ", ".join(f"{k}={v}" for k, v in extra.items()
                          if "fallback" in k) or "",
            ))

    print(f"| config | SW vol/s | train ms (bs1) | crops/s (bs1) | bs4 | fallbacks |")
    print("|---|---|---|---|---|---|")
    for cfg, sw, ms, cps, bs4, fb in rows:
        fmt = lambda v: ("—" if v is None else
                         f"{v:.4g}" if isinstance(v, float) else str(v))
        print(f"| {cfg} | {fmt(sw)} | {fmt(ms)} | {fmt(cps)} | {fmt(bs4)} "
              f"| {fb} |")


if __name__ == "__main__":
    main()
