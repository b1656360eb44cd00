"""Summarize an A/B matrix jsonl into a markdown table (BASELINE.md material).

Usage: python tools/ab_summary.py [path ...]
No jax import — safe to run while benches are in flight. Batch columns are
discovered from the record keys (train_step_ms, train_step_ms_bs8, ...,
train_micro_step_ms_bs16accum), so new bench legs show up without edits.
"""

from __future__ import annotations

import json
import re
import sys


def load(path):
    recs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                recs.append(json.loads(line))
    return recs


def main():
    paths = sys.argv[1:] or ["tools/ab_r3.jsonl"]
    for path in paths:
        recs = load(path)
        # discover batch suffixes present in this matrix
        suffixes = []
        for rec in recs:
            extra = ((rec.get("result") or {}).get("extra") or {})
            for k in extra:
                m = re.fullmatch(r"train(?:_micro)?_step_ms(_bs\w+)?", k)
                if m:
                    s = m.group(1) or ""
                    if s not in suffixes:
                        suffixes.append(s)
        suffixes.sort(key=lambda s: (len(s), s))
        labels = [("bs1" if s == "" else s[1:]) for s in suffixes]

        print(f"\n## {path}\n")
        hdr = (["config", "SW vol/s"]
               + [f"{l} ms" for l in labels]
               + [f"{l} crops/s" for l in labels]
               + ["MFU (analytic)", "fallbacks"])
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
        for rec in recs:
            cfg = rec["config"]
            res = rec.get("result")
            if not res:
                print(f"| {cfg} | (null leg) |" + " — |" * (len(hdr) - 2))
                continue
            extra = res.get("extra", {})
            sw = res.get("value")
            cells = [cfg,
                     _fmt(sw if isinstance(sw, (int, float)) and sw == sw
                          else None)]
            for s in suffixes:
                cells.append(_fmt(extra.get(f"train_step_ms{s}")
                                  or extra.get(f"train_micro_step_ms{s}")))
            for s in suffixes:
                cells.append(_fmt(extra.get(f"train_crops_per_sec{s}")))
            mfus = [f"{labels[i]}:{extra[k]:.3f}"
                    for i, s in enumerate(suffixes)
                    if (k := f"train_model_mfu{s}") in extra]
            cells.append(" ".join(mfus) or "—")
            cells.append(", ".join(f"{k.replace('train_', '')}={v}"
                                   for k, v in extra.items()
                                   if "fallback" in k or "error" in k) or "")
            print("| " + " | ".join(cells) + " |")


def _fmt(v):
    if v is None:
        return "—"
    if isinstance(v, float):
        return f"{v:.4g}"
    return str(v)


if __name__ == "__main__":
    main()
