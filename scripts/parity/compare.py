"""Combine the torch-reference and tedm_tpu parity summaries into the
committed head-to-head table (RESULTS_parity.md).

    python scripts/parity/compare.py \
        --ref /tmp/tedm_parity/ref_logs/summary.json \
        --tpu /tmp/tedm_parity/tpu_logs/summary.json \
        [--ported /tmp/tedm_parity/tpu_ported/summary.json] \
        --out RESULTS_parity.md
"""

from __future__ import annotations

import argparse
import json
import math


def load(path):
    with open(path) as f:
        return json.load(f)


def fmt(e):
    if e is None:
        return "--"
    return f"{100 * e['dice_mean']:.2f} ± {100 * e['dice_std']:.1f}"


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", type=str, required=True)
    ap.add_argument("--tpu", type=str, required=True)
    ap.add_argument("--ported", type=str, default=None)
    ap.add_argument("--out", type=str, default="RESULTS_parity.md")
    args = ap.parse_args(argv)

    ref = load(args.ref)
    tpu = load(args.tpu)
    ported = load(args.ported) if args.ported else None

    datasets = ["JSRT_val", "JSRT_test", "NIH", "Montgomery"]
    lines = [
        "# Cross-framework Dice head-to-head (torch reference vs tedm_tpu)",
        "",
        "Both frameworks trained and evaluated on the SAME exported synthetic",
        "corpus (identical uint8 PNG/GIF pixels; see scripts/parity/). Chains:",
        "reference trainers/train_CXR14 -> train_baseline / train_datasetDM",
        "(shared weights) -> run_tests/testing_shared_weights-equivalent eval;",
        "tedm_tpu: the stock CLI + eval harnesses.",
        "",
        f"Budget: img_size={ref['img_size']}, dim=64 (full 36M UNet),",
        f"backbone {ref['backbone_steps']} steps, heads {ref['head_steps']} "
        "steps, batch 16, seed 0, Dice = mean ± std x100 per image.",
        "",
    ]

    rows = sorted(set(ref["experiments"]) | set(tpu["experiments"]))
    header = "| experiment | dataset | torch reference | tedm_tpu | Δ (abs) |"
    if ported:
        header = header + " tedm_tpu on TORCH-PORTED backbone |"
    lines += [header,
              "|---|---|---|---|---|" + ("---|" if ported else "")]
    worst = 0.0
    for row in rows:
        for ds in datasets:
            r = ref["experiments"].get(row, {}).get(ds)
            t = tpu["experiments"].get(row, {}).get(ds)
            delta = (
                abs(r["dice_mean"] - t["dice_mean"]) if r and t else math.nan
            )
            if r and t:
                worst = max(worst, delta)
            cells = [row, ds, fmt(r), fmt(t),
                     f"{100 * delta:.2f}" if not math.isnan(delta) else "--"]
            if ported:
                cells.append(fmt(ported["experiments"].get(row, {}).get(ds)))
            lines.append("| " + " | ".join(cells) + " |")
    lines += [
        "",
        f"**Largest |Δ dice| across all cells: {100 * worst:.2f} (x100 scale).**",
        "",
        "Per-timestep TEDM Dice (JSRT_test):",
        "",
        "| timestep | torch | tedm_tpu |",
        "|---|---|---|",
    ]
    for row in rows:
        if not row.startswith("TEDM"):
            continue
        rt = ref["experiments"].get(row, {}).get("JSRT_test", {}).get("per_timestep", {})
        tt = tpu["experiments"].get(row, {}).get("JSRT_test", {}).get("per_timestep", {})
        for t_str, v in sorted(rt.items(), key=lambda kv: int(kv[0])):
            tv = tt.get(t_str)
            lines.append(
                f"| {row} t={t_str} | {100 * v['dice_mean']:.2f} | "
                + (f"{100 * tv['dice_mean']:.2f}" if tv else "see npz") + " |"
            )
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
