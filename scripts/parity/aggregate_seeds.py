"""Aggregate seed-replicate parity runs into a mean±std cross-framework
table (VERDICT r4 #2: the hard-corpus baseline gap needs ≥3 seeds per cell
before it can be called real).

Reads summary.json from each --tpu_out / --ref_out directory (the
run_tpu.py / run_reference.py artifacts), groups by experiment cell, and
prints per-cell mean ± std over seeds for each eval set, plus the
cross-framework delta in units of the pooled seed std.

    python scripts/parity/aggregate_seeds.py \
        --tpu_out /tmp/hard5/tpu_s0 /tmp/hard5/tpu_s1 /tmp/hard5/tpu_s2 \
        --ref_out /tmp/hard5/ref_s0 /tmp/hard5/ref_s1 /tmp/hard5/ref_s2 \
        --json docs/parity_artifacts/r5_seed_table.json
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

SETS = ["JSRT_val", "JSRT_test", "NIH", "Montgomery"]


def load_many(outs):
    cells = {}
    for out in outs:
        p = os.path.join(out, "summary.json")
        if not os.path.exists(p):
            print(f"(missing {p})")
            continue
        with open(p) as f:
            s = json.load(f)
        for exp, res in s.get("experiments", {}).items():
            for ds in SETS:
                if ds in res:
                    cells.setdefault((exp, ds), []).append(
                        100.0 * res[ds]["dice_mean"])
    return cells


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu_out", nargs="+", required=True)
    ap.add_argument("--ref_out", nargs="+", default=[])
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    tpu = load_many(args.tpu_out)
    ref = load_many(args.ref_out)

    exps = sorted({e for e, _ in list(tpu) + list(ref)})
    record = {}
    print(f"{'cell':<14} {'set':<11} {'tedm_tpu (n seeds)':<22} "
          f"{'torch (n seeds)':<22} {'Δ':>6} {'Δ/σ':>6}")
    for exp in exps:
        for ds in SETS:
            t = np.array(tpu.get((exp, ds), []))
            r = np.array(ref.get((exp, ds), []))
            ts = f"{t.mean():.2f} ± {t.std(ddof=1) if len(t) > 1 else 0:.2f} ({len(t)})" if len(t) else "--"
            rs = f"{r.mean():.2f} ± {r.std(ddof=1) if len(r) > 1 else 0:.2f} ({len(r)})" if len(r) else "--"
            if len(t) and len(r):
                delta = t.mean() - r.mean()
                pooled = float(np.sqrt(
                    (t.var(ddof=1) if len(t) > 1 else 0.0)
                    + (r.var(ddof=1) if len(r) > 1 else 0.0))) or float("nan")
                zs = f"{delta / pooled:+.1f}" if pooled == pooled and pooled > 0 else "--"
                print(f"{exp:<14} {ds:<11} {ts:<22} {rs:<22} "
                      f"{delta:+6.2f} {zs:>6}")
            else:
                print(f"{exp:<14} {ds:<11} {ts:<22} {rs:<22} {'--':>6} {'--':>6}")
            record[f"{exp}|{ds}"] = {
                "tedm_tpu": sorted(t.tolist()), "torch": sorted(r.tolist()),
            }
    if args.json:
        os.makedirs(os.path.dirname(args.json), exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(record, f, indent=2, sort_keys=True)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
