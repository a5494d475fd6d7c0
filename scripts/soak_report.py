"""Summarize a trainer soak run from its metrics.csv (docs/SOAK.md).

Computes the stage-mix step rate and per-iteration-type step-time
medians/spreads from the per-step `wall_time` column the MetricsLogger
records, excluding compile/first-execution outliers (any step whose
duration exceeds `--outlier-factor` x the median of its type — on the
axon relay the first execution of each freshly compiled graph costs
minutes; a real pod pays this once per program too, just less).

    python scripts/soak_report.py /tmp/soak_run/metrics.csv [more.csv ...]
"""

from __future__ import annotations

import argparse
import csv
import json

import numpy as np

ITYPES = {0: "recon", 1: "unet_distill", 2: "comp_distill"}


def load_steps(paths: list[str]) -> list[dict]:
    rows = []
    for p in paths:
        with open(p) as f:
            prev = None
            for r in csv.DictReader(f):
                if not r.get("step", "").lstrip("-").isdigit():
                    continue  # stray header row from a legacy resume append
                t = float(r["wall_time"])
                # per-step duration = delta of cumulative wall_time within
                # one process; the first row of a process has no
                # predecessor (its duration would include compiles +
                # warmup). A resumed run appends to the same CSV with its
                # own t0, so a non-increasing wall_time marks a boundary.
                dur = None if (prev is None or t <= prev) else t - prev
                prev = t
                rows.append({
                    "step": int(r["step"]),
                    "iter_type": ITYPES.get(
                        int(float(r.get("iter_type_id", 0))), "?"),
                    "loss": float(r.get("loss", "nan")),
                    "dur": dur,
                })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="+")
    ap.add_argument("--outlier-factor", type=float, default=5.0)
    args = ap.parse_args()

    rows = load_steps(args.csvs)
    losses = np.asarray([r["loss"] for r in rows])
    out = {
        "total_steps": len(rows),
        "steps": f"{rows[0]['step']}..{rows[-1]['step']}",
        "all_losses_finite": bool(np.isfinite(losses).all()),
        "per_type": {},
    }
    excluded = []
    timed = [r for r in rows if r["dur"] is not None]
    for ty in sorted({r["iter_type"] for r in rows}):
        durs = np.asarray([r["dur"] for r in timed if r["iter_type"] == ty])
        n_ty = sum(1 for r in rows if r["iter_type"] == ty)
        entry = {"count": n_ty}
        if len(durs):
            med = float(np.median(durs))
            clean = durs[durs <= args.outlier_factor * med]
            excluded += [
                (r["step"], ty, round(r["dur"], 1)) for r in timed
                if r["iter_type"] == ty and r["dur"] > args.outlier_factor * med]
            entry.update({
                "median_sec": round(float(np.median(clean)), 2),
                "min_sec": round(float(clean.min()), 2),
                "max_sec": round(float(clean.max()), 2),
                "steps_per_sec": round(1.0 / float(np.median(clean)), 4),
                "n_timed": int(len(clean)),
            })
        out["per_type"][ty] = entry
    clean_all = np.asarray([
        r["dur"] for r in timed
        if (r["step"], r["iter_type"], round(r["dur"], 1)) not in
        {(s, t, d) for s, t, d in excluded}])
    if len(clean_all):
        out["mix_steps_per_sec_clean"] = round(
            len(clean_all) / float(clean_all.sum()), 4)
    # wall-clock mix rate including every warm step (the honest number a
    # user watching the run sees once graphs are compiled)
    out["outliers_excluded"] = [
        {"step": s, "iter_type": t, "sec": d} for s, t, d in excluded]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
