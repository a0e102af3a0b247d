"""Collect measured scores from run dirs into one markdown table.

Scans runs/*/ for:
  * renders_val*/scores.json      (written by inference.py since round 3)
  * scores.json                   (pix2pix baseline runs)
  * pose_errors.json              (image-wise analysis-by-synthesis runs)
and prints a markdown table sorted by run dir name. This makes RESULTS.md
updates mechanical and survives lost shell logs (the scores live next to
the renders).

Usage: python tools/collect_results.py [--runs_dir runs] [--match SUBSTR]
"""
from __future__ import annotations

import argparse
import glob
import json
import os


def collect(runs_dir: str, match: str = ""):
    rows = []
    for run in sorted(glob.glob(os.path.join(runs_dir, "*"))):
        if not os.path.isdir(run) or match not in os.path.basename(run):
            continue
        name = os.path.basename(run)
        for scores_path in sorted(glob.glob(os.path.join(run, "renders_val*",
                                                         "scores.json"))):
            s = json.load(open(scores_path))
            tag = os.path.basename(os.path.dirname(scores_path))
            label = name if tag == "renders_val" else f"{name} [{tag}]"
            rows.append((label, s.get("psnr"), s.get("ssim"),
                         s.get("lpips") or s.get("rlpips")))
        flat = os.path.join(run, "scores.json")
        if os.path.exists(flat):
            s = json.load(open(flat))
            rows.append((name, s.get("psnr"), s.get("ssim"),
                         s.get("lpips") or s.get("rlpips")))
        curve = os.path.join(run, "val_curve.json")
        if os.path.exists(curve) and not glob.glob(
                os.path.join(run, "renders_val*", "scores.json")):
            c = json.load(open(curve))
            if c:
                rows.append((f"{name} [in-training est., ep{c[-1]['epoch']}]",
                             c[-1].get("psnr_estimate"), None, None))
        pe = os.path.join(run, "pose_errors.json")
        if os.path.exists(pe):
            s = json.load(open(pe))
            rows.append((f"{name} [pose_err rad^2]", s.get("best"),
                         s.get("final"), None))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs_dir", default="runs")
    ap.add_argument("--match", default="")
    args = ap.parse_args(argv)
    rows = collect(args.runs_dir, args.match)
    if not rows:
        print("no scores found")
        return rows
    print("| run | PSNR/best | SSIM/final | (r)LPIPS |")
    print("|---|---|---|---|")
    for name, a, b, c in rows:
        fmt = lambda v: "—" if v is None else (f"{v:.4g}" if isinstance(v, float) else str(v))
        print(f"| {name} | {fmt(a)} | {fmt(b)} | {fmt(c)} |")
    return rows


if __name__ == "__main__":
    main()
