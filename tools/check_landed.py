"""Fail if any measured score is absent from RESULTS.md (VERDICT r4 item 9).

Scans every ``runs/*/renders_val/scores.json``, ``runs/*/scores.json`` and
``artifacts/round*/**/*scores.json`` for a ``psnr`` field and checks that the
value (rounded to 2 decimals, the convention RESULTS.md uses) appears
somewhere in RESULTS.md. Three rounds in a row ended with measured numbers
stranded in artifacts or on the wipeable ``runs/`` disk; chain scripts call
this after every commit_run so the miss fails loudly in the same session.

Usage:  python tools/check_landed.py  [--repo /root/repo]
Exit 0 = everything landed; exit 1 = stranded scores listed on stderr.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def _fmt_candidates(psnr: float) -> list[str]:
    """RESULTS.md quotes PSNR to 2 (occasionally 1) decimals."""
    return [f"{psnr:.2f}", f"{psnr:.1f}"]


def collect_scores(repo: str) -> list[tuple[str, float]]:
    patterns = [
        os.path.join(repo, "runs", "*", "renders_val", "scores.json"),
        os.path.join(repo, "runs", "*", "scores.json"),
        os.path.join(repo, "artifacts", "round*", "**", "*scores.json"),
    ]
    found: list[tuple[str, float]] = []
    for pat in patterns:
        for path in sorted(glob.glob(pat, recursive=True)):
            try:
                with open(path) as f:
                    data = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue
            # top-level psnr (render scores) or nested stage scores
            # (distill_run writes teacher/distilled/finetune/ess blocks).
            def walk(node, prefix=""):
                if isinstance(node, dict):
                    if isinstance(node.get("psnr"), (int, float)):
                        found.append((f"{path}{prefix}", float(node["psnr"])))
                    for k, v in node.items():
                        if isinstance(v, dict) and k != "gap" and not k.endswith("_gap"):
                            walk(v, prefix=f":{k}")
            walk(data)
    return found


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    args = ap.parse_args(argv)

    results_path = os.path.join(args.repo, "RESULTS.md")
    with open(results_path) as f:
        results = f.read()
    # strip thousands separators so 66,373 matches 66373-style quotes too
    results_flat = results.replace(",", "")

    stranded = []
    for src, psnr in collect_scores(args.repo):
        if psnr != psnr or psnr <= 0:  # NaN / degenerate
            continue
        if not any(c in results or c in results_flat for c in _fmt_candidates(psnr)):
            stranded.append((src, psnr))

    if stranded:
        print("STRANDED measured scores not found in RESULTS.md:", file=sys.stderr)
        for src, psnr in stranded:
            print(f"  {psnr:8.2f} dB  {src}", file=sys.stderr)
        print(f"\n{len(stranded)} stranded score(s). Land them in RESULTS.md "
              "in THIS session (see CLAUDE.md artifact persistence rule).",
              file=sys.stderr)
        return 1
    n = len(collect_scores(args.repo))
    print(f"check_landed: all {n} measured scores appear in RESULTS.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
