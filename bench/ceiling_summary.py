"""Render every bench/results/ceiling_*.json into one markdown table.

Usage: python bench/ceiling_summary.py [--results bench/results]
Prints a table of whole-model time, physics floor, and SoL-vs-physics
per model, plus the worst segment of each (the addressable headroom).
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results",
                    default=os.path.join(os.path.dirname(__file__),
                                         "results"))
    args = ap.parse_args()

    rows = []
    for path in sorted(glob.glob(
            os.path.join(args.results, "ceiling_*_stage.json"))):
        with open(path) as f:
            d = json.load(f)
        segs = [s for s in d["segments"] if s["seg_sol"] is not None
                and s["floor_ms"] > 0.05]
        worst = min(segs, key=lambda s: s["seg_sol"]) if segs else None
        rows.append({
            "model": d["model"], "batch": d["batch"],
            "whole_ms": d["whole_model_ms"],
            "img_s": d["images_per_s"],
            "floor_ms": d["physics_floor_ms"],
            "sol_phys": d["sol_vs_physics"],
            "sol_comp": d["sol_vs_compute"],
            "worst": (f"{worst['cut']} ({worst['seg_sol']*100:.0f}%, "
                      f"{worst['segment_ms'] - worst['floor_ms']:.2f} ms "
                      f"headroom)" if worst else "—"),
        })

    print("| Model | batch | whole ms | img/s | floor ms | % of physics "
          "ceiling | % compute SoL | worst segment |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['model']} | {r['batch']} | {r['whole_ms']:.2f} | "
              f"{r['img_s']:,.0f} | {r['floor_ms']:.2f} | "
              f"{r['sol_phys']*100:.0f}% | {r['sol_comp']*100:.0f}% | "
              f"{r['worst']} |")


if __name__ == "__main__":
    main()
