#!/usr/bin/env python
"""Assemble the mixed-vs-single-env comparison table (VERDICT r3 #5 /
BASELINE.json config 4: OP + PCTSP mixed-env training with swapped
environment embeddings).

Reads runs/{mixed_op_pctsp,op20_single,pctsp20_single}_eval.json, checks
the budgets are matched (same epochs; the mixed preset's 640k samples/epoch
split across two envs = 320k per env per epoch = each control's budget),
and writes runs/mixed_vs_single.json + a markdown table to stdout for
PARITY.md.
"""

import json
import os
import sys

RUNS = os.path.dirname(os.path.abspath(__file__))


def main():
    docs = {}
    for name in ("mixed_op_pctsp", "op20_single", "pctsp20_single"):
        path = os.path.join(RUNS, f"{name}_eval.json")
        if not os.path.exists(path):
            sys.exit(f"missing {path} — run the queue first")
        docs[name] = json.load(open(path))

    rows = []
    mixed = docs["mixed_op_pctsp"]
    for env, control_name in (("op", "op20_single"), ("pctsp", "pctsp20_single")):
        ctl = docs[control_name]
        m_row = mixed["eval"][f"{env}/greedy"]
        c_row = ctl["eval"]["greedy"]
        gap_key = "gap_pct"
        rows.append({
            "env": env,
            "mixed_gap_pct": round(m_row[gap_key], 2),
            "single_gap_pct": round(c_row[gap_key], 2),
            "delta_pp": round(m_row[gap_key] - c_row[gap_key], 2),
            "anchor": m_row.get("optimum_anchor"),
            "mixed_epochs": mixed["epochs_trained"],
            "single_epochs": ctl["epochs_trained"],
            "budget_matched": mixed["epochs_trained"] == ctl["epochs_trained"],
            "mixed_instances_per_s": round(m_row["instances_per_s"], 1),
            "single_instances_per_s": round(c_row["instances_per_s"], 1),
        })

    helps = all(r["delta_pp"] <= 0.5 for r in rows)  # within noise or better
    conclusion = (
        "shared-trunk mixed training matches or beats the single-env "
        "controls at matched per-env sample budgets"
        if helps else
        "mixed training trails the single-env controls at matched budgets "
        "(multi-task interference at this scale)"
    )
    out = {
        "rows": rows,
        "budget_note": ("mixed trains 640k samples/epoch split across two "
                        "envs; controls train 320k/epoch of one env -> "
                        "matched per-env budgets at equal epoch counts"),
        "conclusion": conclusion,
    }
    path = os.path.join(RUNS, "mixed_vs_single.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("WROTE", path)

    print("\n| env | mixed gap % | single gap % | delta (pp) | epochs (m/s) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['env']}-20 | {r['mixed_gap_pct']} | {r['single_gap_pct']} "
              f"| {r['delta_pp']:+} | {r['mixed_epochs']}/{r['single_epochs']} |")
    print("\nConclusion:", conclusion)


if __name__ == "__main__":
    main()
