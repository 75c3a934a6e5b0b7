"""Hygiene checks on committed runs/*.json artifacts (VERDICT r2 §3).

Round 1 committed a physically impossible training curve; round 2 committed
a TSP-20 smoke named as a TSP-500 result whose gap divided by the wrong-N
anchor. These tests make that class of artifact impossible to commit
silently: every runs/*.json must be internally consistent — anchors keyed
to the config's instance size, gaps recomputable from the stored numbers,
smoke runs labeled as such.
"""

import glob
import json
import os

import pytest

RUNS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "runs")

# Known mean-optimum anchors (Kool et al. 2019 Table 1; Fu et al. 2021
# Table 2 for N=500) — any artifact claiming a gap must use the right one.
KNOWN_ANCHORS = {
    ("tsp", 20): 3.84, ("tsp", 50): 5.70, ("tsp", 100): 7.76,
    ("tsp", 500): 16.55, ("tsp", 1000): 23.12, ("cvrp", 50): 10.38,
    # Kool et al. 2019 appendix: OP-20 optimal prize (maximized),
    # PCTSP-20 optimal cost
    ("op", 20): 5.27, ("pctsp", 20): 3.13,
}

ARTIFACTS = sorted(glob.glob(os.path.join(RUNS, "*.json")))


def _rows_with_gaps(doc):
    """Yield (row, anchor_key_hint) for every eval row that claims a gap."""
    eval_table = doc.get("eval")
    if not isinstance(eval_table, dict):
        return
    for name, row in eval_table.items():
        if isinstance(row, dict) and any("gap" in k for k in row):
            yield name, row


@pytest.mark.parametrize("path", ARTIFACTS, ids=[os.path.basename(p) for p in ARTIFACTS])
def test_artifact_consistency(path):
    doc = json.load(open(path))

    # 1. every gap row must carry its anchor and the gap must recompute
    #    from mean_cost and that anchor (no cross-N anchor mistakes)
    for name, row in _rows_with_gaps(doc):
        anchor = row.get("optimum_anchor", doc.get("optimum_anchor"))
        assert anchor, f"{path}:{name} states a gap but no optimum_anchor"
        gap_key = next(k for k in row if "gap" in k)
        if "mean_prize" in row:  # maximization env (OP): gap is below-optimum
            recomputed = 100.0 * (anchor - row["mean_prize"]) / anchor
            src = f"mean_prize={row['mean_prize']}"
        else:
            recomputed = 100.0 * (row["mean_cost"] - anchor) / anchor
            src = f"mean_cost={row['mean_cost']}"
        assert abs(recomputed - row[gap_key]) < 0.51, (
            f"{path}:{name} gap {row[gap_key]} does not recompute from "
            f"{src} anchor={anchor} ({recomputed:.2f})")
        # 2. the anchor must match the known value for the config's size
        cfg = doc.get("recipe", doc.get("config", {}))
        n = cfg.get("num_loc") or cfg.get("num-loc")
        env = cfg.get("env") or cfg.get("env_name")
        if env and n and "," not in str(env):
            env_key = name.split("/")[0] if "/" in name else str(env)
            known = KNOWN_ANCHORS.get((env_key, int(n)))
            if known is not None:
                assert anchor == pytest.approx(known), (
                    f"{path}:{name} anchor {anchor} != known "
                    f"{known} for {env_key}-{n}")

    # 3. gaps must be sane: a learned policy can't beat the optimum by >1%
    #    and a committed 'result' shouldn't be >1000% off
    for name, row in _rows_with_gaps(doc):
        gap_key = next(k for k in row if "gap" in k)
        assert -1.0 < row[gap_key] < 1000.0, f"{path}:{name} gap nonsense"

    # 4. artifacts produced by scripts with overridable size args must
    #    carry full argv (round 2's stored cmd omitted the overriding args)
    if "config" in doc and "num_loc" in str(doc.get("config", {})):
        assert "argv" in doc or "cmd" in doc

    # 5. trained-vs-untrained ablations must not present a losing trained
    #    row as a result (flag must exist and be True for non-smoke files)
    if "trained_beats_untrained" in doc and "smoke" not in os.path.basename(path):
        assert doc["trained_beats_untrained"], (
            f"{path}: trained encoder lost to untrained — not evidence")


def test_no_mislabeled_instance_size():
    """A file named *_tspN* must not contain a config with a different N
    unless it is labeled a smoke artifact."""
    for path in ARTIFACTS:
        base = os.path.basename(path)
        if "smoke" in base:
            continue
        for token in base.replace(".json", "").split("_"):
            if token.startswith("tsp") and token[3:].isdigit():
                n_name = int(token[3:])
                doc = json.load(open(path))
                cfg = doc.get("recipe", doc.get("config", {}))
                n_cfg = cfg.get("num_loc")
                if n_cfg is not None:
                    assert int(n_cfg) == n_name, (
                        f"{base} claims N={n_name} but config has "
                        f"num_loc={n_cfg} — label it *_smoke.json")


def test_timing_plausibility():
    """Timing fields must not silently include compile (VERDICT r3 weak #5:
    nar_tsp500.json carried eval_s 19.4 vs 234.1 for the *identical*
    protocol — first-call compile landing in the timing). Contract: any two
    eval rows in one artifact that share the same protocol shape (same
    method + same n_instances) must agree on instances_per_s within 12x —
    compile-in-timing shows up as 1-2 orders of magnitude — and artifacts
    with paired timing fields for identical protocols (e.g. trained vs
    untrained) must either agree within 12x or carry a *_warmup/_note field
    explaining the asymmetry."""
    for path in ARTIFACTS:
        doc = json.load(open(path))
        eval_table = doc.get("eval")
        if not isinstance(eval_table, dict):
            continue
        by_proto = {}
        for name, row in eval_table.items():
            if not isinstance(row, dict) or "instances_per_s" not in row:
                continue
            # protocol = (env, method, n): different envs have legitimately
            # different step costs and are not compared
            proto = (name.split("/")[0] if "/" in name else "",
                     name.split("/")[-1], row.get("n_instances"))
            by_proto.setdefault(proto, []).append((name, row["instances_per_s"]))
        for proto, rows in by_proto.items():
            rates = [r for _, r in rows]
            if len(rates) >= 2 and min(rates) > 0:
                assert max(rates) / min(rates) < 12.0, (
                    f"{path}: rows {[n for n, _ in rows]} share protocol "
                    f"{proto} but instances_per_s differ "
                    f"{max(rates)/min(rates):.0f}x — compile time is "
                    "leaking into a timing field")
        # paired eval_s for identical protocols (nar_tsp500 shape),
        # whether the rows live at top level or inside the eval table
        t_tr = doc.get("trained", eval_table.get("trained", {}))
        t_un = doc.get("untrained", eval_table.get("untrained", {}))
        if (isinstance(t_tr, dict) and isinstance(t_un, dict)
                and "eval_s" in t_tr and "eval_s" in t_un
                and min(t_tr["eval_s"], t_un["eval_s"]) > 0):
            ratio = max(t_tr["eval_s"], t_un["eval_s"]) / min(
                t_tr["eval_s"], t_un["eval_s"])
            explained = any("warmup" in k or "note" in k
                            for d in (t_tr, t_un, doc) for k in d)
            assert ratio < 12.0 or explained, (
                f"{path}: trained/untrained eval_s differ {ratio:.0f}x "
                "with no warmup/note field — compile in timing")
