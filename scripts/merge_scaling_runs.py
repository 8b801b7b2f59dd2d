"""Merge multiple same-engine scaling_bench runs into one SCALING.json.

Same-window pairwise ratios only ever come from legs inside ONE
invocation (leg i of N ran right before leg i of 4N there); merging
concatenates those per-run pair lists and the per-level walls, then
recomputes the median-pairwise headline over the union.  Refuses to
merge runs whose fixture signature or dispatch fingerprints differ —
combining is only valid for the identical engine + identical input.

Usage: python scripts/merge_scaling_runs.py RUN1.json RUN2.json ... [--write]
  each RUNx.json is a scaling_bench summary (the final JSON block of a
  tee'd log is fine if the file is just that JSON); --write saves to
  repo SCALING.json, else prints.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_summary(path: str) -> dict:
    text = open(path).read()
    # tolerate a log file: take the last top-level {...} block
    start = text.rfind("\n{")
    if start != -1 and not text.lstrip().startswith("{"):
        text = text[start:]
    else:
        text = text[text.find("{"):]
    # trim trailing junk after the final closing brace
    depth = 0
    for i, ch in enumerate(text):
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                text = text[: i + 1]
                break
    return json.loads(text)


def main() -> int:
    paths = [a for a in sys.argv[1:] if a != "--write"]
    if len(paths) < 2:
        raise SystemExit("need >=2 run summaries")
    runs = [load_summary(p) for p in paths]

    sig = {(r["n_seeds"], r["n_hosts"], r["dim_profile"]) for r in runs}
    if len(sig) != 1:
        raise SystemExit(f"fixture mismatch across runs: {sig}")
    if not all(r["order_and_seen_identical"] for r in runs):
        raise SystemExit("a run had non-identical fingerprints; refusing")
    fps = {
        r[k]["dispatch_fingerprint"]
        for r in runs
        for k in r
        if re.fullmatch(r"local\d+", k)
    }
    if len(fps) != 1:
        raise SystemExit(f"dispatch fingerprints differ across runs: {fps}")

    levels = sorted(
        {int(k[len("local"):]) for r in runs for k in r if re.fullmatch(r"local\d+", k)}
    )
    walls: dict[int, list[float]] = {k: [] for k in levels}
    utils: dict[int, list[float]] = {k: [] for k in levels}
    pairwise: dict[str, list[float]] = {}
    n_dispatched = runs[0][f"local{levels[0]}"]["n_dispatched"]
    for r in runs:
        for k in levels:
            if f"local{k}" not in r:
                continue
            walls[k] += r["all_runs_wall_sec"][str(k)]
            utils[k] += [
                u for u in r["cpu_util_pinned_cores"][str(k)] if u is not None
            ]
        for pname, p in r.get("pairs", {}).items():
            pairwise.setdefault(pname, []).extend(p["pairwise_speedup"])

    best = {
        k: {
            "cpus": k,
            "n_dispatched": n_dispatched,
            "wall_sec": min(walls[k]),
            "urls_per_sec": round(n_dispatched / min(walls[k]), 2),
            "dispatch_fingerprint": next(iter(fps)),
        }
        for k in levels
    }
    # hardware ceiling: latest run's probe (noisy per-window; earlier
    # probes preserved under provenance)
    ceiling = runs[-1]["hardware_ceiling"]
    pairs = {}
    for pname, pw in pairwise.items():
        n = int(pname.split("->")[0])
        pw = sorted(pw)
        med = pw[len(pw) // 2] if len(pw) % 2 else (pw[len(pw) // 2 - 1] + pw[len(pw) // 2]) / 2
        eff = med / 4.0
        hi = int(pname.split("->")[1])
        eff_min = (best[hi]["urls_per_sec"] / best[n]["urls_per_sec"]) / 4.0
        kc = ceiling.get("kernel_pair_efficiency", {}).get(pname)
        # A measured kernel "ceiling" above 1.0 is probe noise (no kernel
        # scales superlinearly on 4x cores); the true ceiling is <=1, so
        # clamp for the normalization while reporting the raw probe.
        kc_eff = min(kc, 1.0) if kc else None
        pairs[pname] = {
            "speedup_median_pairwise": round(med, 3),
            "efficiency": round(eff, 3),
            "efficiency_min_per_level": round(eff_min, 3),
            "efficiency_vs_hardware_ceiling": round(eff / kc_eff, 3) if kc_eff else None,
            "kernel_ceiling_efficiency": kc,
            "pairwise_speedup": pw,
        }
    crit = f"{levels[0]}->{4 * levels[0]}"
    if crit not in pairs:
        crit = next(iter(pairs))
    summary = {
        **{f"local{k}": best[k] for k in levels},
        "criterion_pair": crit,
        "scaling_efficiency": pairs[crit]["efficiency"],
        "efficiency_vs_hardware_ceiling": pairs[crit]["efficiency_vs_hardware_ceiling"],
        "pairs": pairs,
        "hardware_ceiling": ceiling,
        "order_and_seen_identical": True,
        "cpu_util_pinned_cores": {str(k): utils[k] for k in levels},
        "all_runs_wall_sec": {str(k): walls[k] for k in levels},
        "repeats": {str(k): len(walls[k]) for k in levels},
        "estimator": "median of same-window pairwise ratios across merged runs",
        "merged_from_runs": [
            {
                "repeats": r["repeats"],
                "levels": sorted(
                    int(k[len("local"):]) for k in r if re.fullmatch(r"local\d+", k)
                ),
                "hardware_ceiling": r["hardware_ceiling"],
            }
            for r in runs
        ],
        "n_seeds": runs[0]["n_seeds"],
        "n_hosts": runs[0]["n_hosts"],
        "dim_profile": runs[0]["dim_profile"],
    }
    out = json.dumps(summary, indent=2)
    if "--write" in sys.argv:
        with open(os.path.join(REPO, "SCALING.json"), "w") as f:
            f.write(out + "\n")
        print("SCALING.json written")
    else:
        print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
