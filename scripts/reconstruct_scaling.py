"""Rebuild a scaling summary from an interrupted scaling_bench run.

scaling_bench.py writes its summary JSON only after ALL legs finish,
but it logs one stderr line per completed leg::

    LEG local[2] repeat 1: wall=1234.5s util=0.984 fp=090c17a5a60efa1b

If the orchestrator dies late (host fault, turn exhaustion), those
lines are the measurement — each records a finished, pinned,
fingerprinted leg.  This script parses them back into the same summary
shape scaling_bench emits (pairs/efficiency/median-pairwise estimator),
with the fields only the final JSON knows (kernel ceiling, URLs/s,
frontier-expand) left null and ``reconstructed_from_log: true`` set so
a reader can tell the provenance apart.

Usage: python scripts/reconstruct_scaling.py /tmp/scaling40k.err \
           [--n-seeds 40000] [--n-hosts 1280] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import re
import sys

_LEG = re.compile(
    r"LEG local\[(?P<cpus>\d+)\] repeat (?P<rep>\d+): "
    r"wall=(?P<wall>[\d.]+)s util=(?P<util>[\d.]+|nan) fp=(?P<fp>[0-9a-f]+)"
)


def parse_legs(text: str) -> dict[int, list[dict]]:
    runs: dict[int, list[dict]] = {}
    for m in _LEG.finditer(text):
        cpus = int(m.group("cpus"))
        runs.setdefault(cpus, []).append(
            {
                "cpus": cpus,
                "wall_sec": float(m.group("wall")),
                "cpu_util_pinned_cores": (
                    None if m.group("util") == "nan" else float(m.group("util"))
                ),
                "dispatch_fingerprint": m.group("fp"),
            }
        )
    return runs


def summarize(runs: dict[int, list[dict]], n_seeds: int, n_hosts: int) -> dict:
    """Same pairs/efficiency math as scaling_bench.main, walls only.
    Only COMPLETE same-window pairs enter the median (a trailing
    unpaired small-level leg is reported in all_runs but not paired)."""
    if not runs:
        raise SystemExit("no LEG lines found")
    levels = sorted(runs)
    best = {k: min(rs, key=lambda r: r["wall_sec"]) for k, rs in runs.items()}
    fps = {r["dispatch_fingerprint"] for rs in runs.values() for r in rs}
    pairs = {}
    for n in levels:
        if 4 * n not in runs:
            continue
        pw = sorted(
            round(a["wall_sec"] / b["wall_sec"], 3)
            for a, b in zip(runs[n], runs[4 * n])
        )
        if not pw:
            continue
        med = (
            pw[len(pw) // 2]
            if len(pw) % 2
            else (pw[len(pw) // 2 - 1] + pw[len(pw) // 2]) / 2
        )
        eff_min = best[n]["wall_sec"] / best[4 * n]["wall_sec"] / 4.0
        pairs[f"{n}->{4 * n}"] = {
            "speedup_median_pairwise": round(med, 3),
            "efficiency": round(med / 4.0, 3),
            "efficiency_min_per_level": round(eff_min, 3),
            "efficiency_vs_hardware_ceiling": None,
            "kernel_ceiling_efficiency": None,
            "pairwise_speedup": pw,
            "n_complete_pairs": len(pw),
        }
    if not pairs:
        raise SystemExit("no complete N->4N pair finished; nothing to report")
    crit = (
        f"{levels[0]}->{4 * levels[0]}"
        if f"{levels[0]}->{4 * levels[0]}" in pairs
        else next(iter(pairs))
    )
    return {
        **{
            f"local{k}": {
                "cpus": k,
                "wall_sec": best[k]["wall_sec"],
                "dispatch_fingerprint": best[k]["dispatch_fingerprint"],
            }
            for k in levels
        },
        "criterion_pair": crit,
        "scaling_efficiency": pairs[crit]["efficiency"],
        "efficiency_vs_hardware_ceiling": None,
        "pairs": pairs,
        "hardware_ceiling": None,
        "order_and_seen_identical": len(fps) == 1,
        "cpu_util_pinned_cores": {
            k: [r["cpu_util_pinned_cores"] for r in rs] for k, rs in runs.items()
        },
        "all_runs_wall_sec": {k: [r["wall_sec"] for r in rs] for k, rs in runs.items()},
        "repeats": {k: len(rs) for k, rs in runs.items()},
        "estimator": "median of same-window pairwise ratios (reconstructed from leg log)",
        "n_seeds": n_seeds,
        "n_hosts": n_hosts,
        "reconstructed_from_log": True,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("log", help="stderr log of an interrupted scaling_bench run")
    ap.add_argument("--n-seeds", type=int, default=40000)
    ap.add_argument("--n-hosts", type=int, default=1280)
    ap.add_argument("--out", help="write JSON here instead of stdout")
    args = ap.parse_args()
    with open(args.log) as f:
        summary = summarize(parse_legs(f.read()), args.n_seeds, args.n_hosts)
    text = json.dumps(summary, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
