"""Render SCALING.json as the BENCH.md results table.

Substitutes everything between the `<!-- SCALING_RESULTS -->` marker
and the next heading (or appends after the marker if nothing follows).

Usage: python scripts/render_scaling_md.py [--write]
  default prints the rendered markdown; --write edits BENCH.md in
  place.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARKER = "<!-- SCALING_RESULTS -->"


def render(s: dict) -> str:
    levels = sorted(
        int(k[len("local"):]) for k in s if re.fullmatch(r"local\d+", k)
    )
    lines = [MARKER, ""]
    reps = s["repeats"]
    reps_txt = (
        ", ".join(f"local[{k}]×{v}" for k, v in sorted(reps.items(), key=lambda kv: int(kv[0])))
        if isinstance(reps, dict)
        else str(reps)
    )
    lines.append(
        f"Fixture: {s['n_seeds']:,} seeds / {s['n_hosts']:,} hosts; "
        f"alternating repeats: {reps_txt}; estimator: "
        f"{s['estimator']}."
    )
    lines.append("")
    lines.append("| level | min wall (s) | URLs/s | all walls (s) | pinned-core util |")
    lines.append("|---|---|---|---|---|")
    for k in levels:
        b = s[f"local{k}"]
        walls = ", ".join(f"{w:.0f}" for w in s["all_runs_wall_sec"][str(k)])
        utils = ", ".join(
            f"{u:.2f}" for u in s["cpu_util_pinned_cores"][str(k)] if u is not None
        )
        lines.append(
            f"| local[{k}] | {b['wall_sec']:.1f} | {b['urls_per_sec']:.1f} "
            f"| {walls} | {utils} |"
        )
    lines.append("")
    lines.append(
        "| pair | median pairwise speedup | efficiency | eff (min-per-level) | kernel ceiling | same-window pair ratios |"
    )
    lines.append("|---|---|---|---|---|---|")
    for name, p in s["pairs"].items():
        mark = " **(criterion)**" if name == s.get("criterion_pair") else ""
        pw = ", ".join(f"{x:.2f}" for x in p["pairwise_speedup"])
        kc = p.get("kernel_ceiling_efficiency")
        sp = p.get("speedup_median_pairwise", p.get("speedup"))
        em = p.get("efficiency_min_per_level")
        lines.append(
            f"| {name}{mark} | {sp:.2f}x | **{p['efficiency']:.3f}** "
            f"| {em if em is not None else '—'} "
            f"| {kc if kc is not None else '—'} | {pw} |"
        )
    lines.append("")
    lines.append(
        f"Dispatch fingerprint identical across every leg and level: "
        f"**{s['order_and_seen_identical']}** (order-sensitive digest of "
        f"the dispatch log + URL-seen set — the correctness half of the "
        f"north rule)."
    )
    lines.append("")
    return "\n".join(lines)


def _argval(flag: str, default: str) -> str:
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


def main() -> int:
    # --json PATH: render a result file other than SCALING.json
    # --marker NAME: substitute a different BENCH.md marker (e.g.
    #   SCALING_RESULTS_40K) so multiple fixture sizes coexist
    json_path = _argval("--json", os.path.join(REPO, "SCALING.json"))
    marker = "<!-- " + _argval("--marker", "SCALING_RESULTS") + " -->"
    with open(json_path) as f:
        s = json.load(f)
    md = render(s).replace(MARKER, marker, 1)
    if "--write" in sys.argv:
        path = os.path.join(REPO, "BENCH.md")
        text = open(path).read()
        # replace marker..(next heading OR next marker) with the
        # rendered block — stopping at the next `<!--` keeps sibling
        # sections (the other fixture size, its prose) intact
        pat = re.compile(re.escape(marker) + r".*?(?=\n#|\n<!--|\Z)", re.S)
        if not pat.search(text):
            raise SystemExit(f"marker {marker} not found in BENCH.md")
        open(path, "w").write(pat.sub(md + "\n", text, count=1))
        print("BENCH.md updated")
    else:
        print(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
