"""Render SCALING.json (or another scaling-run JSON) as a BENCH.md
results table.

The rendered block is delimited by an explicit marker pair::

    <!-- SCALING_RESULTS -->
    ...rendered table...
    <!-- /SCALING_RESULTS -->

--write replaces exactly the span between the pair (hand-written
prose outside the pair is never touched).  A bare begin marker with
no end marker (first render into a fresh placeholder) is upgraded to
a pair: the block replaces marker..(next heading or next comment),
which is the legacy placeholder convention.

Usage: python scripts/render_scaling_md.py [--write]
           [--json PATH] [--marker NAME]
  --json PATH    render a result file other than SCALING.json
  --marker NAME  substitute a different BENCH.md marker (e.g.
                 SCALING_RESULTS_40K) so multiple fixture sizes
                 coexist
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARKER_NAME = "SCALING_RESULTS"


def render(s: dict, marker_name: str = MARKER_NAME) -> str:
    levels = sorted(
        int(k[len("local"):]) for k in s if re.fullmatch(r"local\d+", k)
    )
    lines = [f"<!-- {marker_name} -->", ""]
    if s.get("reconstructed_from_log"):
        crit = (s.get("pairs") or {}).get(s.get("criterion_pair"), {})
        npairs = crit.get("n_complete_pairs")
        lines.append(
            f"**PARTIAL — reconstructed from the per-leg log** "
            f"({npairs if npairs is not None else '?'} complete "
            f"criterion pair(s); run interrupted or still in flight). "
            f"Not the finished pre-registered measurement."
        )
        lines.append("")
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
    # frontier-expansion wall-time is half the north-rule metric
    # ("crawled URLs/sec + frontier-expansion wall-time"); show it per
    # level when the run recorded it (older merged files may lack it)
    has_expand = all("frontier_expand_sec" in s[f"local{k}"] for k in levels)
    exp_hdr = " frontier-expand (s) |" if has_expand else ""
    lines.append(
        f"| level | min wall (s) | URLs/s |{exp_hdr} all walls (s) | pinned-core util |"
    )
    lines.append("|---|---|---|---|---|" + ("---|" if has_expand else ""))
    for k in levels:
        b = s[f"local{k}"]
        walls = ", ".join(f"{w:.0f}" for w in s["all_runs_wall_sec"][str(k)])
        utils = ", ".join(
            f"{u:.2f}" for u in s["cpu_util_pinned_cores"][str(k)] if u is not None
        )
        exp = f" {b['frontier_expand_sec']:.2f} |" if has_expand else ""
        # a summary reconstructed from the per-leg log knows only walls
        # (URLs/s needs the worker's dispatch count, which only the
        # final JSON records)
        ups = b.get("urls_per_sec")
        lines.append(
            f"| local[{k}] | {b['wall_sec']:.1f} | "
            f"{f'{ups:.1f}' if ups is not None else '—'} |{exp}"
            f" {walls} | {utils} |"
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
    lines.append(f"<!-- /{marker_name} -->")
    return "\n".join(lines)


def substitute(text: str, block: str, marker_name: str) -> str:
    """Replace the marker_name region of ``text`` with ``block``.

    Prefers the exact begin..end marker pair; falls back to the legacy
    bare-placeholder span (begin marker up to the next heading or
    comment) when no end marker exists yet.
    """
    begin = re.escape(f"<!-- {marker_name} -->")
    end = re.escape(f"<!-- /{marker_name} -->")
    paired = re.compile(begin + r".*?" + end, re.S)
    if paired.search(text):
        return paired.sub(lambda _m: block, text, count=1)
    bare = re.compile(begin + r".*?(?=\n#|\n<!--|\Z)", re.S)
    if not bare.search(text):
        raise SystemExit(f"marker <!-- {marker_name} --> not found in BENCH.md")
    return bare.sub(lambda _m: block + "\n", text, count=1)


def _argval(flag: str, default: str) -> str:
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


def main() -> int:
    json_path = _argval("--json", os.path.join(REPO, "SCALING.json"))
    marker_name = _argval("--marker", MARKER_NAME)
    with open(json_path) as f:
        s = json.load(f)
    md = render(s, marker_name)
    if "--write" in sys.argv:
        path = os.path.join(REPO, "BENCH.md")
        text = open(path).read()
        open(path, "w").write(substitute(text, md, marker_name))
        print("BENCH.md updated")
    else:
        print(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
