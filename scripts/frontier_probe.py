"""Frontier-scale probe: is steady-round cost flat in frontier size?

The 10^10-URL claim rests on rounds touching O(head + delta), never
O(|frontier|): the politeness window reads the per-host top-K head
table, the tail lives in a base+delta log consulted only at
compaction refills (sinks/StateStore, BENCH.md "What would change on
a real cluster").  This script MEASURES that instead of asserting it:

- ONE synthetic web (pages/robots/images from the LARGE seed set) so
  the fetch join's scan side is identical in both levels — a real
  fetch costs per dispatched URL, so letting the small level scan a
  25x-smaller web table would charge the large level fixture cost
  and call it frontier cost; only the SEED table differs (the large
  level's full set vs a host-spread subset), so only the frontier
  differs, and per-round dispatch stays budget-bound and equal;
- alternating legs A/B/A/B inside one Spark session (same JVM, same
  codegen, same host window — the VM's documented 2-4x drift makes
  cross-window division meaningless), a warmup run first;
- steady rounds only (2..R, no bootstrap, compaction cadence beyond
  the horizon so no refill round is mixed in);
- reports per-level median steady-round wall and the large/small
  ratio: flat = ratio ~1 despite the 10x frontier.

Usage:  python scripts/frontier_probe.py [OUT_DIR]
Env:    PROBE_SEEDS_SMALL (default 2000), PROBE_MULT (10),
        PROBE_HOSTS (64), PROBE_ROUNDS (5), PROBE_REPEATS (3),
        PROBE_CPUS (8).
Writes OUT_DIR/frontier_probe.json and prints RESULT {json}.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark import fixtures as FX
from crawler_spark.engine import CrawlConfig, CrawlEngine
from crawler_spark.session import get_spark
from crawler_spark.sinks import StateStore


def _run_rounds(spark, fixture_paths, root, rounds):
    """Bootstrap + `rounds` rounds; returns per-round walls + stats."""
    if os.path.exists(root):
        shutil.rmtree(root)
    cfg = CrawlConfig(
        base_budget=4,
        max_rounds=rounds,
        # compaction beyond the horizon: every measured round is steady
        frontier_compact_every=1000,
    )
    store = StateStore(spark, root)
    engine = CrawlEngine(
        spark,
        store,
        web_pages=spark.read.parquet(fixture_paths["web_pages"]),
        web_images=spark.read.parquet(fixture_paths["web_images"]),
        robots=spark.read.parquet(fixture_paths["robots"]),
        config=cfg,
    )
    engine.bootstrap(spark.read.parquet(fixture_paths["seeds"]))
    walls, stats = [], []
    for r in range(1, rounds + 1):
        t0 = time.perf_counter()
        s = engine.run_round(r)
        walls.append(round(time.perf_counter() - t0, 3))
        stats.append(s)
        if s["n_dispatched"] == 0:
            break
    return walls, stats


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/frontier_probe"
    os.makedirs(out_dir, exist_ok=True)
    n_small = int(os.environ.get("PROBE_SEEDS_SMALL", 2000))
    mult = int(os.environ.get("PROBE_MULT", 10))
    n_hosts = int(os.environ.get("PROBE_HOSTS", 64))
    rounds = int(os.environ.get("PROBE_ROUNDS", 5))
    repeats = int(os.environ.get("PROBE_REPEATS", 3))
    cpus = int(os.environ.get("PROBE_CPUS", 8))

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    large = FX.write_fixtures(
        spark, os.path.join(out_dir, "web"),
        n_seeds=n_small * mult, n_hosts=n_hosts, n_images=400,
    )
    # small level: same web, seeds = every mult-th seed_id.  The host
    # is a hash of seed_id (gen_seeds_df), independent of the id
    # stride, so the subset spreads over all hosts uniformly and the
    # per-round politeness budget stays saturated at both levels.
    from pyspark.sql import functions as F

    small_seeds = os.path.join(out_dir, "seeds_small")
    (
        spark.read.parquet(large["seeds"])
        .filter(F.col("seed_id") % mult == 0)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(small_seeds)
    )
    fx = {"large": large, "small": {**large, "seeds": small_seeds}}

    # warmup: codegen + python-worker spin-up paid before any timed leg
    _run_rounds(spark, fx["small"], os.path.join(out_dir, "state_warm"), 2)

    legs: dict[str, list[dict]] = {"small": [], "large": []}
    for rep in range(repeats):
        for name in ("small", "large"):  # alternating, same host window
            walls, stats = _run_rounds(
                spark, fx[name], os.path.join(out_dir, f"state_{name}_{rep}"), rounds
            )
            legs[name].append(
                {
                    "round_walls_sec": walls,
                    "steady_walls_sec": walls[1:],  # round 1 folds bootstrap cache effects
                    "frontier_rows": [s["frontier_rows"] for s in stats],
                    "dispatched": [s["n_dispatched"] for s in stats],
                }
            )

    def _summary(name: str) -> dict:
        runs = legs[name]
        steady = [w for r in runs for w in r["steady_walls_sec"]]
        return {
            "median_steady_round_sec": round(statistics.median(steady), 3),
            "min_steady_round_sec": round(min(steady), 3),
            "frontier_rows_round1": runs[0]["frontier_rows"][0],
            "dispatched_per_round": runs[0]["dispatched"],
            "all_steady_walls_sec": steady,
        }

    small_s, large_s = _summary("small"), _summary("large")
    result = {
        "protocol": {
            "seeds": {"small": n_small, "large": n_small * mult},
            "n_hosts": n_hosts,
            "rounds_per_leg": rounds,
            "repeats_alternating": repeats,
            "cpus": cpus,
            "compaction": "beyond horizon (steady rounds only)",
        },
        "small": small_s,
        "large": large_s,
        "frontier_size_ratio": round(
            large_s["frontier_rows_round1"] / max(1, small_s["frontier_rows_round1"]), 2
        ),
        "steady_round_wall_ratio_median": round(
            large_s["median_steady_round_sec"]
            / max(1e-9, small_s["median_steady_round_sec"]),
            3,
        ),
        "steady_round_wall_ratio_min": round(
            large_s["min_steady_round_sec"] / max(1e-9, small_s["min_steady_round_sec"]),
            3,
        ),
    }
    with open(os.path.join(out_dir, "frontier_probe.json"), "w") as f:
        json.dump(result, f, indent=1)
    print("RESULT " + json.dumps(result))


if __name__ == "__main__":
    main()
