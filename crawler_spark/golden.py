"""Single-process pure-Python reference model of the crawl semantics.

This is the oracle for the north_rule's crawl-equivalence gate: a
direct, loop-based transliteration of the reference orchestrator's
semantics (seed → expand → politeness-bounded fetch → dedup-on-write,
otodom/orchestrator/handler.go + total_pages/handler.go + ON CONFLICT
commons/Entry.go:37) over the SAME fixture parquet files the Spark
engine reads.  No Spark, no parallelism — just dicts and sorts — so a
match means the distributed engine reproduces the sequential crawl
ordering and URL-seen set exactly (at any parallelism).

Every rule here must stay in lockstep with crawler_spark.engine; the
pinned quirks are cross-referenced to the reference file:line.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow.parquet as pq

from .canon import canonical_url, host_of, path_of, url_hash
from .operators.fetch import MAX_ATTEMPTS
from .operators.politeness import DEFAULT_BASE_BUDGET, DEFAULT_ROUND_MS


@dataclass
class GoldenResult:
    dispatch_log: list[tuple[int, int, int]] = field(default_factory=list)  # (round, seq, url_hash)
    seen: dict[int, int] = field(default_factory=dict)  # url_hash -> first_round
    n_results: int = 0
    # P2 dual projection: results split per extraction variant
    n_results_by_schema: dict[str, int] = field(default_factory=dict)
    # (schema_group=domain, schema_name, schema_version) -> first round seen
    # (S4 ON CONFLICT DO NOTHING: first writer wins)
    schema_keys: dict[tuple[str, str, str], int] = field(default_factory=dict)
    n_blocked_robots: int = 0
    rounds: int = 0


def _load_pages(web_pages_path: str) -> dict[int, dict]:
    t = pq.read_table(web_pages_path).to_pylist()
    return {r["url_hash"]: r for r in t}


def _load_robots(robots_path: str) -> dict[str, dict]:
    return {r["host"]: r for r in pq.read_table(robots_path).to_pylist()}


def _load_seeds(seeds_path: str) -> list[dict]:
    rows = pq.read_table(seeds_path).to_pylist()
    rows.sort(key=lambda r: r["seed_id"])
    return rows


def _budget(delay_ms: int | None, base: int, round_ms: int) -> int:
    d = delay_ms or 0
    if d <= 0:
        return base
    return max(1, min(base, round_ms // d))


def run_golden(
    seeds_path: str,
    web_pages_path: str,
    robots_path: str,
    base_budget: int = DEFAULT_BASE_BUDGET,
    round_ms: int = DEFAULT_ROUND_MS,
    max_rounds: int = 64,
    seed_limit: int | None = None,
) -> GoldenResult:
    web = _load_pages(web_pages_path)
    robots = _load_robots(robots_path)
    seeds = _load_seeds(seeds_path)
    if seed_limit is not None:
        seeds = seeds[:seed_limit]  # G7 single-seed pin, generalized

    res = GoldenResult()

    def blocked(url: str, host: str) -> bool:
        rule = robots.get(host)
        if not rule or not rule["disallow_prefix"]:
            return False
        return path_of(url).startswith(rule["disallow_prefix"])

    # frontier rows: dict url_hash -> (url, host, page, priority, attempts, seed)
    frontier: dict[int, dict] = {}
    for s in seeds:
        u = canonical_url(s["url"])
        h = host_of(u)
        if blocked(u, h):
            res.n_blocked_robots += 1
            continue
        uh = url_hash(u)
        if uh not in frontier:
            frontier[uh] = dict(
                url=u, host=h, page=0, priority=int(s.get("priority", 0)), attempts=0, seed=s
            )

    for rnd in range(1, max_rounds + 1):
        if not frontier:
            break
        res.rounds = rnd
        # politeness: per-host top-budget by (priority, page, url_hash)
        by_host: dict[str, list[int]] = {}
        for uh, row in frontier.items():
            by_host.setdefault(row["host"], []).append(uh)
        dispatch: list[int] = []
        for host, uhs in by_host.items():
            uhs.sort(key=lambda x: (frontier[x]["priority"], frontier[x]["page"], x))
            b = _budget(robots.get(host, {}).get("crawl_delay_ms"), base_budget, round_ms)
            dispatch.extend(uhs[:b])
        # global crawl order (O1 generalization of PageSorter, page.go:10-14)
        dispatch.sort(key=lambda x: (frontier[x]["priority"], frontier[x]["page"], x))
        for seq, uh in enumerate(dispatch, start=1):
            res.dispatch_log.append((rnd, seq, uh))

        new_candidates: list[dict] = []
        for uh in dispatch:
            row = frontier.pop(uh)
            page = web.get(uh)
            if page is None:  # permanent 404 → dead
                continue
            if row["attempts"] >= page["fail_attempts"]:
                # success (RetryAttempts model: first fail_attempts tries fail)
                res.seen[uh] = rnd
                res.n_results += len(page["listing_ids"])
                s = row["seed"]
                sn = s["schema_name"]
                res.n_results_by_schema[sn] = res.n_results_by_schema.get(sn, 0) + len(
                    page["listing_ids"]
                )
                key = (s["domain"], sn, s["schema_version"])
                res.schema_keys.setdefault(key, rnd)
                if row["page"] == 0:
                    # G2 expansion, pages 1..last_page-1 (off-by-one pin,
                    # total_pages/handler.go:53-65)
                    for p in range(1, page["last_page"]):
                        nu = row["url"] + ("&" if "?" in row["url"] else "?") + f"page={p}"
                        nu = canonical_url(nu)
                        new_candidates.append(
                            dict(url=nu, host=host_of(nu), page=p, priority=1,
                                 attempts=0, seed=row["seed"])
                        )
            else:
                row["attempts"] += 1
                if row["attempts"] < MAX_ATTEMPTS:
                    frontier[uh] = row  # retry next round
                # else dead (budget exhausted; reference panics here)

        for c in new_candidates:
            if blocked(c["url"], c["host"]):
                res.n_blocked_robots += 1
                continue
            uh = url_hash(c["url"])
            if uh in res.seen or uh in frontier:
                continue
            frontier[uh] = c

    return res
