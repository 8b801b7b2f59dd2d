"""Graph operators for dup-cluster resolution.

Near-dup detection (neardup.py / similarity.py) emits PAIRS; a training
pipeline needs CLUSTERS — one keeper per group of mutual near-dups,
which is connected components over the pair graph.  ``connected_
components`` is min-label propagation expressed purely as DataFrame
joins/aggregations (no GraphX/graphframes dependency, no driver-side
graph):

    labels <- node id
    repeat: label(v) <- min(label(v), min over neighbors u of label(u))
    until the global label sum stops changing

Each iteration is one shuffle join (edges x labels) + one min-agg —
converges in O(max component diameter) iterations.  Near-dup graphs
are the friendly regime: components are small dense cliques (diameter
1-3), so 2-4 iterations close even at 10^10 docs.  For adversarially
long chains pass ``algorithm="star"``: the alternating
large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SOCC 2014) converges in
O(log^2 n) rounds with the same join primitives, independent of
component diameter.  min-label stays the default because its
per-round cost is lower in the clique regime the near-dup consumers
produce.

Convergence detection is O(1) extra work: labels only ever DECREASE
(min of mins), so the global sum of labels strictly decreases until
the fixpoint — compare one aggregated decimal(38,0) per iteration
(hashed int64 ids overflow a long sum), no row-level old-vs-new join.

Component ids are deterministic (min node id in the component), so
"keeper = component id" gives the same canonical document at any
parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    nodes: DataFrame | None = None,
    max_iter: int = 50,
    algorithm: str = "min-label",
) -> DataFrame:
    """(node, component) for every node, component = min node id in its
    connected component.  ``edges`` are undirected pairs; ``nodes``
    (single ``node`` column) adds isolated vertices (they label
    themselves).  Edge endpoints are always folded into the node set —
    a ``nodes`` frame that misses an endpoint cannot silently break the
    min-id invariant.  Node ids must be numeric: the convergence check
    compares the global label SUM (monotone under min-propagation),
    which a string id type would turn into a NULL == NULL early-stop
    with wrong labels.

    ``algorithm``: ``"min-label"`` (default) converges in O(component
    diameter) iterations — right for near-dup graphs (small dense
    cliques, diameter 1-3) and raises past ``max_iter`` rather than
    silently mislabeling.  ``"star"`` is the alternating
    large-star/small-star algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SOCC 2014): O(log^2 n) rounds
    regardless of diameter — the fallback the min-label error message
    points long-chain graphs at.  Identical output contract."""
    if algorithm == "star":
        return _cc_star(edges, a, b, nodes, max_iter)
    if algorithm != "min-label":
        raise ValueError(f"unknown algorithm {algorithm!r}: min-label | star")
    und = (
        edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .unionByName(edges.select(F.col(b).alias("u"), F.col(a).alias("v")))
        .distinct()
        .persist()
    )
    endpoints = und.select(F.col("u").alias("node"))
    if nodes is None:
        nodes = endpoints.distinct()
    else:
        nodes = nodes.select("node").unionByName(endpoints).distinct()
    node_type = dict(nodes.dtypes)["node"]
    if node_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"connected_components needs integer node ids (got {node_type}); "
            "hash string keys to int64 first (e.g. text.md5_int60)"
        )
    # convergence probe sums the labels — as decimal(38,0), not long:
    # hashed node ids run to 2^60 and a few hundred of them overflow
    # int64 under ANSI mode (decimal sums stay exact to ~10^19 nodes)
    _label_sum = F.sum(F.col("component").cast("decimal(38,0)"))
    labels = nodes.select("node", F.col("node").alias("component")).persist()
    prev_sum = labels.agg(_label_sum).first()[0]
    for _ in range(max_iter):
        cand = und.join(labels, und.u == labels.node, "inner").select(
            F.col("v").alias("node"), "component"
        )
        # localCheckpoint truncates the logical plan: without it every
        # iteration re-analyzes the whole join tree built so far and
        # driver time grows quadratically with iteration count
        new_labels = (
            labels.unionByName(cand)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        new_sum = new_labels.agg(_label_sum).first()[0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            "(component diameter exceeds the near-dup regime; retry with "
            "algorithm='star' — O(log^2 n) rounds on long-chain graphs)"
        )
    und.unpersist()
    return labels


def _cc_star(
    edges: DataFrame,
    a: str,
    b: str,
    nodes: DataFrame | None,
    max_iter: int,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris
    et al. SOCC'14).  State is the canonical undirected edge set
    (hi > lo); each round is two grouped-min joins:

      large-star: every node attaches its LARGER neighbors to the
        minimum of its neighborhood (incl. itself) — long chains fold
        toward local minima without growing any neighborhood.
      small-star: every node attaches its SMALLER neighbors (and
        itself) to their minimum — stars flatten onto their centers.

    At the fixpoint the edge set is a star forest whose centers are
    the component minima, so labels read straight off the edges.  The
    fixpoint test is exact set equality (count + anti-join), not a
    checksum."""
    cand = edges.select(
        F.greatest(F.col(a), F.col(b)).alias("hi"),
        F.least(F.col(a), F.col(b)).alias("lo"),
    )
    endpoints = cand.select(F.col("hi").alias("node")).unionByName(
        cand.select(F.col("lo").alias("node"))
    )
    if nodes is None:
        all_nodes = endpoints.distinct()
    else:
        all_nodes = nodes.select("node").unionByName(endpoints).distinct()
    node_type = dict(all_nodes.dtypes)["node"]
    if node_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"connected_components needs integer node ids (got {node_type}); "
            "hash string keys to int64 first (e.g. text.md5_int60)"
        )
    all_nodes = all_nodes.persist()
    e = cand.filter(F.col("hi") != F.col("lo")).distinct().persist()
    n_edges = e.count()
    for _ in range(max_iter):
        if n_edges == 0:
            break
        # ---- large-star: full neighborhoods (both directions)
        und = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        m_u = und.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m")
        )
        ls = (
            und.join(m_u, "u")
            .filter(F.col("v") > F.col("u"))  # v > u >= m, so (v, m) is canonical
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # ---- small-star: smaller neighbors only (hi > lo by canon)
        m_u2 = ls.groupBy("hi").agg(F.min("lo").alias("m"))
        joined = ls.join(m_u2, "hi")
        e_new = (
            joined.filter(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .unionByName(m_u2.select(F.col("hi"), F.col("m").alias("lo")))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
            .localCheckpoint(eager=True)  # truncate the per-round lineage
        )
        n_new = e_new.count()
        changed = (
            n_new != n_edges
            or not e_new.join(e, ["hi", "lo"], "left_anti").isEmpty()
        )
        e.unpersist()
        e = e_new
        n_edges = n_new
        if not changed:
            break
    else:
        raise RuntimeError(
            f"star connected_components did not converge in {max_iter} rounds"
        )
    # star forest: hi -> lo(center); centers and isolated nodes label
    # themselves.  A min-agg guards the (converged-correct) uniqueness.
    labels = (
        e.select(F.col("hi").alias("node"), F.col("lo").alias("component"))
        .unionByName(all_nodes.select("node", F.col("node").alias("component")))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    labels = labels.localCheckpoint(eager=True)
    e.unpersist()
    all_nodes.unpersist()
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    damping_pct: int = 85,
    broadcast_max_nodes: int = 1_000_000,
) -> DataFrame:
    """(node, rank_micros) after ``n_iter`` synchronous PageRank
    iterations — host-authority scoring for frontier prioritization
    (the reference crawls hosts blindly in insertion order,
    otodom/orchestrator/handler.go:59-101; rank-ordered frontiers are
    the standard web-scale upgrade).

    EXACT integer arithmetic: ranks live in micro-units (node mass
    starts at 1_000_000), each iteration a node sends
    ``rank DIV outdeg`` to every out-neighbor and collects
    ``(100-damping_pct)*10_000 + damping_pct*inflow DIV 100``.
    Integer sums are associative-exact, so the result is bit-identical
    at any parallelism and cross-engine (a float PageRank hash-diverges
    under Spark's nondeterministic partial-sum order).  Dangling-node
    mass is dropped (the "pruned" PageRank variant) — documented, not a
    bug; total mass is not conserved but relative authority is.

    Join strategy by graph size: with ≤ ``broadcast_max_nodes`` nodes
    the per-iteration edges⋈ranks join BROADCASTS the rank table, so
    the persisted edge set never re-shuffles and each iteration costs
    one exchange (the contribution sum's node-sized partials).  Above
    the threshold (rank table too big for executor memory) it falls
    back to the shuffled hash join — there, pre-partition the persisted
    edge frame by ``src`` so iterations reuse its exchange and only the
    rank table moves.  Unlike connected_components there is NO per-iteration
    action (fixed iteration count, no convergence probe), so the whole
    recurrence is ONE lazy plan — linear in n_iter, each cached input
    referenced by name — materialized by a single eager
    ``localCheckpoint`` at the end: one Spark job total, and the
    persisted inputs are released immediately after it.
    """
    # e feeds nodes (twice) and ew (twice, via the deg self-join) —
    # persist it or the distinct shuffle replays up to 3x at setup
    e = (
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .unionByName(e.select(F.col("e_dst").alias("node")))
        .distinct()
        .persist()
    )
    deg = e.groupBy("e_src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = (100 - damping_pct) * 10_000
    # one tiny job; also materializes the nodes cache before the loop
    small_ranks = nodes.count() <= broadcast_max_nodes
    ew = e.join(deg, "e_src")
    if not small_ranks:
        # big-graph regime: the per-iteration join shuffles on e_src, so
        # persist the edge frame ALREADY hash-partitioned by e_src —
        # without the explicit repartition Catalyst may broadcast `deg`
        # and cache ew under the upstream distinct's (src,dst) layout,
        # re-shuffling the full edge table every iteration
        ew = ew.repartition("e_src")
    ew = ew.persist()
    ranks = nodes.select(
        "node", F.lit(1_000_000).cast("long").alias("rank_micros")
    )
    for _ in range(n_iter):
        r = F.broadcast(ranks) if small_ranks else ranks
        contrib = (
            ew.join(r, ew.e_src == ranks.node, "inner")
            .select(
                F.col("e_dst").alias("node"),
                F.expr("rank_micros DIV outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        if small_ranks:  # contrib is node-sized: cached nodes never shuffle
            contrib = F.broadcast(contrib)
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(c, 0L)) DIV 100")
            )
            .cast("long")
            .alias("rank_micros"),
        )
    ranks = ranks.localCheckpoint(eager=True)
    e.unpersist()
    ew.unpersist()
    nodes.unpersist()
    return ranks


def resolve_chains(
    mapping: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 64,
) -> DataFrame:
    """(src, final, hops) — follow a functional edge set (each node has
    at most ONE outgoing edge: redirects, aliases, symlink-style
    forwarding) to its terminal node, by POINTER DOUBLING: the jump
    table starts as the 1-hop mapping and composes with itself each
    round, so a chain of length L resolves in ceil(log2 L) self-joins
    — at 10^10 URLs with redirect chains of length <=32, five shuffles
    total, versus 32 for naive per-hop iteration (and no driver-side
    loop over collected rows).

    Each jump row carries its true hop WEIGHT, so compositions
    accumulate exact path lengths.  ``max_hops`` is the longest chain
    guaranteed resolved: ``bit_length(max_hops)`` doubling rounds cover
    ``2**bit_length(max_hops) > max_hops`` hops.  A cycle never reaches
    a terminal, so its row keeps composing every round and finishes
    with ``hops == 2**rounds > max_hops``, while a legitimately
    resolved chain's hops is its exact length ``<= max_hops`` —
    callers that must reject cycles filter ``hops > max_hops`` (an
    arbitrary mid-cycle node is reported as ``final`` for such rows).
    Crawl semantics per the reference's fetch loop:
    colly follows HTTP redirects internally (a fetched URL IS its
    terminal target); this operator makes the hop explicit so the
    URL-seen set can store canonical terminals.
    """
    if not (isinstance(src, str) and isinstance(dst, str)):
        raise TypeError("src/dst are COLUMN NAMES; pass max_hops by keyword")
    # jump: src -> (to, w) — exactly one row per src (functional graph)
    jump = mapping.select(
        F.col(src).alias("j_src"), F.col(dst).alias("j_to"), F.lit(1).alias("j_w")
    ).persist()
    # state: every source node, resolved as far as the jump table goes
    state = mapping.select(
        F.col(src).alias("node"), F.col(dst).alias("final"), F.lit(1).alias("hops")
    ).persist()
    rounds = max(1, max_hops).bit_length()
    for _ in range(rounds):
        # compose the jump table with itself: 2^i -> 2^(i+1) hops
        j2 = (
            jump.alias("x")
            .join(jump.alias("y"), F.col("x.j_to") == F.col("y.j_src"), "left")
            .select(
                F.col("x.j_src").alias("j_src"),
                F.coalesce(F.col("y.j_to"), F.col("x.j_to")).alias("j_to"),
                (
                    F.col("x.j_w") + F.coalesce(F.col("y.j_w"), F.lit(0))
                ).alias("j_w"),
            )
            .persist()
        )
        state2 = (
            state.join(j2, state["final"] == j2["j_src"], "left")
            .select(
                "node",
                F.coalesce(F.col("j_to"), F.col("final")).alias("final"),
                (F.col("hops") + F.coalesce(F.col("j_w"), F.lit(0))).alias("hops"),
            )
            .persist()
        )
        jump.unpersist()
        state.unpersist()
        jump, state = j2, state2
    jump.unpersist()
    return state.select(
        "node", "final", F.col("hops").cast("long").alias("hops")
    )
