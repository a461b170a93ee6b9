"""Duplicate-cluster resolution: connected components over near-dup pairs.

Pair-level dedup (``operators.dedup``) emits edges — (doc_a, doc_b) with
similarity ≥ threshold — but corpus curation needs *clusters*: if A~B and
B~C, all three are one duplicate group even when A~C was never scored
(LSH pruned it, or the chain is genuinely transitive-only). The reference
engine has nothing like this; it is part of the training-data tier this
engine adds on top.

Algorithm: alternating large-star/small-star contraction (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
MapReduce and Beyond", SoCC'14). Each round rewires edges toward per-
neighborhood minima:

- **large-star**: for every node u, every STRICTLY LARGER neighbor v is
  re-pointed at m(u) = min(Γ(u) ∪ {u});
- **small-star**: edges are oriented (larger → smaller) and every node u
  plus its (now all-smaller) neighbors are pointed at m(u).

Both operations preserve connectivity, and the alternation converges to
per-component star graphs (every node → component minimum) in
**O(log² n) rounds on ANY graph** — including the long chains that make
naive min-label propagation pay diameter rounds (1 hop of progress per
round). That is not hypothetical: the sf10 near-dup pair graph contains
a chain deeper than 25, which this module's previous min-label
implementation silently failed to converge on (its ``max_iters`` guard
returned partially-propagated labels). This implementation RAISES on
non-convergence instead — wrong cluster ids must never ship quietly.

Each half-round is one groupBy (per-node min) plus one equi-join
(re-point edges) over the pair-bounded edge set — all data-side; the
driver sees only the loop counter and a short-circuiting change probe.

Scale notes (100-TB posture):

- edge sets are ``localCheckpoint``-ed each round: without it the plan
  doubles per iteration and Catalyst re-derives the whole lineage at
  round k. A local checkpoint trades fault-tolerance of the cached
  blocks for zero HDFS round-trips; a production job on a real cluster
  with flaky executors should ``spark.sparkContext.setCheckpointDir``
  and use ``.checkpoint()`` instead (same call sites).
- the convergence probe is an exact edge-set comparison
  (count + ``exceptAll(...).limit(1)`` short-circuit), node/edge-bounded.
- work per round is O(|E|); rounds are O(log² n) worst-case and 3-5 in
  practice on near-dup graphs (stars and short chains).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.storagelevel import StorageLevel


def _large_star(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """(u,v) edge set → large-star rewiring: every neighbor v > u is
    re-pointed at m(u) = min(Γ(u) ∪ {u}). Input need not be symmetric;
    symmetry is restored map-side (the paper's map phase).

    The per-neighborhood minimum rides a whole-partition window over ONE
    exchange of the symmetrized edges instead of a groupBy + re-join
    (which keyed the same relation twice — guide §2.4). ``dedup=False``
    lets :func:`connected_components` skip the output distinct when the
    consumer is :func:`_small_star`, whose min is duplicate-insensitive
    and whose own distinct canonicalizes the round's output — one full
    exchange less per round; the set value is unchanged.

    Skew trade-off (documented per the round-12 advisory): WindowExec
    buffers each node's neighborhood in one task's group buffer
    (``ExternalAppendOnlyUnsafeRowArray`` — heap up to the spill
    threshold, disk past it), where the old groupBy(min)
    partial-aggregated map-side. The per-task ROW placement, however, is
    identical in both forms: the old form's re-JOIN of the mins onto the
    edges was keyed by the same ``u``, so a hub's whole neighborhood
    landed in one join task either way — the delta is a spillable buffer
    vs a streamed probe, not where the rows go. The hot key is the
    component minimum in late rounds (a star center's degree approaches
    its component size as contraction converges); its group buffer is
    16 B/edge and spills, it does not OOM. Accepted for the removed
    per-round |E|-scale exchange; a mins-broadcast variant would need a
    node-bounded broadcast per half-round and is not corpus-safe."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
    out = (
        sym.withColumn("m", m)
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    return out.distinct() if dedup else out


def _small_star(edges: DataFrame) -> DataFrame:
    """(u,v) edge set → small-star rewiring: orient every edge larger →
    smaller, then point each node u AND its (all smaller) neighbors at
    m(u) = min(Γ(u) ∪ {u}).

    Same one-exchange shape as :func:`_large_star`: the min rides a
    whole-partition window, and the per-source (u, m) row — emitted once
    per group by the old groupBy+join+union form — is emitted per ROW as
    the second element of an exploded pair and collapsed by the final
    distinct (which the output needs anyway): set-identical, two joins
    and one union fewer."""
    oriented = edges.select(
        F.greatest(F.col("u"), F.col("v")).alias("u"),
        F.least(F.col("u"), F.col("v")).alias("v"),
    ).where(F.col("u") != F.col("v"))
    m = F.min("v").over(Window.partitionBy("u"))  # m <= v < u always
    return (
        oriented.withColumn("m", m)
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("v").alias("a"), F.col("m").alias("b")),
                    F.struct(F.col("u").alias("a"), F.col("m").alias("b")),
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("u"), F.col("p.b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iters: int = 30,
) -> DataFrame:
    """Resolve undirected edges into components via alternating
    large-star/small-star contraction (see module docstring).

    Returns ``(doc_id, cluster_id)`` — one row per node that appears in any
    pair, ``cluster_id`` = the minimum doc_id of its component. Nodes with
    no edges (singletons) are the caller's concern: they are not cluster
    members and are simply absent here.

    Raises ``RuntimeError`` if the edge set has not reached its star-graph
    fixpoint within ``max_iters`` alternations — with the O(log² n) bound
    that would take a graph beyond any physical corpus, and returning
    partially-contracted labels silently is exactly the failure mode this
    rewrite removed (min-label propagation needed diameter rounds and the
    sf10 pair graph exceeded its iteration guard).
    """
    # eager checkpoint, not persist: the returned frame is consumed lazily
    # by the caller, and an unpersisted/evicted nodes scan would re-run
    # the (expensive) pair-generation lineage a second time
    nodes = (
        pairs.select(F.col(src_col).cast("long").alias("doc_id"))
        .unionByName(pairs.select(F.col(dst_col).cast("long").alias("doc_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = (
        pairs.select(
            F.col(src_col).cast("long").alias("u"),
            F.col(dst_col).cast("long").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    converged = n_edges == 0
    for _ in range(max_iters):
        if converged:
            break
        # Materialize once per round (eager localCheckpoint): the probe and
        # the next round both read cached blocks — no lineage growth.
        # dedup=False: _small_star's min is duplicate-insensitive and its
        # distinct canonicalizes the round — the intermediate distinct
        # was a full exchange buying nothing (set value proven unchanged)
        nxt = _small_star(_large_star(edges, dedup=False)).localCheckpoint(
            eager=True
        )
        n_nxt = nxt.count()
        if n_nxt == n_edges:
            # exact set comparison, short-circuiting at the first difference
            if nxt.exceptAll(edges).limit(1).count() == 0:
                converged = True
        edges, n_edges = nxt, n_nxt
    if not converged:
        raise RuntimeError(
            f"connected_components: star contraction did not converge in "
            f"{max_iters} rounds — input far exceeds the O(log^2 n) design "
            "envelope or the edge stream is unstable; refusing to return "
            "partially-contracted cluster ids"
        )
    # at the fixpoint every edge points node → component minimum; nodes
    # absent from the star edges are component minima themselves
    labels = edges.groupBy("u").agg(F.min("v").alias("comp"))
    out = (
        nodes.join(labels, nodes["doc_id"] == labels["u"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("comp"), F.col("doc_id"))
            .cast("long")
            .alias("cluster_id"),
        )
    )
    return out


def bfs_min_hops(
    pairs: DataFrame,
    seeds: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_hops: int = 3,
) -> DataFrame:
    """Multi-source BFS: minimum hop count from any seed, depth-bounded.

    Returns ``(doc_id, min_hops)`` for every node reachable from ``seeds``
    (a one-column ``doc_id`` DataFrame) within ``max_hops`` over the
    undirected ``pairs`` graph. Seeds themselves carry ``min_hops = 0``.

    This is the *node-frontier* formulation: each level expands the current
    frontier through one equi-join, collapses to DISTINCT nodes, and
    anti-joins the already-visited set before the next round. Intermediate
    state is therefore bounded by the node count at every level — a k-member
    clique costs O(k) rows per level, never the O(k^hops) a path-enumerating
    recursive UNION ALL pays on the same input. Levels are
    ``localCheckpoint``-ed so the plan does not re-derive prior frontiers
    (same rationale as :func:`connected_components`; swap for
    ``.checkpoint()`` on a real cluster).

    Round 12: the frontier/visited sides of the two per-level joins are
    explicitly broadcast while their EXACT row counts (free — each level
    is checkpointed and counted anyway; the break probe is that count)
    stay under the node-broadcast gate, so no level shuffles the edge
    list just to probe a node-bounded frontier (the checkpointed frames
    carry no size statistics, same planner blind spot as
    :func:`pagerank_fixed`). Past the gate both joins fall back to the
    shuffle plans — nothing corpus-scaled broadcasts.

    Round 13: under the gate the visited anti-join runs BEFORE the
    distinct (they commute — the anti join is a per-row doc_id filter),
    so the level's single shuffle (the distinct) carries only the
    truly-new nodes instead of the full expansion mass, most of which is
    re-reached visited nodes on any graph with cycles. Past the gate the
    order stays distinct-first so the shuffled anti join sees deduped
    input.
    """
    edges = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    frontier = (
        seeds.select(F.col(seeds.columns[0]).alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_frontier = frontier.count()  # cached blocks — the scalar is free
    n_visited = n_frontier
    visited = frontier.withColumn("min_hops", F.lit(0))

    def _bc(df: DataFrame, n: int) -> DataFrame:
        return F.broadcast(df) if n <= _NODE_BCAST_GATE else df

    for level in range(1, max_hops + 1):
        expanded = edges.join(
            _bc(frontier, n_frontier), edges["src"] == frontier["doc_id"]
        ).select(F.col("dst").alias("doc_id"))
        if n_visited <= _NODE_BCAST_GATE:
            # anti-join FIRST (round 13): under the gate the anti join is
            # a broadcast (map-side) filter, and most expansion output is
            # already-visited nodes — filtering them before the distinct
            # shrinks the level's one exchange to the (much smaller)
            # truly-new mass. Set-identical either order: the anti join
            # filters per row on doc_id, distinct dedups doc_id — they
            # commute.
            nxt = (
                expanded.join(
                    _bc(visited.select("doc_id"), n_visited), "doc_id", "left_anti"
                )
                .distinct()
                .localCheckpoint(eager=True)
            )
        else:
            # past the gate the anti join shuffles: dedup first so the
            # anti join's exchanges carry distinct nodes, and its output
            # partitioning makes the distinct free anyway
            nxt = (
                expanded.distinct()
                .join(visited.select("doc_id"), "doc_id", "left_anti")
                .localCheckpoint(eager=True)
            )
        n_nxt = nxt.count()
        if n_nxt == 0:
            break
        visited = visited.unionByName(nxt.withColumn("min_hops", F.lit(level)))
        frontier, n_frontier = nxt, n_nxt
        n_visited += n_nxt
    edges.unpersist()
    return visited


# node-bounded score/degree tables broadcast below this node count.
# Sized by BUILT-RELATION footprint, not raw bytes (round-13, advisor
# item): a BroadcastHashedRelation costs ~4-8x the raw row size (hash
# array + UnsafeRow framing + per-row object headers), so 500k 16-byte
# rows is ~25-60 MB built — safe per executor even when bfs_min_hops
# re-broadcasts the growing visited set every level (the worst consumer:
# near the gate it holds one built relation per level in flight). The
# previous 2M bound justified itself on raw bytes (32 MB) but built out
# to hundreds of MB. Past the gate the per-iteration joins stay shuffle
# joins, nothing corpus-scaled broadcasts.
_NODE_BCAST_GATE = 500_000


def pagerank_fixed(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000_000_000,
) -> DataFrame:
    """PageRank over a directed MULTIGRAPH in fixed-point integer
    arithmetic — bit-identical across engines and shuffle orders.

    ``edges`` carries (src, dst); parallel edges count once each, exactly
    like repeated links in the original formulation. Scores live in
    integer "probability micro-units" (``scale`` total mass):

        s0        = scale // N                       (uniform start)
        contrib_v = Σ_{(u,v)∈E} s_k(u) // outdeg(u)  (integer division)
        s_{k+1}   = ((100-d)·s0) // 100 + (d·contrib_v) // 100

    Every operation is BIGINT +, //, Σ — associative/commutative, no
    float accumulation order to diverge on, so a DuckDB unrolled-CTE twin
    reproduces the scores exactly (floor and truncating integer division
    agree on the non-negative values used here). Dangling-node mass is
    dropped rather than redistributed — the classic simplified variant;
    both engines drop it identically.

    Scale notes (100-TB posture): the out-degree join is loop-invariant,
    so it is attached to the edge table ONCE before the loop (the old
    form re-joined it every iteration); each iteration is then one
    scores ⋈ edges join plus one groupBy(dst). The score/contrib tables
    are node-bounded, and ``n_nodes`` is already a known driver scalar —
    below ``_NODE_BCAST_GATE`` they are explicitly broadcast
    (a localCheckpointed frame has no size statistics, so without the
    hint the planner shuffled the FULL edge list by src every iteration);
    past the gate the shuffle joins stand, nothing corpus-scaled ever
    broadcasts. ``iterations`` is a fixed hyper-parameter, not a
    convergence probe, so the rounds chain LAZILY into one job
    (``localCheckpoint`` every 4th round caps plan growth for large
    iteration counts; one eager checkpoint at the end materializes the
    result so the inputs can be unpersisted) — three per-round job
    barriers removed for the default 3 iterations.
    """
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    outdeg = e.groupBy(F.col("src").alias("src")).agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )
    n_nodes = nodes.count()  # scalar graph size, not a data collect
    bcast = F.broadcast if n_nodes <= _NODE_BCAST_GATE else (lambda df: df)
    ew = e.join(bcast(outdeg), "src").persist(StorageLevel.MEMORY_AND_DISK)
    s0 = scale // max(n_nodes, 1)
    base = ((100 - damping_pct) * s0) // 100
    scores = nodes.withColumn("score", F.lit(s0).cast("long"))
    for i in range(iterations):
        contrib = (
            ew.join(bcast(scores.withColumnRenamed("node", "src")), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("score div outdeg").cast("long").alias("part"),
            )
            .groupBy("node")
            .agg(F.sum("part").cast("long").alias("contrib"))
        )
        scores = nodes.join(bcast(contrib), "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(contrib, 0L)) div 100")
            )
            .cast("long")
            .alias("score"),
        )
        if (i + 1) % 4 == 0 and (i + 1) < iterations:
            scores = scores.localCheckpoint(eager=True)
    # materialize before unpersisting the lineage the lazy chain reads
    scores = scores.localCheckpoint(eager=True)
    e.unpersist()
    nodes.unpersist()
    ew.unpersist()
    return scores


def triangle_count(edges: DataFrame, strategy: str = "wedge") -> DataFrame:
    """Per-node triangle counts over an undirected simple graph.

    ``edges`` carries (src, dst); direction and duplicates are ignored
    (canonicalized to ``lo < hi`` pairs, self-loops dropped). Uses the
    standard degree-ordering trick (e.g. Suri & Vassilvitskii, "Counting
    Triangles and the Curse of the Last Reducer", WWW'11): orient every
    edge from the (degree, id)-smaller endpoint to the larger, join the
    oriented list with itself on the source to enumerate wedges, then
    join wedges against the canonical edge set to close triangles. Work
    is Σ d_out² where d_out ≤ √(2|E|) by construction — the quadratic
    blow-up a popular hub would cause in the naive wedge join cannot
    happen, which is the 100-TB posture. Three shuffles total (degree
    agg, wedge join, closing join), all on uniform keys.

    ``strategy="adjacency"`` (round 12) computes the SAME counts by
    intersecting broadcast out-adjacency lists instead of materializing
    the wedge relation: each oriented edge (u,v) looks up N+(u) and
    N+(v) map-side and the witness set N+(u) ∩ N+(v) closes every
    triangle exactly once at its (deg,id)-minimal base edge (u gets the
    base-edge credit, v too, witnesses via explode — each triangle
    credits its three corners once, matching the wedge path row for
    row). The Θ(Σ d_out²) element-comparison mass is unchanged, but it
    runs inside ONE codegen stage over the edge list spread on a
    deterministic hash — no Θ(Σ d_out²)-row wedge shuffle and no
    triangle-row exchange at all (the per-node credit aggregate
    partial-aggregates to node-bounded rows map-side). Measured at
    sf0.1 (1k nodes, 297k edges, 57M wedges, 60% density): 22.3 s →
    4.0 s, bit-identical. The catch is the broadcast: the adjacency
    table is |E| longs, so this path is only legal when the EDGE LIST
    is broadcast-sized — callers must switch on a corpus-size bound
    (queries.graph_triangle_suppliers gates on the lineitem row count,
    ≤ 3M rows → ≤ ~24 MB adjacency). The wedge path stays the default
    and the unbounded-scale posture: nothing corpus-scaled broadcasts.

    Fully LAZY: no persist, no eager checkpoint. The shared subtrees
    (canon feeds both the wedge source and the closing join; oriented
    self-joins) dedup at runtime via AQE exchange reuse instead of
    caches, so building or explaining the DataFrame never executes —
    the round-6 sf10 step caught the previous eager localCheckpoint
    enumerating ~2e9 wedges (the dense co-purchase fixture graph) at
    plan-construction time and filling the sandbox disk. On a dense
    multigraph the wedge set is Θ(Σ d_out²) rows at the shuffle layer —
    executor-spill-bound, which is Spark's normal operating mode — and
    the enumeration only runs when an action actually asks for results.

    Cost envelope, measured at sf10: the co-purchase graph there is ~45M
    canonical edges over 100k nodes (average degree ~900), making the
    exact wedge mass ≈ 2e10 rows / ~500 GB of shuffle — a many-node
    cluster workload by construction, not a single-box one (it exhausted
    the 250 GB sandbox disk). For single-box scale steps or denser
    graphs, pre-sample the EDGE LIST deterministically and run this
    operator exactly on the subgraph (DOULION, Tsourakakis et al.
    KDD'09; see queries.graph_triangle_sampled) — uniform edge sampling
    at keep-rate p cuts wedge mass ~1/p² and unbiases the global count
    via total/p³.
    """
    canon = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).cast("long").alias("lo"),
            F.greatest(F.col("src"), F.col("dst")).cast("long").alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    deg = (
        canon.select(F.col("lo").alias("node"))
        .unionByName(canon.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    # orient each edge toward the (deg, id)-larger endpoint; under the
    # broadcast-gated adjacency strategy the node-bounded degree table
    # (≤ the edge list the gate already bounds) attaches map-side
    _maybe_bcast = F.broadcast if strategy == "adjacency" else (lambda df: df)
    with_deg = (
        canon.join(_maybe_bcast(deg.withColumnRenamed("node", "lo")), "lo")
        .withColumnRenamed("deg", "deg_lo")
        .join(_maybe_bcast(deg.withColumnRenamed("node", "hi")), "hi")
        .withColumnRenamed("deg", "deg_hi")
    )
    lo_first = (F.col("deg_lo") < F.col("deg_hi")) | (
        (F.col("deg_lo") == F.col("deg_hi")) & (F.col("lo") < F.col("hi"))
    )
    oriented = with_deg.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("v"),
    )
    if strategy == "adjacency":
        adj = oriented.groupBy("u").agg(F.collect_list("v").alias("nbrs"))
        # spread the edge list before the heavy intersect stage: the
        # oriented exchange is only |E| × 16 B, so AQE coalesces it to a
        # couple of partitions and the Σ d_out² comparison mass would run
        # near-serial. Deterministic content hash (guide §2.5), width
        # tied to the cluster, not a local constant.
        n_parts = edges.sparkSession.sparkContext.defaultParallelism * 4
        ann = (
            oriented.repartition(n_parts, F.xxhash64("u", "v"))
            .join(
                F.broadcast(
                    adj.select(F.col("u").alias("_au"), F.col("nbrs").alias("nu"))
                ),
                F.col("u") == F.col("_au"),
            )
            .join(
                F.broadcast(
                    adj.select(F.col("u").alias("_av"), F.col("nbrs").alias("nv"))
                ),
                F.col("v") == F.col("_av"),
                "left",  # sink nodes have no out-list: empty intersection
            )
            .select(
                "u",
                "v",
                F.array_intersect(
                    F.col("nu"), F.coalesce(F.col("nv"), F.array())
                ).alias("wits"),
            )
            .withColumn("cnt", F.size("wits").cast("long"))
            .filter(F.col("cnt") > 0)
        )
        # ONE pass over ann (round 12): a three-branch union re-derives the
        # whole intersect subtree per branch — exchange reuse only dedups
        # below the repartition, so the Θ(Σ d_out²) comparison mass ran
        # 3×. Emitting every credit of an edge row as one exploded
        # struct array (u and v get the base-edge count, each witness a
        # 1) computes the intersect once; the explode's output mass is
        # the same 2|E| + 3·triangles rows the union produced.
        credits = ann.select(
            F.explode(
                F.concat(
                    F.array(
                        F.struct(
                            F.col("u").alias("node"), F.col("cnt").alias("cnt")
                        ),
                        F.struct(
                            F.col("v").alias("node"), F.col("cnt").alias("cnt")
                        ),
                    ),
                    F.transform(
                        "wits",
                        lambda w: F.struct(
                            w.alias("node"),
                            F.lit(1).cast("long").alias("cnt"),
                        ),
                    ),
                )
            ).alias("c")
        ).select(F.col("c.node").alias("node"), F.col("c.cnt").alias("cnt"))
        per_node = credits.groupBy("node").agg(
            F.sum("cnt").cast("long").alias("triangles")
        )
        return deg.join(per_node, "node", "left").select(
            "node",
            "deg",
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
        )
    a, b = oriented.alias("a"), oriented.alias("b")
    wedges = a.join(b, (F.col("a.u") == F.col("b.u")) & (F.col("a.v") < F.col("b.v"))).select(
        F.col("a.u").alias("apex"),
        F.col("a.v").alias("x"),
        F.col("b.v").alias("y"),
    )
    tris = wedges.join(
        canon,
        (F.least(F.col("x"), F.col("y")) == F.col("lo"))
        & (F.greatest(F.col("x"), F.col("y")) == F.col("hi")),
    ).select("apex", "x", "y")
    # ONE pass over the closing join (round 12, same fix as the adjacency
    # path): the three-corner union re-ran the wedge-closing join per
    # branch (the join sits above the reusable exchanges); exploding the
    # corner array credits all three corners from a single enumeration.
    per_node = (
        tris.select(F.explode(F.array("apex", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        "deg",
        F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
    )


def cluster_survivors(members: DataFrame) -> DataFrame:
    """Collapse a (doc_id, cluster_id) membership table to one keeper per
    cluster (the minimum id — which is the cluster_id itself by
    construction) plus the cluster size, ready to anti-join against the
    corpus to drop the other copies."""
    return members.groupBy("cluster_id").agg(
        F.min("doc_id").cast("long").alias("keeper"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
    )
