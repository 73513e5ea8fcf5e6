"""Graph analytics over relational edge lists: weighted PageRank (power
iteration) and degree distribution.

The reference's nearest graph notion is the nameOrig/nameDest counterparty
pair in each transaction (spark_streaming_app.py:33-45); SURVEY §1.5 maps
entity relationships to plain joins/groupBy — no graph framework. This
module makes that concrete: the graph IS a DataFrame of (src, dst, w)
edges, and PageRank is a fixed-depth chain of join+groupBy rounds, i.e.
pure Catalyst-optimizable relational algebra. With the iteration count
fixed (3), the oracle SQL unrolls the same rounds as CTEs, so even this
"iterative" operator is value-checked against DuckDB — stronger than the
rows-only escape hatch the driver allows for iterative algorithms.

Scale posture:
- the edge list is built by ONE join+groupBy (map-side partial agg) and
  symmetrized with an in-plan union of the same aggregate — no second
  scan of the fact table;
- each iteration is: join ranks to edges on src (both pre-partitioned on
  the same key → co-located), partial-agg contributions by dst, join back
  to nodes. At 1000 executors you persist() ranks and localCheckpoint
  every few iterations to cut lineage; with 3 unrolled iterations the
  single lazy plan is fine and lets AQE plan every exchange;
- the only driver scalar is n_nodes (a count) — the same pattern as the
  reference's class-ratio constant (fraud_detection_model.py:197-202);
- top-k is TakeOrderedAndProject (per-partition heap), never a global
  sort; ranks are tie-broken on the rounded score + node id so the
  result set is deterministic across engines and summation orders.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_tables

_DAMPING = 0.85
_ITERATIONS = 3
_TOPK = 20


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric weighted edge list: customer Ci — supplier Sj, weight =
    number of lineitems customer i bought from supplier j."""
    t = load_tables(spark, sf_dir, names=("lineitem", "orders"))
    directed = (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .groupBy(
            F.concat(F.lit("C"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
        )
        .agg(F.count("*").alias("w"))
    )
    # Both directions in ONE pass: a union of `directed` with its reversed
    # copy would recompute the lineitem⋈orders join + aggregate per branch
    # (uncached plans execute per consumer); exploding a 2-element struct
    # array emits the same rows from a single execution of the join.
    both = F.explode(
        F.array(
            F.struct(F.col("src"), F.col("dst"), F.col("w")),
            F.struct(
                F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("w")
            ),
        )
    )
    return directed.select(both.alias("e")).select("e.*")


# AS MATERIALIZED (r12): DuckDB inlines CTEs by default, so every oracle
# that references `edges` k times re-derived the lineitem⋈orders aggregate
# k times — and the unrolled-round oracles below (k-core, pagerank, LPA)
# reference their per-round CTEs multiply, compounding the re-evaluation
# exponentially with rounds. The r11 sf1 gate read graph_k_core_peel at
# 24.6× and graph_pagerank_bipartite at 19.5× wall for 10× data; splitting
# engines showed Spark at 1.7×/1.9× (linear — the persisted edge list does
# its job) and DuckDB at 121×/21×. Materializing pins each CTE to one
# evaluation: k-core's oracle 332 s → 11 s at sf1, both now ~10× at 10×.
_EDGES_SQL = """
    edges0 AS MATERIALIZED (
      SELECT 'C' || CAST(o.o_custkey AS VARCHAR) AS src,
             'S' || CAST(l.l_suppkey AS VARCHAR) AS dst,
             COUNT(*) AS w
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ), edges AS MATERIALIZED (
      SELECT src, dst, w FROM edges0
      UNION ALL
      SELECT dst AS src, src AS dst, w FROM edges0
    )
"""


def _iteration_sql(prev: str, this: str) -> str:
    return f"""
    {this} AS MATERIALIZED (
      SELECT nd.node,
             0.15 / MAX(n.n_nodes)
               + 0.85 * COALESCE(SUM(r.rank * e.w / ow.wout), 0) AS rank
      FROM nodes nd CROSS JOIN n
      LEFT JOIN edges e ON e.dst = nd.node
      LEFT JOIN {prev} r ON r.node = e.src
      LEFT JOIN outw ow ON ow.src = e.src
      GROUP BY nd.node
    )"""


_PAGERANK_SQL = (
    "WITH "
    + _EDGES_SQL
    + """
    , nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges)
    , outw AS MATERIALIZED (SELECT src, SUM(w) AS wout FROM edges GROUP BY src)
    , n AS MATERIALIZED (SELECT COUNT(*) AS n_nodes FROM nodes)
    , r0 AS MATERIALIZED (SELECT node, 1.0 / n_nodes AS rank FROM nodes CROSS JOIN n)
    """
    + "".join("," + _iteration_sql(f"r{i}", f"r{i + 1}") for i in range(_ITERATIONS))
    + f"""
    SELECT node,
           ROUND(rank * (SELECT n_nodes FROM n), 5) AS rank_scaled
    FROM r{_ITERATIONS}
    ORDER BY rank_scaled DESC, node
    LIMIT {_TOPK}
    """
)


@register("graph_pagerank_bipartite", oracle=_PAGERANK_SQL)
def graph_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 3 power iterations) over the
    customer↔supplier purchase graph; returns the top-20 nodes by rank
    scaled to mean 1. Each iteration is join(ranks, edges on src) →
    groupBy(dst) partial agg → left join back onto nodes for the teleport
    term — relational algebra only, so Catalyst plans every round.
    Ranks are reported rounded to 5 decimals and ordered by
    (rounded rank, node id): double summation order differs between
    engines (and between AQE re-plans), so the raw float must never be
    the sort key of a cross-engine-checked top-k."""
    # persist the edge list itself: it has TWO consumers (the outw
    # aggregate and the edges_n join below), and uncached plans re-run the
    # lineitem⋈orders aggregate once per consumer (guide §5). Cold A/B
    # (r14, interleaved, clearCache per sample, sf0.1): WITH the persist
    # min 3.34 s / WITHOUT 4.02 s — the persist pays; kept.
    edges = _edges(spark, sf_dir).persist()
    outw = edges.groupBy("src").agg(F.sum("w").alias("wout")).persist()
    # materialize the edge list ONCE: every iteration (and the node set)
    # reads the persisted copy instead of re-running the fact-table join —
    # the iterative-plan recomputation trap. w/wout stays two columns (not
    # pre-divided) so each iteration's arithmetic matches the oracle.
    # outw already holds exactly one row per source node, so it doubles as
    # the node set (no separate distinct over the edge list) and is |V|
    # rows — broadcast it onto the edge side instead of shuffling edges.
    edges_n = edges.join(F.broadcast(outw), "src").persist()
    n_nodes = outw.count()

    # r14 restructure (guide §2.4/§3.3), values unchanged:
    # - round 1's rank is the uniform constant 1/n, so joining the rank
    #   table contributes nothing — fold the literal into the projection
    #   and drop the first broadcast join (same doubles: rank*w/wout with
    #   rank = lit(1/n)).
    # - the per-round `nodes LEFT JOIN contribs` + coalesce was dead
    #   weight: the edge list is symmetrized, so EVERY node appears as a
    #   dst and the aggregate's key set IS the node set — 3 more joins
    #   gone (the oracle keeps the left-join spelling; rows are equal by
    #   the symmetry argument and hash-checked at 3 SFs).
    def next_ranks(contrib_col):
        return (
            contrib_col.groupBy("dst")
            .agg(F.sum("contrib").alias("mass"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(0.15 / n_nodes) + F.lit(_DAMPING) * F.col("mass")).alias(
                    "rank"
                ),
            )
        )

    ranks = next_ranks(
        edges_n.select(
            "dst",
            (F.lit(1.0 / n_nodes) * F.col("w") / F.col("wout")).alias("contrib"),
        )
    )
    for _ in range(_ITERATIONS - 1):
        # ranks is |V| rows — broadcast it so the big edge side is never
        # reshuffled; the only shuffle per iteration is the partial agg on
        # dst. (Beyond broadcastable |V|, co-partition ranks with edges
        # on src instead — same loop, one more exchange.)
        ranks = next_ranks(
            edges_n.join(F.broadcast(ranks), edges_n.src == ranks.node).select(
                F.col("dst"),
                (F.col("rank") * F.col("w") / F.col("wout")).alias("contrib"),
            )
        )
    return (
        ranks.select(
            "node", F.round(F.col("rank") * n_nodes, 5).alias("rank_scaled")
        )
        .orderBy(F.desc("rank_scaled"), "node")
        .limit(_TOPK)
    )


@register(
    "graph_degree_histogram",
    oracle="WITH "
    + _EDGES_SQL
    + """
    , degrees AS (
      SELECT src AS node, COUNT(*) AS degree,
             CAST(SUM(w) AS BIGINT) AS strength
      FROM edges GROUP BY src
    )
    SELECT degree, COUNT(*) AS n_nodes,
           CAST(SUM(strength) AS BIGINT) AS total_strength
    FROM degrees GROUP BY degree
    """,
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the purchase graph — the first thing to look
    at before choosing a partitioning for any graph workload (a power-law
    tail means hot vertices that need the salted-join treatment from
    skew.py). Two cascaded aggregates over the edge list, both with
    map-side partial aggregation."""
    edges = _edges(spark, sf_dir)
    degrees = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("degree"), F.sum("w").alias("strength")
    )
    return degrees.groupBy("degree").agg(
        F.count("*").alias("n_nodes"),
        # BIGINT on both sides — DuckDB widens SUM(BIGINT) to INT128
        F.sum("strength").cast("bigint").alias("total_strength"),
    )


@register(
    "market_basket_pairs",
    oracle="""
    WITH pairs AS (
      SELECT a.l_orderkey, a.l_partkey AS p1, b.l_partkey AS p2
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT p1, p2, COUNT(DISTINCT l_orderkey) AS n_orders
    FROM pairs
    GROUP BY p1, p2
    ORDER BY n_orders DESC, p1, p2
    LIMIT 15
    """,
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence mining: part pairs bought in the same order, top-15 by
    support — the pair-expansion shape shared by collaborative filtering
    and co-citation analysis.

    Spark plan: ONE shuffle to collect each order's distinct sorted part
    set, then the ≤C(7,2)=21 pairs per order are expanded IN-ROW with
    nested higher-order transforms (no self-join — a lineitem⋈lineitem
    equi-join on l_orderkey costs two more shuffles of the fact table and
    measured ~1.5× slower at sf0.1), then one pair-count aggregate.
    Within an order the expanded pairs are distinct by construction, so a
    plain COUNT(*) equals the oracle's COUNT(DISTINCT l_orderkey). Top-k
    via TakeOrderedAndProject with full-key tie-break.

    At 100 TB: the single shuffle keys on the uniform surrogate
    l_orderkey — no hot keys by construction. If baskets were unbounded
    (web sessions), cap per-basket items first (the MAX_DOC_FREQ idea
    from dedup.py) so the in-row quadratic term stays bounded.
    """
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pair_expand = F.expr(
        "flatten(transform(parts, (x, i) ->"
        " transform(slice(parts, i + 2, size(parts)),"
        "           y -> struct(x AS p1, y AS p2))))"
    )
    pairs = baskets.select(F.explode(pair_expand).alias("pr")).select("pr.p1", "pr.p2")
    return (
        pairs.groupBy("p1", "p2")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "p1", "p2")
        .limit(15)
    )


_TRIANGLE_SQL = """
    WITH raw AS (
      SELECT DISTINCT o_custkey AS src,
             (o_orderkey * 7) % 1500 + 1 AS dst
      FROM orders
    ), edges AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM raw WHERE src <> dst
    ), wedges AS (
      SELECT e1.a AS a, e1.b AS b, e2.b AS c
      FROM edges e1 JOIN edges e2 ON e2.a = e1.b
    ), triangles AS (
      SELECT w.a, w.b, w.c
      FROM wedges w JOIN edges e3 ON e3.a = w.a AND e3.b = w.c
    )
    SELECT (SELECT COUNT(*) FROM edges)     AS n_edges,
           (SELECT COUNT(*) FROM wedges)    AS n_wedges,
           (SELECT COUNT(*) FROM triangles) AS n_triangles
"""


@register("graph_triangle_count", oracle=_TRIANGLE_SQL)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the order-derived transaction graph — the
    clustering-coefficient numerator, a collusion-ring signal in fraud
    graphs (a mule network shows up as dense triangles; normal payment
    flows are trees and stars). The standard ordered-edge algorithm:
    undirected edges canonicalized to a<b, wedges enumerated by joining
    edge lists on the middle vertex (a<b<c by construction, so each
    triangle is found exactly once), closed by probing the (a,c) edge.
    All-integer output, exact cross-engine.

    At 100 TB: wedge count = Σ deg(v)² is the quantity to control —
    production triangle counting orders each edge by DEGREE (not id) so
    high-degree hubs sit last and generate no wedges, bounding the join
    to Σ min-deg² (the classic Schank-Wagner trick; same plan shape,
    one extra degree join to build the ordering). The id-ordered form
    here keeps the oracle simple; both shuffles are plain equi-joins on
    vertex ids."""
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    raw = orders.select(
        F.col("o_custkey").alias("src"),
        ((F.col("o_orderkey") * 7) % 1500 + 1).alias("dst"),
    ).distinct()
    edges = (
        raw.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .persist()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    wedges = e1.join(e2, F.col("e2.a") == F.col("e1.b")).select(
        F.col("e1.a").alias("wa"), F.col("e1.b").alias("wb"), F.col("e2.b").alias("wc")
    )
    triangles = wedges.join(
        e3, (F.col("e3.a") == F.col("wa")) & (F.col("e3.b") == F.col("wc"))
    )
    return (
        edges.agg(F.count("*").alias("n_edges"))
        .crossJoin(wedges.agg(F.count("*").alias("n_wedges")))
        .crossJoin(triangles.agg(F.count("*").alias("n_triangles")))
    )


_COMMON_NEIGHBOR_SQL = """
    WITH raw AS (
      SELECT DISTINCT o_custkey AS src,
             (o_orderkey * 7) % 1500 + 1 AS dst
      FROM orders
    ), edges AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM raw WHERE src <> dst
    ), und AS (
      SELECT a AS u, b AS v FROM edges
      UNION ALL
      SELECT b AS u, a AS v FROM edges
    ), pairs AS (
      SELECT n1.v AS x, n2.v AS y, COUNT(*) AS common_neighbors
      FROM und n1 JOIN und n2 ON n1.u = n2.u AND n1.v < n2.v
      GROUP BY n1.v, n2.v
    )
    SELECT p.x, p.y, p.common_neighbors,
           (e.a IS NOT NULL) AS already_linked
    FROM pairs p LEFT JOIN edges e ON e.a = p.x AND e.b = p.y
    ORDER BY p.common_neighbors DESC, p.x, p.y
    LIMIT 20
"""


@register("graph_common_neighbors", oracle=_COMMON_NEIGHBOR_SQL, diagnostic=True)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction: the top-20 vertex pairs sharing
    the most neighbors, flagged with whether the edge already exists —
    pairs with many shared counterparties and NO direct link are the
    classic hidden-relationship lead in a fraud graph (and the simplest
    link-prediction baseline). The pair enumeration joins the undirected
    adjacency list with itself on the shared MIDDLE vertex with v1 < v2,
    so each pair is counted once per common neighbor; the existing-edge
    flag is one left join against the canonical edge list.

    Same scale law as triangle counting: the self-join emits Σ deg(v)²
    rows — at production scale cap or sample hub vertices' adjacency
    (the deg² term is entirely theirs) before the join; every join here
    is a plain equi-join on vertex ids.

    DIAGNOSTIC (registry-tagged, r12): the synthetic dst domain is FIXED
    at 1,500 nodes, so degrees grow ∝ n and the uncapped wedge join is the
    registry's single worst scaler — the r11 sf1 gate measured 129.8× wall
    at 10× data (3.4 s → 447 s, output fixed at 20 rows). The production
    operator is `graph_common_neighbors_capped` below (the deg ≤ 64
    middle-vertex prune this docstring used to only gesture at, exactly
    the graph_adamic_adar_capped recipe); this form stays as the measured
    A/B baseline and is excluded from the large-SF gates."""
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    raw = orders.select(
        F.col("o_custkey").alias("src"),
        ((F.col("o_orderkey") * 7) % 1500 + 1).alias("dst"),
    ).distinct()
    edges = (
        raw.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .persist()
    )
    und = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    n1 = und.alias("n1")
    n2 = und.alias("n2")
    pairs = (
        n1.join(
            n2,
            (F.col("n1.u") == F.col("n2.u")) & (F.col("n1.v") < F.col("n2.v")),
        )
        .groupBy(F.col("n1.v").alias("x"), F.col("n2.v").alias("y"))
        .agg(F.count("*").alias("common_neighbors"))
    )
    return (
        pairs.join(
            edges,
            (F.col("a") == F.col("x")) & (F.col("b") == F.col("y")),
            "left",
        )
        .select(
            "x",
            "y",
            "common_neighbors",
            F.col("a").isNotNull().alias("already_linked"),
        )
        .orderBy(F.col("common_neighbors").desc(), "x", "y")
        .limit(20)
    )


_KCORE_K = 12
_KCORE_ROUNDS = 3


def _kcore_oracle() -> str:
    """Unrolled peeling chain: survivors_i = nodes whose degree within the
    survivors_{i-1}-induced subgraph is >= K."""
    sql = (
        "WITH "
        + _EDGES_SQL.strip()
        + """
    , n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges)"""
    )
    prev = "n0"
    # MATERIALIZED is load-bearing here: n_{i} references n_{i-1} TWICE
    # (the a and b sides), so inlined CTEs re-evaluate the whole peel
    # chain 2^rounds times — the r11 sf1 oracle wall (see _EDGES_SQL note)
    for i in range(1, _KCORE_ROUNDS + 1):
        sql += f"""
    , n{i} AS MATERIALIZED (
        SELECT e.src AS node
        FROM edges e
        JOIN {prev} a ON a.node = e.src
        JOIN {prev} b ON b.node = e.dst
        GROUP BY e.src
        HAVING COUNT(*) >= {_KCORE_K}
    )"""
        prev = f"n{i}"
    unions = "\n    UNION ALL\n".join(
        f"    SELECT {i} AS round, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM n{i}"
        for i in range(_KCORE_ROUNDS + 1)
    )
    return sql + "\n" + unions


@register("graph_k_core_peel", oracle=_kcore_oracle())
def graph_k_core_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peeling (K=12, 3 rounds) over the customer↔supplier
    graph: each round drops vertices whose degree within the surviving
    subgraph is below K — the cascade matters (removing thin customers
    lowers supplier degrees, which peels suppliers next round). Reports
    the surviving-node count per round; round counts strictly shrinking
    and then stabilizing is the converged-core signal. Bounded unroll, by
    design: the true k-core is this peel run to fixpoint, and 3 rounds is
    the compile-time-constant form both engines can express identically
    (the recursive-CTE fixpoint version belongs to recursive.py's family;
    degree peeling converges geometrically on real graphs).

    Plan: the edge list materializes ONCE (persist) and each round is one
    degree aggregate over a semi-join-restricted edge set — survivor sets
    are |V|-sized and AQE-broadcastable; nothing re-runs the fact join.
    Each round's survivor set is persisted too (r12): round i references
    round i−1 TWICE (the src and dst semi-joins) and every round's count
    appears in the output union, so unpersisted lineage re-derived the
    whole peel chain per reference — the Spark-side mirror of the DuckDB
    CTE-inlining fix above. Measured at sf0.1: 13.4 s → 4.8 s min-of-3;
    the persisted sets are |V|-row singletons, negligible memory."""
    edges = _edges(spark, sf_dir).select("src", "dst").persist()
    survivors = edges.select(F.col("src").alias("node")).distinct()
    rounds = [survivors.persist()]
    for _ in range(_KCORE_ROUNDS):
        prev = rounds[-1]
        cur = (
            edges.join(prev.withColumnRenamed("node", "src"), "src")
            .join(prev.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select(F.col("src").alias("node"))
        )
        rounds.append(cur.persist())
    out = None
    for i, r in enumerate(rounds):
        agg = r.agg(
            F.lit(i).cast("int").alias("round"),
            F.count("*").cast("long").alias("n_nodes"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


def _lpa_iter_sql(prev: str, this: str) -> str:
    return f"""
    {this}_wt AS MATERIALIZED (
      SELECT e.dst AS node, l.label, SUM(e.w) AS wt
      FROM edges e JOIN {prev} l ON l.node = e.src
      GROUP BY 1, 2
    ), {this} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY wt DESC, label) AS rn
        FROM {this}_wt) t
      WHERE rn = 1
    )"""


_LPA_SQL = (
    "WITH "
    + _EDGES_SQL
    + """
    , nodes AS (SELECT DISTINCT src AS node FROM edges)
    , l0 AS (SELECT node, node AS label FROM nodes)
    """
    + "".join("," + _lpa_iter_sql(f"l{i}", f"l{i + 1}") for i in range(2))
    + """
    SELECT label, COUNT(*) AS n_members
    FROM l2
    GROUP BY label
    ORDER BY n_members DESC, label
    LIMIT 20
    """
)


@register("graph_label_propagation", oracle=_LPA_SQL)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted majority-vote label propagation (2 synchronous rounds) on
    the customer–supplier graph: each node adopts the label carrying the
    most incident edge weight among its neighbors, ties to the smallest
    label — the standard near-linear community-detection heuristic
    (Raghavan et al. 2007), here as pure relational algebra so DuckDB
    value-checks both rounds via unrolled CTEs.

    Per round: ONE join of the node-cardinality label table to the edge
    list on src (both hash-partition on the node key — co-located), a
    (dst, label) partial-aggregated weight rollup, and a per-node argmax
    window. Nothing driver-side; rounds chain lazily and AQE plans each
    exchange. At 100 TB you persist the label table between rounds and
    localCheckpoint every few rounds to truncate lineage (same note as
    PageRank above); synchronous updates keep it deterministic, which is
    the property the oracle needs.
    """
    from pyspark.sql import Window as W

    edges = _edges(spark, sf_dir).persist()

    def argmax_label(wt):
        rn = F.row_number().over(
            W.partitionBy("node").orderBy(F.desc("wt"), F.asc("label"))
        )
        return wt.withColumn("rn", rn).filter(F.col("rn") == 1).select(
            "node", "label"
        )

    # r14 restructure (guide §2.4), values unchanged: round 1's labels are
    # the node ids themselves (l0 = node AS label), so the round-1 weight
    # table `SUM(w) GROUP BY (dst, src-label)` IS the edge list — the
    # (src, dst) pairs are unique by construction (the groupBy in _edges +
    # bipartite symmetrization), so the sum is over one row and the whole
    # round-1 broadcast join + aggregate collapses to a projection. Round
    # 2 keeps the real join.
    labels = argmax_label(
        edges.select(
            F.col("dst").alias("node"),
            F.col("src").alias("label"),
            F.col("w").alias("wt"),
        )
    )
    # labels is |V| rows — broadcast it so the persisted edge list is
    # never reshuffled per round (same rationale as PageRank above;
    # beyond broadcastable |V|, co-partition labels with edges on src).
    labels = argmax_label(
        edges.join(F.broadcast(labels.withColumnRenamed("node", "src")), "src")
        .groupBy(F.col("dst").alias("node"), "label")
        .agg(F.sum("w").alias("wt"))
    )
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("n_members"))
        .orderBy(F.desc("n_members"), "label")
        .limit(20)
    )


_ADAMIC_ADAR_SQL = """
    WITH raw AS (
      SELECT DISTINCT o_custkey AS src,
             (o_orderkey * 7) % 1500 + 1 AS dst
      FROM orders
    ), edges AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM raw WHERE src <> dst
    ), und AS (
      SELECT a AS u, b AS v FROM edges
      UNION ALL
      SELECT b AS u, a AS v FROM edges
    ), deg AS (
      SELECT u, COUNT(*) AS d FROM und GROUP BY u
    ), wmid AS (
      SELECT u, CAST(FLOOR(1000000.0 / LN(d) + 0.5) AS BIGINT) AS w_micro
      FROM deg WHERE d >= 2
    ), pairs AS (
      SELECT n1.v AS x, n2.v AS y,
             COUNT(*) AS common_neighbors,
             CAST(SUM(w.w_micro) AS BIGINT) AS aa_micro
      FROM und n1
      JOIN und n2 ON n1.u = n2.u AND n1.v < n2.v
      JOIN wmid w ON w.u = n1.u
      GROUP BY n1.v, n2.v
    )
    SELECT p.x, p.y, p.common_neighbors, p.aa_micro,
           (e.a IS NOT NULL) AS already_linked
    FROM pairs p LEFT JOIN edges e ON e.a = p.x AND e.b = p.y
    ORDER BY p.aa_micro DESC, p.x, p.y
    LIMIT 20
"""


@register("graph_adamic_adar", oracle=_ADAMIC_ADAR_SQL, diagnostic=True)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction: score candidate pairs by
    Σ 1/ln(deg(z)) over shared neighbors z — common_neighbors' smarter
    sibling that discounts promiscuous hubs (a shared counterparty with
    thousands of links is weak evidence; a shared niche one is strong).

    Same wedge enumeration as graph_common_neighbors (adjacency self-join
    on the middle vertex, v1 < v2), with the middle vertex's hub weight
    joined in BEFORE the pair aggregate. Weights are quantized to integer
    micro-units per middle vertex first, so the per-pair SUM is an
    order-free BIGINT on both engines. Middle vertices always have
    deg ≥ 2 (they witness a wedge), so ln(d) never hits zero; the deg
    table is vertex-cardinality and broadcasts. Hub capping note from
    common_neighbors applies unchanged — the deg² term is the hubs'.

    DIAGNOSTIC (registry-tagged, r10): the uncapped wedge join is a
    MEASURED scale-killer (SCALING.md slope5 = 22.9, 106.6 MB shuffle vs
    7.9 MB capped) kept as the A/B baseline and the memory-pressure spill
    pin — `graph_adamic_adar_capped` is the production operator and the
    bench headline. Do not reach for this form at scale.
    """
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    raw = orders.select(
        F.col("o_custkey").alias("src"),
        ((F.col("o_orderkey") * 7) % 1500 + 1).alias("dst"),
    ).distinct()
    edges = (
        raw.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .persist()
    )
    und = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    wmid = (
        und.groupBy("u")
        .agg(F.count("*").alias("d"))
        .where(F.col("d") >= 2)
        .select(
            F.col("u").alias("mid"),
            F.floor(1_000_000.0 / F.log(F.col("d")) + 0.5)
            .cast("bigint")
            .alias("w_micro"),
        )
    )
    n1 = und.alias("n1")
    n2 = und.alias("n2")
    pairs = (
        n1.join(
            n2,
            (F.col("n1.u") == F.col("n2.u")) & (F.col("n1.v") < F.col("n2.v")),
        )
        .join(wmid, F.col("mid") == F.col("n1.u"))
        .groupBy(F.col("n1.v").alias("x"), F.col("n2.v").alias("y"))
        .agg(
            F.count("*").alias("common_neighbors"),
            F.sum("w_micro").cast("bigint").alias("aa_micro"),
        )
    )
    return (
        pairs.join(
            edges,
            (F.col("a") == F.col("x")) & (F.col("b") == F.col("y")),
            "left",
        )
        .select(
            "x",
            "y",
            "common_neighbors",
            "aa_micro",
            F.col("a").isNotNull().alias("already_linked"),
        )
        .orderBy(F.col("aa_micro").desc(), "x", "y")
        .limit(20)
    )


_HUB_CAP = 64

_ADAMIC_ADAR_CAPPED_SQL = f"""
    WITH raw AS (
      SELECT DISTINCT o_custkey AS src,
             (o_orderkey * 7) % 1500 + 1 AS dst
      FROM orders
    ), edges AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM raw WHERE src <> dst
    ), und AS (
      SELECT a AS u, b AS v FROM edges
      UNION ALL
      SELECT b AS u, a AS v FROM edges
    ), deg AS (
      SELECT u, COUNT(*) AS d FROM und GROUP BY u
    ), wmid AS (
      SELECT u, CAST(FLOOR(1000000.0 / LN(d) + 0.5) AS BIGINT) AS w_micro
      FROM deg WHERE d BETWEEN 2 AND {_HUB_CAP}
    ), pairs AS (
      SELECT n1.v AS x, n2.v AS y,
             COUNT(*) AS common_neighbors,
             CAST(SUM(w.w_micro) AS BIGINT) AS aa_micro
      FROM und n1
      JOIN wmid w ON w.u = n1.u
      JOIN und n2 ON n1.u = n2.u AND n1.v < n2.v
      GROUP BY n1.v, n2.v
    )
    SELECT p.x, p.y, p.common_neighbors, p.aa_micro,
           (e.a IS NOT NULL) AS already_linked
    FROM pairs p LEFT JOIN edges e ON e.a = p.x AND e.b = p.y
    ORDER BY p.aa_micro DESC, p.x, p.y
    LIMIT 20
"""


@register("graph_adamic_adar_capped", oracle=_ADAMIC_ADAR_CAPPED_SQL)
def graph_adamic_adar_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hub-capped Adamic–Adar (r9): the scale fix the uncapped query's
    docstring only gestured at, now an oracle-checked operator. Wedge
    enumeration costs Σ_z deg(z)² over middle vertices — the r9 slope
    measurement (SCALING.md) caught the uncapped form going ~quadratic
    once the synthetic dst domain's degrees grew with data size (x5 data
    → 23x wall). The standard production mitigation: EXCLUDE middle
    vertices with deg > 64 (_HUB_CAP) from wedge enumeration BEFORE the
    self-join — a shared neighbor linked to everyone contributes
    1/ln(d) ≈ noise to the score but deg² ≈ everything to the cost, so
    the cap trades negligible signal for the removal of the quadratic
    term: remaining wedges ≤ cap · |E|, i.e. linear in edges. The hub
    filter joins n1 to the capped-degree table FIRST so hub adjacency
    rows never reach the pair self-join (plan-visible pruning, not a
    post-filter). Capping changes semantics (pairs whose only witnesses
    are hubs drop out) — that is the point, and the DuckDB oracle
    applies the identical cap so the trade is value-checked, not
    hand-waved. Same integer micro-unit quantization as the uncapped
    twin."""
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    raw = orders.select(
        F.col("o_custkey").alias("src"),
        ((F.col("o_orderkey") * 7) % 1500 + 1).alias("dst"),
    ).distinct()
    edges = (
        raw.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .persist()
    )
    und = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    wmid = (
        und.groupBy("u")
        .agg(F.count("*").alias("d"))
        .where((F.col("d") >= 2) & (F.col("d") <= _HUB_CAP))
        .select(
            F.col("u").alias("mid"),
            F.floor(1_000_000.0 / F.log(F.col("d")) + 0.5)
            .cast("bigint")
            .alias("w_micro"),
        )
    )
    # hub pruning BEFORE the self-join: only adjacency rows whose middle
    # vertex survives the cap enter the wedge expansion
    n1 = (
        und.alias("n1")
        .join(wmid, F.col("n1.u") == F.col("mid"))
        .select(
            F.col("n1.u").alias("mu"), F.col("n1.v").alias("mv"), "w_micro"
        )
    )
    n2 = und.alias("n2")
    pairs = (
        n1.join(
            n2,
            (F.col("mu") == F.col("n2.u")) & (F.col("mv") < F.col("n2.v")),
        )
        .groupBy(F.col("mv").alias("x"), F.col("n2.v").alias("y"))
        .agg(
            F.count("*").alias("common_neighbors"),
            F.sum("w_micro").cast("bigint").alias("aa_micro"),
        )
    )
    return (
        pairs.join(
            edges,
            (F.col("a") == F.col("x")) & (F.col("b") == F.col("y")),
            "left",
        )
        .select(
            "x",
            "y",
            "common_neighbors",
            "aa_micro",
            F.col("a").isNotNull().alias("already_linked"),
        )
        .orderBy(F.col("aa_micro").desc(), "x", "y")
        .limit(20)
    )


_COMMON_NEIGHBOR_CAPPED_SQL = f"""
    WITH raw AS (
      SELECT DISTINCT o_custkey AS src,
             (o_orderkey * 7) % 1500 + 1 AS dst
      FROM orders
    ), edges AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM raw WHERE src <> dst
    ), und AS (
      SELECT a AS u, b AS v FROM edges
      UNION ALL
      SELECT b AS u, a AS v FROM edges
    ), mid AS (
      SELECT u FROM und GROUP BY u
      HAVING COUNT(*) BETWEEN 2 AND {_HUB_CAP}
    ), pairs AS (
      SELECT n1.v AS x, n2.v AS y, COUNT(*) AS common_neighbors
      FROM und n1
      JOIN mid m ON m.u = n1.u
      JOIN und n2 ON n1.u = n2.u AND n1.v < n2.v
      GROUP BY n1.v, n2.v
    )
    SELECT p.x, p.y, p.common_neighbors,
           (e.a IS NOT NULL) AS already_linked
    FROM pairs p LEFT JOIN edges e ON e.a = p.x AND e.b = p.y
    ORDER BY p.common_neighbors DESC, p.x, p.y
    LIMIT 20
"""


@register("graph_common_neighbors_capped", oracle=_COMMON_NEIGHBOR_CAPPED_SQL)
def graph_common_neighbors_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hub-capped common-neighbor link prediction (r12) — the production
    twin of the diagnostic `graph_common_neighbors`, closing the r11 sf1
    gate's worst finding (129.8× wall at 10× data). Wedge enumeration
    costs Σ_z deg(z)² over MIDDLE vertices, and with the synthetic dst
    domain fixed at 1,500 nodes the degrees grow with the data — so, the
    graph_adamic_adar_capped recipe verbatim: EXCLUDE middle vertices with
    deg > 64 (_HUB_CAP) from wedge enumeration BEFORE the self-join. A
    shared neighbor linked to everyone is weak link-prediction evidence
    (every pair shares it) but deg² ≈ all of the cost, so the cap trades
    negligible signal for the removal of the quadratic term: remaining
    wedges ≤ cap·|E|, linear in edges. The hub filter joins n1 to the
    capped-degree vertex set FIRST so hub adjacency rows never reach the
    pair self-join (plan-visible pruning, not a post-filter). Capping
    changes semantics (pairs whose only witnesses are hubs drop out, and
    hub-witnessed counts shrink) — that is the point, and the DuckDB
    oracle applies the identical cap so the trade is value-checked.
    Middle vertices need deg ≥ 2 to witness a wedge, so the BETWEEN lower
    bound prunes leaves for free without changing any output."""
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    raw = orders.select(
        F.col("o_custkey").alias("src"),
        ((F.col("o_orderkey") * 7) % 1500 + 1).alias("dst"),
    ).distinct()
    edges = (
        raw.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .persist()
    )
    und = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    mid = (
        und.groupBy("u")
        .agg(F.count("*").alias("d"))
        .where((F.col("d") >= 2) & (F.col("d") <= _HUB_CAP))
        .select(F.col("u").alias("mid"))
    )
    # hub pruning BEFORE the self-join: only adjacency rows whose middle
    # vertex survives the cap enter the wedge expansion
    n1 = (
        und.alias("n1")
        .join(mid, F.col("n1.u") == F.col("mid"))
        .select(F.col("n1.u").alias("mu"), F.col("n1.v").alias("mv"))
    )
    n2 = und.alias("n2")
    pairs = (
        n1.join(
            n2,
            (F.col("mu") == F.col("n2.u")) & (F.col("mv") < F.col("n2.v")),
        )
        .groupBy(F.col("mv").alias("x"), F.col("n2.v").alias("y"))
        .agg(F.count("*").alias("common_neighbors"))
    )
    return (
        pairs.join(
            edges,
            (F.col("a") == F.col("x")) & (F.col("b") == F.col("y")),
            "left",
        )
        .select(
            "x",
            "y",
            "common_neighbors",
            F.col("a").isNotNull().alias("already_linked"),
        )
        .orderBy(F.col("common_neighbors").desc(), "x", "y")
        .limit(20)
    )


_ASSORTATIVITY_SQL = """
    WITH raw AS (
      SELECT DISTINCT o_custkey AS src,
             (o_orderkey * 7) % 1500 + 1 AS dst
      FROM orders
    ), edges AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM raw WHERE src <> dst
    ), und AS (
      SELECT a AS u, b AS v FROM edges
      UNION ALL
      SELECT b AS u, a AS v FROM edges
    ), deg AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY u
    ), stub AS (
      SELECT du.d AS x, dv.d AS y
      FROM und e JOIN deg du ON du.u = e.u JOIN deg dv ON dv.u = e.v
    ), sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM stub
    )
    SELECT m, sx, sxy, sxx,
           CAST(FLOOR((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sx)
                      / (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * 1000000.0 + 0.5) AS BIGINT) AS assortativity_micro
    FROM sums
"""


@register("graph_assortativity", oracle=_ASSORTATIVITY_SQL)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over directed stubs — do hubs link to hubs (r>0,
    social-graph shape) or to leaves (r<0, the hub-and-spoke shape typical
    of mule-account fraud stars)? On the symmetric stub list x and y are
    exchangeable, so the Pearson formula needs only (m, Σx, Σxy, Σx²) —
    four BIGINT sums, exact on both engines; the single division happens
    once at the end and is quantized.

    Plan: degree table (one groupBy of the adjacency), joined twice onto
    the stub list (vertex-cardinality build sides → broadcast), then one
    map-side-combinable global aggregate. No windows, no driver math
    beyond the final row.
    """
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    raw = orders.select(
        F.col("o_custkey").alias("src"),
        ((F.col("o_orderkey") * 7) % 1500 + 1).alias("dst"),
    ).distinct()
    edges = (
        raw.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    und = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count("*").cast("bigint").alias("d"))
    du = deg.select(F.col("u").alias("ju"), F.col("d").alias("x"))
    dv = deg.select(F.col("u").alias("jv"), F.col("d").alias("y"))
    stub = (
        und.join(du, F.col("u") == F.col("ju"))
        .join(dv, F.col("v") == F.col("jv"))
        .select("x", "y")
    )
    sums = stub.agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    r = F.floor(
        (F.col("m").cast("double") * F.col("sxy") - F.col("sx").cast("double") * F.col("sx"))
        / (F.col("m").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * 1_000_000.0
        + 0.5
    ).cast("bigint")
    return sums.select("m", "sx", "sxy", "sxx", r.alias("assortativity_micro"))


_LAYERING_SQL = """
    WITH tx AS (
      SELECT o_custkey AS src,
             (o_orderkey * 7) % 1500 + 1 AS dst,
             o_orderdate AS ts,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             o_orderkey AS tx_id
      FROM orders
      WHERE o_custkey <> (o_orderkey * 7) % 1500 + 1
    )
    SELECT a.tx_id AS tx1, b.tx_id AS tx2, c.tx_id AS tx3,
           a.src AS origin, c.dst AS terminal,
           a.cents AS cents1, b.cents AS cents2, c.cents AS cents3
    FROM tx a
    JOIN tx b ON b.src = a.dst
            AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 7 DAY
            AND b.cents <= a.cents AND b.cents * 10 >= a.cents * 9
    JOIN tx c ON c.src = b.dst
            AND c.ts > b.ts AND c.ts <= b.ts + INTERVAL 7 DAY
            AND c.cents <= b.cents AND c.cents * 10 >= b.cents * 9
    WHERE c.dst <> a.src
    ORDER BY cents1 DESC, tx1, tx2, tx3
    LIMIT 25
"""


@register("fraud_layering_chains", oracle=_LAYERING_SQL)
def fraud_layering_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AML layering detection: 3-hop transaction chains A→B→C→D where each
    hop happens within 7 days of the previous one and forwards 90–100% of
    the amount — the classic money-layering signature (near-total
    pass-through down a chain of intermediaries, never returning to the
    origin). Top-25 chains by head amount.

    Plan: the directed transaction list is built once and persisted; both
    chain joins are EQUI-joins on the intermediary account (hop key) with
    the time/amount conditions as post-join filters inside the same join
    — never a cross product (plan-pinned by the no-cartesian sweep).
    Amount ratios compare in exact integer cents via cross-multiplication
    (b·10 ≥ a·9), no floating division. At 100 TB the hop joins shuffle
    on account id — the natural key — and the 7-day bound is the
    candidate limiter; for deeper chains iterate hop-by-hop with the
    frontier pattern of sql_recursive_reachability instead of widening
    this join chain.
    """
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    tx = (
        orders.select(
            F.col("o_custkey").alias("src"),
            ((F.col("o_orderkey") * 7) % 1500 + 1).alias("dst"),
            F.col("o_orderdate").alias("ts"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
            F.col("o_orderkey").alias("tx_id"),
        )
        .where(F.col("src") != F.col("dst"))
        .persist()
    )
    a = tx.select(*[F.col(c).alias(f"a_{c}") for c in tx.columns])
    b = tx.select(*[F.col(c).alias(f"b_{c}") for c in tx.columns])
    c = tx.select(*[F.col(c).alias(f"c_{c}") for c in tx.columns])
    hop1 = a.join(
        b,
        (F.col("b_src") == F.col("a_dst"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 7 DAY"))
        & (F.col("b_cents") <= F.col("a_cents"))
        & (F.col("b_cents") * 10 >= F.col("a_cents") * 9),
    )
    chains = hop1.join(
        c,
        (F.col("c_src") == F.col("b_dst"))
        & (F.col("c_ts") > F.col("b_ts"))
        & (F.col("c_ts") <= F.col("b_ts") + F.expr("INTERVAL 7 DAY"))
        & (F.col("c_cents") <= F.col("b_cents"))
        & (F.col("c_cents") * 10 >= F.col("b_cents") * 9),
    ).where(F.col("c_dst") != F.col("a_src"))
    return (
        chains.select(
            F.col("a_tx_id").alias("tx1"),
            F.col("b_tx_id").alias("tx2"),
            F.col("c_tx_id").alias("tx3"),
            F.col("a_src").alias("origin"),
            F.col("c_dst").alias("terminal"),
            F.col("a_cents").alias("cents1"),
            F.col("b_cents").alias("cents2"),
            F.col("c_cents").alias("cents3"),
        )
        .orderBy(F.desc("cents1"), "tx1", "tx2", "tx3")
        .limit(25)
    )


_JACCARD_SQL = """
    WITH raw AS (
      SELECT o_custkey AS src, (o_orderkey * 7) % 1500 + 1 AS dst
      FROM orders
    ), edges AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM raw WHERE src <> dst
    ), und AS (
      SELECT a AS u, b AS v FROM edges
      UNION ALL
      SELECT b AS u, a AS v FROM edges
    ), deg AS (
      SELECT v AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY v
    ), pairs AS (
      SELECT n1.v AS x, n2.v AS y, CAST(COUNT(*) AS BIGINT) AS common
      FROM und n1 JOIN und n2 ON n1.u = n2.u AND n1.v < n2.v
      GROUP BY n1.v, n2.v
    )
    SELECT p.x, p.y, p.common,
           CAST(FLOOR(p.common * 1000000.0
                      / (dx.deg + dy.deg - p.common) + 0.5) AS BIGINT)
             AS jaccard_micro,
           (e.a IS NOT NULL) AS already_linked
    FROM pairs p
    JOIN deg dx ON dx.node = p.x
    JOIN deg dy ON dy.node = p.y
    LEFT JOIN edges e ON e.a = p.x AND e.b = p.y
    ORDER BY jaccard_micro DESC, p.x, p.y
    LIMIT 20
"""


@register("graph_jaccard_neighbors", oracle=_JACCARD_SQL, diagnostic=True)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard link prediction: |N(x)∩N(y)| / |N(x)∪N(y)| for
    every vertex pair sharing at least one neighbor — the size-normalized
    companion to graph_common_neighbors (raw counts favor hubs; Jaccard
    surfaces small accounts whose counterparty sets nearly coincide, the
    tighter fraud-ring signal). Top-20 with the existing-edge flag.

    The intersection comes from the same middle-vertex self-join as
    common-neighbors; the union needs no second pass — |A∪B| =
    deg(x)+deg(y)−common, two equi-joins against the degree table. The
    ratio is floor-quantized to micros from integer operands, so ranking
    ties are impossible to drift. Degree and candidate tables are
    node-cardinality: they equi-join WITHOUT a broadcast hint (AQE picks;
    an explicit broadcast of an O(|V|) side is exactly the 100 TB hazard
    the round-4 verdict flagged in dedup). Scale law is the usual
    Σ deg(v)² of the middle-vertex join — cap hub adjacency upstream.

    DIAGNOSTIC (registry-tagged, r10): measured slope5 = 15.1 uncapped
    (SCALING.md); kept as the A/B baseline only —
    `graph_jaccard_neighbors_capped` (slope5 2.01) is the production
    operator and the bench headline."""
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    raw = orders.select(
        F.col("o_custkey").alias("src"),
        ((F.col("o_orderkey") * 7) % 1500 + 1).alias("dst"),
    )
    edges = (
        raw.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .persist()
    )
    und = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = und.groupBy(F.col("v").alias("node")).agg(
        F.count("*").cast("bigint").alias("deg")
    )
    n1, n2 = und.alias("n1"), und.alias("n2")
    pairs = (
        n1.join(n2, (F.col("n1.u") == F.col("n2.u")) & (F.col("n1.v") < F.col("n2.v")))
        .groupBy(F.col("n1.v").alias("x"), F.col("n2.v").alias("y"))
        .agg(F.count("*").cast("bigint").alias("common"))
    )
    dx = deg.select(F.col("node").alias("x"), F.col("deg").alias("deg_x"))
    dy = deg.select(F.col("node").alias("y"), F.col("deg").alias("deg_y"))
    jac = F.floor(
        F.col("common")
        * 1_000_000.0
        / (F.col("deg_x") + F.col("deg_y") - F.col("common"))
        + 0.5
    ).cast("bigint")
    return (
        pairs.join(dx, "x")
        .join(dy, "y")
        .join(edges, (F.col("a") == F.col("x")) & (F.col("b") == F.col("y")), "left")
        .select(
            "x",
            "y",
            "common",
            jac.alias("jaccard_micro"),
            F.col("a").isNotNull().alias("already_linked"),
        )
        .orderBy(F.desc("jaccard_micro"), "x", "y")
        .limit(20)
    )


_JACCARD_CAPPED_SQL = f"""
    WITH raw AS (
      SELECT o_custkey AS src, (o_orderkey * 7) % 1500 + 1 AS dst
      FROM orders
    ), edges AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM raw WHERE src <> dst
    ), und AS (
      SELECT a AS u, b AS v FROM edges
      UNION ALL
      SELECT b AS u, a AS v FROM edges
    ), deg AS (
      SELECT v AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY v
    ), middeg AS (
      SELECT u, COUNT(*) AS d FROM und GROUP BY u
    ), keepmid AS (
      SELECT u FROM middeg WHERE d <= {_HUB_CAP}
    ), pairs AS (
      SELECT n1.v AS x, n2.v AS y, CAST(COUNT(*) AS BIGINT) AS common
      FROM und n1
      JOIN keepmid k ON k.u = n1.u
      JOIN und n2 ON n1.u = n2.u AND n1.v < n2.v
      GROUP BY n1.v, n2.v
    )
    SELECT p.x, p.y, p.common,
           CAST(FLOOR(p.common * 1000000.0
                      / (dx.deg + dy.deg - p.common) + 0.5) AS BIGINT)
             AS jaccard_micro,
           (e.a IS NOT NULL) AS already_linked
    FROM pairs p
    JOIN deg dx ON dx.node = p.x
    JOIN deg dy ON dy.node = p.y
    LEFT JOIN edges e ON e.a = p.x AND e.b = p.y
    ORDER BY jaccard_micro DESC, p.x, p.y
    LIMIT 20
"""


@register("graph_jaccard_neighbors_capped", oracle=_JACCARD_CAPPED_SQL)
def graph_jaccard_neighbors_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hub-capped neighborhood Jaccard (r9): the second of the two
    wedge-enumeration queries the SCALING.md slope harness measured going
    quadratic (slope5 = 15.1 at x5 data; the Σ deg(z)² law, same root
    cause as graph_adamic_adar). Fix mirrors graph_adamic_adar_capped:
    middle vertices with deg > 64 are excluded BEFORE the pair
    self-join, bounding wedges by cap·|E| (linear in edges). Unlike the
    AA cap — where a hub's 1/ln(d) weight is already noise — capping
    Jaccard's intersection count is a real semantics trade: `common` counts
    only non-hub shared neighbors, while the union denominator keeps the
    FULL degrees of x and y (those joins are node-cardinality and cheap),
    so capped-Jaccard is a LOWER bound on true Jaccard that converges as
    hub witnesses thin out. The DuckDB oracle applies the identical cap,
    so the trade is value-checked. The degree/candidate joins follow the
    uncapped twin's no-explicit-broadcast posture (AQE decides)."""
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    raw = orders.select(
        F.col("o_custkey").alias("src"),
        ((F.col("o_orderkey") * 7) % 1500 + 1).alias("dst"),
    )
    edges = (
        raw.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .persist()
    )
    und = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    # persisted: deg feeds both the x and y sides of the final join —
    # uncached, the degree aggregate runs once per side (guide §5)
    deg = und.groupBy(F.col("v").alias("node")).agg(
        F.count("*").cast("bigint").alias("deg")
    ).persist()
    keepmid = (
        und.groupBy("u")
        .agg(F.count("*").alias("d"))
        .where(F.col("d") <= _HUB_CAP)
        .select(F.col("u").alias("mid"))
    )
    # hub pruning BEFORE the self-join — hub adjacency rows never reach
    # the wedge expansion (plan-visible, not a post-filter)
    n1 = (
        und.alias("n1")
        .join(keepmid, F.col("n1.u") == F.col("mid"))
        .select(F.col("n1.u").alias("mu"), F.col("n1.v").alias("mv"))
    )
    n2 = und.alias("n2")
    pairs = (
        n1.join(n2, (F.col("mu") == F.col("n2.u")) & (F.col("mv") < F.col("n2.v")))
        .groupBy(F.col("mv").alias("x"), F.col("n2.v").alias("y"))
        .agg(F.count("*").cast("bigint").alias("common"))
    )
    dx = deg.select(F.col("node").alias("x"), F.col("deg").alias("deg_x"))
    dy = deg.select(F.col("node").alias("y"), F.col("deg").alias("deg_y"))
    jac = F.floor(
        F.col("common")
        * 1_000_000.0
        / (F.col("deg_x") + F.col("deg_y") - F.col("common"))
        + 0.5
    ).cast("bigint")
    return (
        pairs.join(dx, "x")
        .join(dy, "y")
        .join(edges, (F.col("a") == F.col("x")) & (F.col("b") == F.col("y")), "left")
        .select(
            "x",
            "y",
            "common",
            jac.alias("jaccard_micro"),
            F.col("a").isNotNull().alias("already_linked"),
        )
        .orderBy(F.desc("jaccard_micro"), "x", "y")
        .limit(20)
    )


_CLUSTERING_COEF_SQL = """
    WITH raw AS (
      SELECT DISTINCT o_custkey AS src,
             (o_orderkey * 7) % 1500 + 1 AS dst
      FROM orders
    ), edges AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM raw WHERE src <> dst
    ), triangles AS (
      SELECT w.a, w.b, w.c
      FROM (SELECT e1.a, e1.b, e2.b AS c
            FROM edges e1 JOIN edges e2 ON e2.a = e1.b) w
      JOIN edges e3 ON e3.a = w.a AND e3.b = w.c
    ), tri_per_node AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
        SELECT a AS node FROM triangles
        UNION ALL SELECT b FROM triangles
        UNION ALL SELECT c FROM triangles
      ) GROUP BY node
    ), deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT a AS node FROM edges UNION ALL SELECT b FROM edges
      ) GROUP BY node
    )
    SELECT t.node, d.deg, t.n_tri,
           CAST(FLOOR(2.0 * t.n_tri * 1000000.0
                      / (d.deg * (d.deg - 1)) + 0.5) AS BIGINT)
             AS clustering_micro
    FROM tri_per_node t JOIN deg d ON d.node = t.node
"""


@register("graph_clustering_coefficient", oracle=_CLUSTERING_COEF_SQL)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per vertex: 2·triangles(v) /
    (deg(v)·(deg(v)−1)) for every vertex on at least one triangle — the
    per-node density score that separates collusion rings (neighbors who
    all transact with each other → coefficient near 1) from legitimate
    hubs (star centers → near 0). The per-node companion to
    graph_triangle_count's global tally.

    Triangles come from the same ordered-edge wedge-close plan (each
    found once, a<b<c), then fan out to their three corners with an
    in-plan unpivot — no second triangle enumeration. The ratio is
    floor-quantized from integer operands. Scale law unchanged from
    triangle counting (Σ deg² wedges; degree-order the edges to bound it
    — documented there); the corner fan-out is 3 rows per triangle."""
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    raw = orders.select(
        F.col("o_custkey").alias("src"),
        ((F.col("o_orderkey") * 7) % 1500 + 1).alias("dst"),
    ).distinct()
    edges = (
        raw.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .persist()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    wedges = e1.join(e2, F.col("e2.a") == F.col("e1.b")).select(
        F.col("e1.a").alias("wa"), F.col("e1.b").alias("wb"), F.col("e2.b").alias("wc")
    )
    e3 = edges.alias("e3")
    triangles = wedges.join(
        e3, (F.col("e3.a") == F.col("wa")) & (F.col("e3.b") == F.col("wc"))
    ).select("wa", "wb", "wc")
    corners = (
        triangles.select(F.col("wa").alias("node"))
        .unionAll(triangles.select(F.col("wb").alias("node")))
        .unionAll(triangles.select(F.col("wc").alias("node")))
    )
    tri_per_node = corners.groupBy("node").agg(
        F.count("*").cast("bigint").alias("n_tri")
    )
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("deg"))
    )
    coeff = F.floor(
        2.0 * F.col("n_tri") * 1_000_000.0
        / (F.col("deg") * (F.col("deg") - 1))
        + 0.5
    ).cast("bigint")
    return tri_per_node.join(deg, "node").select(
        "node", "deg", "n_tri", coeff.alias("clustering_micro")
    )


_SP_SOURCE = "C1"
_SP_ROUNDS = 3


def _shortest_path_oracle() -> str:
    head = f"""
    WITH {_EDGES_SQL.strip()}
    , d0 AS (
      SELECT '{_SP_SOURCE}' AS node, CAST(0 AS BIGINT) AS dist
    )"""
    prev = "d0"
    steps = []
    # MATERIALIZED: d_{i} references d_{i-1} twice (both UNION branches) —
    # inlined CTEs would re-relax the whole chain 2^rounds times (see the
    # _EDGES_SQL note on the r11 sf1 oracle walls)
    for i in range(1, _SP_ROUNDS + 1):
        steps.append(f"""
    , d{i} AS MATERIALIZED (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM {prev}
        UNION ALL
        SELECT e.dst AS node, p.dist + e.w AS dist
        FROM {prev} p JOIN edges e ON e.src = p.node
      ) GROUP BY node
    )""")
        prev = f"d{i}"
    return head + "".join(steps) + f"""
    SELECT node, CAST(dist AS BIGINT) AS dist
    FROM {prev}
    ORDER BY dist, node
    LIMIT 25
    """


@register("graph_shortest_path_bounded", oracle=_shortest_path_oracle())
def graph_shortest_path_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source weighted shortest paths, hop-bounded (3 rounds of
    Bellman-Ford relaxation) over the customer↔supplier transaction
    graph — min-plus semiring iteration as plain relational algebra:
    each round unions current distances with (distances ⋈ edges) and
    takes MIN per node. Distances are integer edge-weight sums, so the
    min-plus algebra is exact; the 25 closest nodes are the output
    (ties broken by node id). Completes the traversal family:
    reachability (sql_recursive_reachability) counts hops, k-core peels,
    this one WEIGHTS the hops.

    Per round: one equi-join frontier⋈edges + one map-side-combinable MIN
    — the frontier is broadcast while it fits (3-hop frontiers usually
    do; beyond that co-partition frontier and edges on node, same loop).
    Edge list persisted once across rounds, as PageRank/LPA do. Bounded
    rounds keep the plan static so Catalyst sees the whole chain (the
    repo's fixed-depth-iteration discipline)."""
    edges = _edges(spark, sf_dir).persist()
    dist = spark.createDataFrame([(_SP_SOURCE, 0)], "node string, dist bigint")
    for _ in range(_SP_ROUNDS):
        relaxed = (
            F.broadcast(dist)
            .join(edges, dist.node == edges.src)
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        # persist: dist is referenced twice per round (the union branch and
        # the relax join), so unpersisted lineage re-relaxed the whole
        # chain 2^rounds times — the Spark mirror of the oracle's
        # MATERIALIZED d_i fix; frontier rows are |V|-bounded
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
            .persist()
        )
    return dist.orderBy("dist", "node").limit(25)


_HITS_SQL = """
    WITH edges0 AS MATERIALIZED (
      SELECT 'C' || CAST(o.o_custkey AS VARCHAR) AS src,
             'S' || CAST(l.l_suppkey AS VARCHAR) AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ), h0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS s FROM edges0
    ), a1 AS MATERIALIZED (
      SELECT e.dst AS node, CAST(SUM(e.w * h.s) AS BIGINT) AS s
      FROM edges0 e JOIN h0 h ON h.node = e.src GROUP BY e.dst
    ), a1n AS MATERIALIZED (
      SELECT node, CAST(FLOOR(s * 1000000.0 / (SELECT MAX(s) FROM a1) + 0.5)
                        AS BIGINT) AS s
      FROM a1
    ), h1 AS MATERIALIZED (
      SELECT e.src AS node, CAST(SUM(e.w * a.s) AS BIGINT) AS s
      FROM edges0 e JOIN a1n a ON a.node = e.dst GROUP BY e.src
    ), h1n AS MATERIALIZED (
      SELECT node, CAST(FLOOR(s * 1000000.0 / (SELECT MAX(s) FROM h1) + 0.5)
                        AS BIGINT) AS s
      FROM h1
    ), a2 AS MATERIALIZED (
      SELECT e.dst AS node, CAST(SUM(e.w * h.s) AS BIGINT) AS s
      FROM edges0 e JOIN h1n h ON h.node = e.src GROUP BY e.dst
    ), a2n AS MATERIALIZED (
      SELECT node, CAST(FLOOR(s * 1000000.0 / (SELECT MAX(s) FROM a2) + 0.5)
                        AS BIGINT) AS s
      FROM a2
    ), ranked AS (
      SELECT 'authority' AS role, node, s AS score_micro,
             ROW_NUMBER() OVER (ORDER BY s DESC, node) AS rk
      FROM a2n
      UNION ALL
      SELECT 'hub', node, s,
             ROW_NUMBER() OVER (ORDER BY s DESC, node)
      FROM h1n
    )
    SELECT role, node, score_micro, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 10
"""


@register("graph_hits_hubs_authorities", oracle=_HITS_SQL)
def graph_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg) hubs & authorities on the directed customer→
    supplier purchase graph, 1.5 unrolled mutual-reinforcement rounds
    (h₀ → a₁ → h₁ → a₂): authorities are suppliers bought by the biggest
    buyers, hubs are customers buying from the most-bought suppliers —
    the bipartite centrality pair PageRank's single score conflates (and
    in a payment graph, a high-hub/low-authority account is a
    disbursement mule candidate). Top-10 of each role.

    Scores stay integer micros; each round is one equi-join + one
    BIGINT-exact weighted sum, re-normalized by the round MAX (a 1-row
    broadcastable scalar) so magnitudes can't overflow across rounds —
    the same quantized-fixpoint discipline as TextRank/LPA/k-means.
    The edge list is built once and reused by all three propagation
    joins; at scale persist it (PageRank's documented pattern)."""
    t = load_tables(spark, sf_dir, names=("lineitem", "orders"))
    edges = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.concat(F.lit("C"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
        )
        .agg(F.count("*").cast("bigint").alias("w"))
        .persist()
    )
    h = edges.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(1_000_000).cast("bigint").alias("s")
    )

    def propagate(scores, from_col, to_col):
        # persist: raw feeds both its own MAX normalizer and the scaled
        # projection, and each round's output feeds the next round AND the
        # rank branch — unpersisted lineage re-derived the whole chain per
        # reference (the Spark mirror of the oracle's MATERIALIZED fix;
        # node-cardinality rows, negligible memory)
        raw = (
            edges.join(
                F.broadcast(scores), scores["node"] == edges[from_col]
            )
            .groupBy(F.col(to_col).alias("node"))
            .agg(F.sum(F.col("w") * F.col("s")).cast("bigint").alias("s"))
            .persist()
        )
        mx = raw.agg(F.max("s").alias("mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            "node",
            F.floor(F.col("s") * 1_000_000.0 / F.col("mx") + 0.5)
            .cast("bigint")
            .alias("s"),
        ).persist()

    from pyspark.sql import Window

    a1 = propagate(h, "src", "dst")
    h1 = propagate(a1, "dst", "src")
    a2 = propagate(h1, "src", "dst")
    ranked = (
        a2.select(F.lit("authority").alias("role"), "node", F.col("s").alias("score_micro"))
        .withColumn("rk", F.row_number().over(Window.orderBy(F.desc("score_micro"), "node")).cast("bigint"))
        .unionByName(
            h1.select(F.lit("hub").alias("role"), "node", F.col("s").alias("score_micro"))
            .withColumn("rk", F.row_number().over(Window.orderBy(F.desc("score_micro"), "node")).cast("bigint"))
        )
    )
    return ranked.where(F.col("rk") <= 10)


_CYCLE_MAX_HOPS = 4
_CYCLE_SEED_CAP = 20  # seeds = source accounts with custkey < cap (bounded)

_CYCLE_ORACLE = f"""
    WITH RECURSIVE raw AS (
      SELECT DISTINCT o_custkey AS src, (o_orderkey * 7) %% 1500 + 1 AS dst
      FROM orders
    ), edges AS (
      SELECT src, dst FROM raw WHERE src <> dst
    ), walk AS (
      SELECT e.src AS seed, e.dst AS node, 1 AS hops
      FROM edges e WHERE e.src < {_CYCLE_SEED_CAP}
      UNION ALL
      SELECT w.seed, e.dst, w.hops + 1
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.hops < {_CYCLE_MAX_HOPS}
    )
    SELECT seed,
           CAST(COUNT(DISTINCT node) AS BIGINT) AS n_nodes_reached,
           CAST(MIN(CASE WHEN node = seed AND hops >= 2 THEN hops END) AS BIGINT)
             AS min_cycle_len,
           BOOL_OR(node = seed AND hops >= 2) AS has_cycle
    FROM walk GROUP BY seed
""".replace("%%", "%")


@register("graph_cycle_detection_bounded", oracle=_CYCLE_ORACLE)
def graph_cycle_detection_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AML round-tripping screen: from a BOUNDED seed set (accounts with
    custkey < 20 = _CYCLE_SEED_CAP), does money flow RETURN to its origin
    within 4 (= _CYCLE_MAX_HOPS) directed hops — and how short is the
    shortest cycle? A funds-return cycle through intermediaries is the
    layering signature fraud_layering_chains checks at exactly 3 hops with
    pass-through ratios; this operator is its topology-only generalization
    over any cycle length 2..4, plus the seed's 4-hop reach size (the
    mule-network fan-out denominator).

    Engine side is SET-semantics BFS — 4 rounds of frontier ⋈ edges
    with a min-hop groupBy per round, state bounded by seeds × nodes —
    because walk-census recursion explodes combinatorially with degree
    (avg-degree^hops walks per seed; at sf1's degrees that is already
    millions per seed). The oracle IS the walk census (WITH RECURSIVE,
    correct and affordable at oracle scale): both formulations agree on
    reached-node sets and minimum cycle length by construction — min over
    walks equals min over BFS levels — so the comparison also pins the
    set-vs-walk equivalence. Edges are materialized once and reused every
    round (the recursive.py lesson: an inline edge CTE re-scans the fact
    table per hop).

    Scale: per round one equi-join frontier⋈edges (frontier broadcasts
    while seeds are few; co-partitioned fallback beyond) + one map-side
    combinable MIN. Seeds are capped by DESIGN — ring screens run on a
    suspect shortlist, not every account; the all-pairs variant is the
    documented non-goal (it is transitive closure)."""
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    raw = orders.select(
        F.col("o_custkey").alias("src"),
        ((F.col("o_orderkey") * 7) % 1500 + 1).alias("dst"),
    ).distinct()
    edges = raw.filter(F.col("src") != F.col("dst")).persist()

    # level-synchronous walk BFS: frontier_k = nodes with SOME walk of
    # length exactly k from the seed (per-level distinct bounds it by
    # seeds x nodes; a min-hop fold here would collapse the seed row to
    # hops=0 and hide its cycle arrival — the bug this structure avoids)
    frontier = (
        edges.filter(F.col("src") < _CYCLE_SEED_CAP)
        .select(F.col("src").alias("seed"))
        .distinct()
        .select("seed", F.col("seed").alias("node"))
    )
    levels = []
    for k in range(1, _CYCLE_MAX_HOPS + 1):
        frontier = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select("seed", F.col("dst").alias("node"))
            .distinct()
        )
        levels.append(frontier.select("seed", "node", F.lit(k).alias("hops")))
    walks = levels[0]
    for lv in levels[1:]:
        walks = walks.unionByName(lv)
    walks = walks.persist()
    cycles = (
        walks.filter((F.col("node") == F.col("seed")) & (F.col("hops") >= 2))
        .groupBy("seed")
        .agg(F.min("hops").cast("bigint").alias("min_cycle_len"))
    )
    per_seed = walks.groupBy("seed").agg(
        F.count_distinct("node").cast("bigint").alias("n_nodes_reached")
    )
    return per_seed.join(cycles, "seed", "left").select(
        "seed",
        "n_nodes_reached",
        "min_cycle_len",
        F.col("min_cycle_len").isNotNull().alias("has_cycle"),
    )
