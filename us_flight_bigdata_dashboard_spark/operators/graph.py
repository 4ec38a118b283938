"""Graph operators over the order network: PageRank (iterative
join-aggregate, the canonical distributed graph algorithm) and degree
statistics.

Graph: the bipartite customer–supplier network induced by line items — an
undirected edge (customer c, supplier s) exists when c ever ordered from s.
Extension scope (the reference has no graph surface); the same shape powers
entity-resolution authority scoring and spam-domain ranking in web-corpus
curation (Common Crawl harmonic-centrality ranking).

Determinism: PageRank is a fixed 3-iteration power method unrolled into the
plan (no driver loop over data, no convergence test — iteration count is
part of the operator contract so the oracle can mirror it). Per-target
contribution sums use FIXED-POINT integer quantization — ``floor(contrib ·
10^15)`` summed as exact integers — not a double→decimal cast: ``floor`` of
an identical double is identical everywhere, whereas engines disagree in
the last ulp on how a double's 19th-plus decimal digits round into a
DECIMAL(38,18) (measured: 6/20 top ranks off by one ulp with the decimal
cast). Integer sums have no rounding mode at all. The 2^53 exactness bound
on the final back-cast holds because ranks sum to 1 (sum_fp ≤ 10^15).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.functions.exact import (
    dec_to_double,
    fsum,
    sql_dec_to_double,
    sql_fsum,
)
from us_flight_bigdata_dashboard_spark.operators.dedup import _sql_hex_to_int
from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

PR_DAMPING = 0.85
PR_ITERS = 3
PR_TOP_K = 20
PR_FP = 10**15  # fixed-point scale for contribution sums


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected (customer, supplier) edges as directed pairs in
    both orientations, with string node ids ('c:<key>' / 's:<key>')."""
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("cnode"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("snode"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("cnode").alias("src"), F.col("snode").alias("dst"))
    rev = pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
    return fwd.unionAll(rev)


def _edges_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same graph with INTEGER node ids: customer c → 2c (even), supplier
    s → 2s+1 (odd). The iterative PageRank loop hash-partitions, joins,
    and aggregates on the node key three times per run — a bigint key
    hashes and shuffles far cheaper than the 'c:<key>' label strings, so
    the loop runs on ints and labels are rendered once on the final
    top-K rows (label = ('c:'|'s:') || (id >> 1))."""
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey").cast("bigint") * 2).alias("cnode"),
            (F.col("l_suppkey").cast("bigint") * 2 + 1).alias("snode"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("cnode").alias("src"), F.col("snode").alias("dst"))
    rev = pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
    return fwd.unionAll(rev)


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer–supplier graph: {PR_ITERS} unrolled power
    iterations at damping {PR_DAMPING}, returning the top {PR_TOP_K} nodes.

    Scale shape: each iteration is one join of the rank vector (N rows)
    with the edge list (E rows) on src — sort-merge co-partitioned on the
    node key at 100 TB, and the SAME partitioning is reusable across all
    iterations since the join key never changes (on a cluster: persist the
    hash-partitioned edge list once, every iteration shuffles only the
    N-row rank vector) — followed by a hash-agg on dst with map-side
    combine. No collect, no driver-side graph state; the undirected
    construction has no dangling nodes so no rank mass correction term is
    needed. This join-agg loop is exactly Pregel's synchronous step
    expressed relationally.
    """
    # Edge-list materialization, A/B'd three ways at sf0.1 (1M edges,
    # fresh session, best-of-2): .persist() loses badly (14.7s warm — the
    # cached plan loses the fresh-scan statistics and the per-iteration
    # joins re-plan as shuffles); recompute-per-iteration was the old
    # choice (5.3s warm, but every iteration re-runs the join+distinct
    # build); localCheckpoint(eager) wins both cold and warm (5.3s cold /
    # 4.3s warm) — the edge build runs ONCE into block storage, lineage
    # truncates, and the known materialized size keeps the rank-side
    # joins broadcast-planned. Same choice a real cluster makes: build
    # the edge list once, iterate against the materialized copy.
    edges = _edges_int(spark, sf_dir).localCheckpoint(eager=True)
    degree = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    n_row = degree.agg(F.count(F.lit(1)).alias("_n"))

    # rank vector: node, degree, _n, rank — _n carried along (broadcast once)
    ranks = degree.crossJoin(F.broadcast(n_row)).select(
        F.col("src").alias("node"),
        "degree",
        "_n",
        (F.lit(1.0) / F.col("_n")).alias("rank"),
    )
    for _ in range(PR_ITERS):
        contrib = ranks.join(edges, ranks["node"] == edges["src"]).select(
            F.col("dst"),
            F.floor((F.col("rank") / F.col("degree")) * F.lit(float(PR_FP)))
            .cast("decimal(38,0)")
            .alias("contrib_fp"),
        )
        summed = contrib.groupBy("dst").agg(
            (F.sum("contrib_fp").cast("double") / F.lit(float(PR_FP))).alias("_sum")
        )
        # NOTE (measured): joining ``summed`` back to the repeated
        # ``degree`` subtree beats chaining it onto the previous rank
        # vector (8.2s vs 6.6s at sf0.1) — identical repeated subtrees get
        # ReusedExchange'd, while a deepening self-chain replans each
        # level fresh.
        ranks = (
            degree.join(summed, degree["src"] == summed["dst"])
            .crossJoin(F.broadcast(n_row))
            .select(
                F.col("src").alias("node"),
                "degree",
                "_n",
                (
                    F.lit(1.0 - PR_DAMPING) / F.col("_n")
                    + F.lit(PR_DAMPING) * F.col("_sum")
                ).alias("rank"),
            )
        )
    labeled = ranks.select(
        F.concat(
            F.when(F.col("node") % 2 == 0, F.lit("c:")).otherwise(F.lit("s:")),
            F.shiftright(F.col("node"), 1).cast("string"),
        ).alias("node"),
        "degree",
        "rank",
    )
    return labeled.orderBy(F.desc("rank"), F.asc("node")).limit(PR_TOP_K)


def _sql_pagerank() -> str:
    base = """
pairs AS (
  SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS cnode,
                  's:' || CAST(l_suppkey AS VARCHAR) AS snode
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT cnode AS src, snode AS dst FROM pairs
  UNION ALL
  SELECT snode AS src, cnode AS dst FROM pairs
),
degree AS (SELECT src, COUNT(*) AS degree FROM edges GROUP BY src),
nn AS (SELECT COUNT(*) AS _n FROM degree),
r0 AS (SELECT src AS node, degree, _n, 1.0::DOUBLE / _n AS rank FROM degree, nn)"""
    iters = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        iters.append(f"""
s{i} AS (
  SELECT e.dst,
         CAST(SUM(CAST(floor((r.rank / r.degree) * {float(PR_FP)}) AS DECIMAL(38,0)))
              AS DOUBLE) / {float(PR_FP)} AS _sum
  FROM {prev} r JOIN edges e ON r.node = e.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT d.src AS node, d.degree, nn._n,
         {1.0 - PR_DAMPING} / nn._n + {PR_DAMPING} * s{i}._sum AS rank
  FROM degree d JOIN s{i} ON d.src = s{i}.dst, nn
)""")
        prev = f"r{i}"
    return (
        "WITH "
        + base
        + ","
        + ",".join(iters)
        + f"""
SELECT node, degree, rank FROM {prev}
ORDER BY rank DESC, node ASC
LIMIT {PR_TOP_K}
"""
    )


def q_graph_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the customer–supplier graph by node class —
    the first profiling query run on any production graph (skew detection:
    a power-law tail warns that vertex-cut partitioning or hub salting is
    needed before iterating).

    Scale shape: edge build (one join + distinct), then two cascaded
    hash-aggs (node degree → degree histogram); everything shuffles only
    keys and counts.
    """
    edges = _edges(spark, sf_dir)
    degree = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return (
        degree.select(F.substring("src", 1, 1).alias("node_class"), "degree")
        .groupBy("node_class", "degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


_ORACLE_DEGREE_DIST = """
WITH pairs AS (
  SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS cnode,
                  's:' || CAST(l_suppkey AS VARCHAR) AS snode
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT cnode AS src, snode AS dst FROM pairs
  UNION ALL
  SELECT snode AS src, cnode AS dst FROM pairs
),
degree AS (SELECT src, COUNT(*) AS degree FROM edges GROUP BY src)
SELECT substr(src, 1, 1) AS node_class, degree, COUNT(*) AS n_nodes
FROM degree
GROUP BY node_class, degree
"""


# ---------------------------------------------------------------------------
# Triangle counting on the supplier co-supply projection
# ---------------------------------------------------------------------------

PARTS_PER_ORDER_CAP = 50  # hot-order guard for the pair self-join
MIN_COSUPPORT = 2         # edge iff the pair was co-purchased in >= 2 orders
TRI_TOP_K = 20


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-floored part co-purchase edge list (p1 < p2), materialized
    once via eager localCheckpoint —
    shared by the triangle and clustering-coefficient operators, whose
    multiple join legs would otherwise re-execute the projection."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    cap_w = Window.partitionBy("o")
    op_capped = op.withColumn("n_parts", F.count(F.lit(1)).over(cap_w)).filter(
        F.col("n_parts") <= PARTS_PER_ORDER_CAP
    )
    a = op_capped.select("o", F.col("p").alias("p1"))
    b = op_capped.select("o", F.col("p").alias("p2"))
    return (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= MIN_COSUPPORT)
        .select("p1", "p2")
        .localCheckpoint(eager=True)
    )


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the part co-purchase graph (parts joined
    by an edge when they appear together in >= {MIN_COSUPPORT} distinct
    orders), top {TRI_TOP_K} parts by triangle participation — the
    clustering-coefficient numerator over the "frequently bought together"
    graph.

    Graph choice is the scale decision here: the customer–supplier
    co-supply projection is NEARLY COMPLETE at TPC-H-like cardinalities
    (every supplier pair shares customers), and triangle counting on a
    near-complete graph is Θ(n³) NO MATTER the algorithm — the output
    itself is cubic. The support floor fixes the domain: one-off
    co-occurrence is chance and repeats ever more rarely as the catalog
    grows, so the >= {MIN_COSUPPORT}-support edge set stays SPARSE as data
    scales (measured: 3.4k edges/2k parts at sf0.01, 3.6k/20k at sf0.1 —
    near-constant) and triangles stay enumerable.

    Plan: distinct (order, part) → per-order pair self-join (bounded by
    the {PARTS_PER_ORDER_CAP} parts-per-order guard, same hot-key pattern
    as the shingle DF cap) → support filter → ordered-edge (a<b<c)
    three-way equi-join over the persisted sparse edge list (three join
    legs would otherwise re-execute the projection subtree).
    """
    edges = _copurchase_edges(spark, sf_dir)
    e1 = edges.select(F.col("p1").alias("na"), F.col("p2").alias("nb"))
    e2 = edges.select(F.col("p1").alias("nb"), F.col("p2").alias("nc"))
    e3 = edges.select(F.col("p1").alias("na"), F.col("p2").alias("nc"))
    tris = e1.join(e2, "nb").join(e3, ["na", "nc"])
    return (
        tris.select(
            F.explode(F.array(F.col("na"), F.col("nb"), F.col("nc"))).alias("partkey")
        )
        .groupBy("partkey")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), F.asc("partkey"))
        .limit(TRI_TOP_K)
    )


_ORACLE_TRIANGLES = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
capped AS (
  SELECT o, p FROM (
    SELECT o, p, COUNT(*) OVER (PARTITION BY o) AS n_parts FROM op
  ) WHERE n_parts <= {PARTS_PER_ORDER_CAP}
),
edges AS (
  SELECT a.p AS p1, b.p AS p2
  FROM capped a JOIN capped b USING (o)
  WHERE a.p < b.p
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_COSUPPORT}
),
tris AS (
  SELECT e1.p1 AS na, e1.p2 AS nb, e2.p2 AS nc
  FROM edges e1
  JOIN edges e2 ON e2.p1 = e1.p2
  JOIN edges e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
)
SELECT partkey, COUNT(*) AS n_triangles
FROM (
  SELECT unnest([na, nb, nc]) AS partkey FROM tris
)
GROUP BY partkey
ORDER BY n_triangles DESC, partkey ASC
LIMIT {TRI_TOP_K}
"""


CC_TOP_K = 20


def q_graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient 2·T(v) / (deg(v)·(deg(v)−1)) on the
    support-floored part co-purchase graph, top {CC_TOP_K} parts — "how
    clique-like is each product's frequently-bought-together neighborhood",
    the standard community-structure probe next to raw triangle counts.

    Scale shape: one edge build (shared, persisted — see
    ``_copurchase_edges``), a degree hash-agg over both orientations, and
    the same sparse ordered three-way triangle join as ``q_graph_triangles``
    followed by a left join of per-node triangle counts onto degrees. The
    support floor keeps the edge set sparse as data grows (docstring of
    ``q_graph_triangles``), so every stage stays linear in edges.

    Determinism: the coefficient is a single division of two exactly-
    representable small integers (2·T and d·(d−1)) — identical doubles in
    any IEEE-754 engine, so the exact-hash oracle gate holds. Degree-1
    nodes (coefficient undefined) are filtered; triangle-free nodes get an
    exact 0.0 via the left join.
    """
    edges = _copurchase_edges(spark, sf_dir)
    und = edges.select(F.col("p1").alias("node"), F.col("p2").alias("nbr")).unionAll(
        edges.select(F.col("p2").alias("node"), F.col("p1").alias("nbr"))
    )
    degree = und.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    e1 = edges.select(F.col("p1").alias("na"), F.col("p2").alias("nb"))
    e2 = edges.select(F.col("p1").alias("nb"), F.col("p2").alias("nc"))
    e3 = edges.select(F.col("p1").alias("na"), F.col("p2").alias("nc"))
    tris = e1.join(e2, "nb").join(e3, ["na", "nc"])
    tcount = (
        tris.select(
            F.explode(F.array(F.col("na"), F.col("nb"), F.col("nc"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        degree.filter(F.col("degree") >= 2)
        .join(tcount, "node", "left")
        .select(
            F.col("node").alias("partkey"),
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
            (
                F.lit(2.0)
                * F.coalesce(F.col("n_triangles"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - F.lit(1)))
            ).alias("clustering_coeff"),
        )
        .orderBy(
            F.desc("clustering_coeff"),
            F.desc("degree"),
            F.asc("partkey"),
        )
        .limit(CC_TOP_K)
    )


_ORACLE_CLUSTERING = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
capped AS (
  SELECT o, p FROM (
    SELECT o, p, COUNT(*) OVER (PARTITION BY o) AS n_parts FROM op
  ) WHERE n_parts <= {PARTS_PER_ORDER_CAP}
),
edges AS (
  SELECT a.p AS p1, b.p AS p2
  FROM capped a JOIN capped b USING (o)
  WHERE a.p < b.p
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_COSUPPORT}
),
und AS (
  SELECT p1 AS node, p2 AS nbr FROM edges
  UNION ALL
  SELECT p2 AS node, p1 AS nbr FROM edges
),
degree AS (SELECT node, COUNT(*) AS degree FROM und GROUP BY node),
tris AS (
  SELECT e1.p1 AS na, e1.p2 AS nb, e2.p2 AS nc
  FROM edges e1
  JOIN edges e2 ON e2.p1 = e1.p2
  JOIN edges e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
),
tcount AS (
  SELECT node, COUNT(*) AS n_triangles
  FROM (SELECT unnest([na, nb, nc]) AS node FROM tris)
  GROUP BY node
)
SELECT d.node AS partkey,
       d.degree,
       COALESCE(t.n_triangles, 0) AS n_triangles,
       2.0 * COALESCE(t.n_triangles, 0) / (d.degree * (d.degree - 1))
         AS clustering_coeff
FROM degree d LEFT JOIN tcount t USING (node)
WHERE d.degree >= 2
ORDER BY clustering_coeff DESC, degree DESC, partkey ASC
LIMIT {CC_TOP_K}
"""


# ---------------------------------------------------------------------------
# Market-basket association rules
# ---------------------------------------------------------------------------

RULES_TOP_K = 20


def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets: for every co-purchased
    part pair above the ``MIN_COSUPPORT`` floor, both directed rules
    antecedent→consequent with support, confidence, and lift; top
    ``RULES_TOP_K`` by lift.

    Classic Apriori-at-k=2 re-expressed relationally: basket
    projection (distinct (order, part), hot-basket cap — same guard as
    the co-purchase graph: an uncapped K-item basket emits K² pairs),
    pair counts via the o-keyed self-join, item counts via one hash agg,
    and the rule metrics as pinned-order IEEE arithmetic (counts ratioed
    once each — support = pair/N, confidence = pair/item_a, lift =
    pair·N/(item_a·item_c) — so both engines divide identical exact
    integers in the same order, keeping the hash gate). The basket
    projection is persisted: three consumers (two self-join legs through
    one exchange, item counts, basket count). Item-count sides broadcast
    (|parts| rows); final top-K is TakeOrdered. At 100 TB the only big
    shuffles are the distinct and the pair agg — both keyed, both
    map-side combined."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    cap_w = Window.partitionBy("o")
    capped = (
        op.withColumn("n_parts", F.count(F.lit(1)).over(cap_w))
        .filter(F.col("n_parts") <= PARTS_PER_ORDER_CAP)
        .select("o", "p")
        .localCheckpoint(eager=True)
    )
    n_baskets = capped.select("o").distinct().count()
    pairs = (
        capped.select("o", F.col("p").alias("p1"))
        .join(capped.select("o", F.col("p").alias("p2")), "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= MIN_COSUPPORT)
    )
    rules = pairs.select(
        F.col("p1").alias("antecedent"), F.col("p2").alias("consequent"), "pair_n"
    ).unionAll(
        pairs.select(
            F.col("p2").alias("antecedent"), F.col("p1").alias("consequent"), "pair_n"
        )
    )
    items = capped.groupBy("p").agg(F.count(F.lit(1)).alias("item_n"))
    ia = items.select(F.col("p").alias("antecedent"), F.col("item_n").alias("item_a"))
    ic = items.select(F.col("p").alias("consequent"), F.col("item_n").alias("item_c"))
    pair_d = F.col("pair_n").cast("double")
    scored = (
        rules.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .select(
            "antecedent",
            "consequent",
            "pair_n",
            "item_a",
            "item_c",
            (pair_d / F.lit(n_baskets)).alias("support"),
            (pair_d / F.col("item_a")).alias("confidence"),
            (
                (pair_d * F.lit(n_baskets))
                / (F.col("item_a").cast("double") * F.col("item_c").cast("double"))
            ).alias("lift"),
        )
    )
    top = scored.orderBy(
        F.col("lift").desc(), F.col("antecedent").asc(), F.col("consequent").asc()
    ).limit(RULES_TOP_K)
    w = Window.orderBy(
        F.col("lift").desc(), F.col("antecedent").asc(), F.col("consequent").asc()
    )
    return top.withColumn("rk", F.row_number().over(w))


def _sql_basket_rules() -> str:
    return f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
capped AS (
  SELECT o, p FROM (
    SELECT o, p, COUNT(*) OVER (PARTITION BY o) AS n_parts FROM op
  ) WHERE n_parts <= {PARTS_PER_ORDER_CAP}
),
pairs AS (
  SELECT a.p AS p1, b.p AS p2, COUNT(*) AS pair_n
  FROM capped a JOIN capped b USING (o)
  WHERE a.p < b.p
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_COSUPPORT}
),
rules AS (
  SELECT p1 AS antecedent, p2 AS consequent, pair_n FROM pairs
  UNION ALL
  SELECT p2, p1, pair_n FROM pairs
),
items AS (SELECT p, COUNT(*) AS item_n FROM capped GROUP BY 1),
nb AS (SELECT COUNT(DISTINCT o) AS n_baskets FROM capped),
scored AS (
  SELECT r.antecedent, r.consequent, r.pair_n,
         ia.item_n AS item_a, ic.item_n AS item_c,
         CAST(r.pair_n AS DOUBLE) / nb.n_baskets AS support,
         CAST(r.pair_n AS DOUBLE) / ia.item_n AS confidence,
         (CAST(r.pair_n AS DOUBLE) * nb.n_baskets)
           / (CAST(ia.item_n AS DOUBLE) * CAST(ic.item_n AS DOUBLE)) AS lift
  FROM rules r
  JOIN items ia ON ia.p = r.antecedent
  JOIN items ic ON ic.p = r.consequent
  CROSS JOIN nb
)
SELECT antecedent, consequent, pair_n, item_a, item_c, support, confidence, lift, rk
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, antecedent ASC, consequent ASC) AS rk
      FROM scored)
WHERE rk <= {RULES_TOP_K}
"""


# ---------------------------------------------------------------------------
# k-hop BFS reachability (Pregel-style unrolled supersteps)
# ---------------------------------------------------------------------------

KHOP_SOURCE = "c:1"  # BFS source node (customer key 1)
KHOP_HOPS = 3        # fixed hop budget — part of the operator contract


WALKS_MAX_LEN = 2  # walk-length budget (UNION ALL recursion multiplies paths)

_SPARK_RECURSIVE_WALKS = f"""
WITH RECURSIVE edges AS (
  SELECT DISTINCT CONCAT('c:', o_custkey) AS src, CONCAT('s:', l_suppkey) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  UNION ALL
  SELECT DISTINCT CONCAT('s:', l_suppkey), CONCAT('c:', o_custkey)
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), walk(node, len) AS (
  SELECT '{{src}}', 0
  UNION ALL
  SELECT e.dst, w.len + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.len < {WALKS_MAX_LEN}
)
SELECT CAST(len AS INT) AS walk_len,
       CAST(COUNT(*) AS BIGINT) AS n_walks,
       CAST(COUNT(DISTINCT node) AS BIGINT) AS n_distinct_endpoints
FROM walk
GROUP BY len
ORDER BY len
"""


def q_recursive_cte_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walks of length 0..{k} from the BFS seed, counted through a
    RECURSIVE CTE with UNION ALL semantics — the (Aᵏ)·e_s matrix-power
    readout (how many distinct PATHS lead back to the seed's
    neighborhood, the raw ingredient of Katz centrality and
    random-walk kernels), deliberately DIFFERENT from ``graph_khop``'s
    reachability: khop deduplicates per node (BFS, anti-join per hop,
    Python-driven); walks must NOT deduplicate, which is exactly what
    the engine's UNION ALL recursion provides — so here the ENGINE owns
    the graph iteration (UnionLoop), the second recursive-CTE surface
    beside ``recursive_cte_drain``'s scalar schedule. Both engines run
    the same recursion shape.

    Scale note (the honest part): UNION ALL recursion materializes
    PATHS, which multiply with degree^len — the budget is capped at
    {k} and the seed is one node; for node-set reachability at scale
    use ``graph_khop``'s dedup-per-hop plan. That trade-off is the
    entry's documentation payload.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    from us_flight_bigdata_dashboard_spark.sources.catalog import register_all

    register_all(spark, sf_dir)
    return spark.sql(_SPARK_RECURSIVE_WALKS.format(src=KHOP_SOURCE))


q_recursive_cte_walks.__doc__ = q_recursive_cte_walks.__doc__ and q_recursive_cte_walks.__doc__.replace(
    "{k}", str(WALKS_MAX_LEN)
)


def _sql_recursive_walks() -> str:
    return f"""
WITH RECURSIVE edges AS (
  SELECT DISTINCT 'c:' || o_custkey AS src, 's:' || l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  UNION ALL
  SELECT DISTINCT 's:' || l_suppkey, 'c:' || o_custkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), walk AS (
  SELECT '{KHOP_SOURCE}' AS node, 0 AS len
  UNION ALL
  SELECT e.dst, w.len + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.len < {WALKS_MAX_LEN}
)
SELECT CAST(len AS INT) AS walk_len,
       CAST(COUNT(*) AS BIGINT) AS n_walks,
       CAST(COUNT(DISTINCT node) AS BIGINT) AS n_distinct_endpoints
FROM walk
GROUP BY len
ORDER BY len
"""


def q_graph_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS wavefront profile from ``KHOP_SOURCE``: for each hop distance
    0..``KHOP_HOPS``, the number of nodes first reached at that hop.

    The traversal is Pregel-style supersteps unrolled into one plan (the
    driver loop is over the FIXED hop budget, never over data — same
    contract as the PageRank power iterations above): each hop is
    frontier⋈edges (equi-join on src), distinct, then a left-anti join
    against the visited set, so a node's distance is assigned exactly
    once. Frontiers are persisted — each one is consumed three times
    (next hop's join, the growing visited set, the final count) and is
    node-ids only, orders of magnitude smaller than the edge list (the
    measured pagerank trade where persisting 1M edges LOST does not
    apply; see that docstring). At 100 TB the per-hop cost is one
    shuffle join keyed on src — the frontier side is a fraction of the
    node set, and AQE picks broadcast when it fits. Output is the 4-row
    hop histogram (integers — exact). Oracle: DuckDB recursive CTE with
    UNION-dedup on (node, hop) and min-hop per node — an independent
    first-principles formulation of the same traversal."""
    edges = _edges(spark, sf_dir)
    frontier = spark.range(1).select(F.lit(KHOP_SOURCE).alias("node"))
    visited = frontier
    tagged = [frontier.withColumn("hop", F.lit(0))]
    for h in range(1, KHOP_HOPS + 1):
        frontier = (
            edges.join(
                frontier.withColumnRenamed("node", "src"), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        visited = visited.unionAll(frontier)
        tagged.append(frontier.withColumn("hop", F.lit(h)))
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionAll(t)
    return (
        out.groupBy("hop")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(F.col("hop").cast("int").alias("hop"), "n_nodes")
    )


def _sql_khop() -> str:
    return f"""
WITH RECURSIVE edges AS (
  SELECT 'c:' || o_custkey AS src, 's:' || l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  UNION
  SELECT 's:' || l_suppkey, 'c:' || o_custkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), reach AS (
  SELECT '{KHOP_SOURCE}' AS node, 0 AS hop
  UNION
  SELECT e.dst, r.hop + 1
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.hop < {KHOP_HOPS}
)
SELECT CAST(hop AS INTEGER) AS hop, COUNT(*) AS n_nodes
FROM (SELECT node, MIN(hop) AS hop FROM reach GROUP BY 1)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Neighbor-set Jaccard similarity (entity similarity via shared neighbors)
# ---------------------------------------------------------------------------

JACCARD_TOP = 20
SUPPS_PER_CUST_CAP = 64  # hot-customer guard for the co-customer self-join


def q_graph_supplier_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier similarity by customer-base overlap: Jaccard of the two
    suppliers' distinct customer sets — the neighbor-set similarity
    primitive behind "suppliers like this one" recommendations and
    substitution analysis.

    Scale shape: candidate pairs come ONLY from co-customers (a pair
    with zero shared customers has Jaccard 0 and is never materialized),
    and they are generated WITHOUT a self-join: one hash agg collects
    each customer's sorted distinct supplier array, and the C(k,2)
    ordered pairs explode inline from that array (nested `transform`
    over the tail slice — pure Catalyst exprs, same stage as the agg
    output). Customers with more than {SUPPS_PER_CUST_CAP} distinct
    suppliers are DROPPED before the explode (the same hot-key guard the
    co-purchase builder uses, `PARTS_PER_ORDER_CAP` above): one hot
    customer with 10k suppliers would alone emit 50M pairs, and
    promiscuous keys carry ~no similarity signal. The degree table
    explodes from the SAME capped arrays (materialized once via eager
    localCheckpoint), so Jaccard stays an exact integer ratio of a
    single consistent graph — and the DuckDB oracle applies the
    identical cap, so the gate certifies the capped semantics (VERDICT
    r8 ask #2). Union sizes come from a broadcast per-supplier degree
    table (|A∪B| = |A|+|B|−|A∩B| — no second pass). This shape replaced
    the r8 cs-self-join-on-cust plan, whose shared subtree executed
    twice and whose sort-merge join materialized every k×k match before
    the `<` filter (organic sf1: 111 s → see SCALE_r09); pair volume
    itself is linear in data (measured 11.1M → 111.7M at sf0.1 → sf1).
    Top {JACCARD_TOP} under a total order."""
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    capped = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("supps"))
        .filter(F.size("supps") <= SUPPS_PER_CUST_CAP)
        .localCheckpoint(eager=True)
    )
    deg = (
        capped.select(F.explode("supps").alias("supp"))
        .groupBy("supp")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    pair_expr = F.expr(
        "flatten(transform(supps, (x, i) -> "
        "transform(slice(supps, i + 2, size(supps)), "
        "y -> struct(x AS supp_a, y AS supp_b))))"
    )
    inter = (
        capped.select(F.explode(pair_expr).alias("p"))
        .select("p.supp_a", "p.supp_b")
        .groupBy("supp_a", "supp_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    da = deg.select(F.col("supp").alias("supp_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("supp").alias("supp_b"), F.col("deg").alias("deg_b"))
    return (
        inter.join(F.broadcast(da), "supp_a")
        .join(F.broadcast(db), "supp_b")
        .select(
            "supp_a",
            "supp_b",
            "inter",
            (F.col("deg_a") + F.col("deg_b") - F.col("inter")).alias("union_size"),
            (
                F.col("inter").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("supp_a"), F.asc("supp_b"))
        .limit(JACCARD_TOP)
    )


_ORACLE_SUPPLIER_SIMILARITY = f"""
WITH cs_raw AS (
  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), cs AS (
  SELECT cust, supp FROM (
    SELECT cust, supp, COUNT(*) OVER (PARTITION BY cust) AS n_supps
    FROM cs_raw
  ) WHERE n_supps <= {SUPPS_PER_CUST_CAP}
), deg AS (
  SELECT supp, COUNT(*) AS deg FROM cs GROUP BY supp
), inter AS (
  SELECT a.supp AS supp_a, b.supp AS supp_b, COUNT(*) AS inter
  FROM cs a JOIN cs b ON a.cust = b.cust AND a.supp < b.supp
  GROUP BY 1, 2
)
SELECT supp_a, supp_b, inter,
       da.deg + db.deg - inter AS union_size,
       CAST(inter AS DOUBLE) / (da.deg + db.deg - inter) AS jaccard
FROM inter
JOIN deg da ON da.supp = supp_a
JOIN deg db ON db.supp = supp_b
ORDER BY jaccard DESC, supp_a ASC, supp_b ASC
LIMIT {JACCARD_TOP}
"""


# ---------------------------------------------------------------------------
# Label-propagation community detection (synchronous, unrolled)
# ---------------------------------------------------------------------------

LPA_ITERS = 3
LPA_TOP = 20
LPA_SUPPORT_X = 2.5  # keep edges with ≥ this multiple of the MEAN co-order count


def _edges_int_floored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The customer–supplier graph restricted to REPEAT relationships —
    pair weight (distinct co-orders) ≥ {LPA_SUPPORT_X}× the mean pair
    weight. Same support-floor idea as the triangle counter, but
    SCALE-RELATIVE: an absolute floor goes degenerate when the
    customer/supplier domain grows (measured: ≥4 co-orders keeps 90 edges
    at sf0.01 and ZERO at sf0.1), while the mean-multiple keeps a
    non-degenerate strong-edge set at every tested scale (10 / 90 / 145
    edges at sf0.001/0.01/0.1). The threshold is a broadcast 1-row scalar
    (exact integer sum / count — identical double on both engines); the
    raw bipartite graph is near-complete, so the floor is what makes
    label propagation produce structure instead of one giant component."""
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    weights = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            (F.col("o_custkey").cast("bigint") * 2).alias("cnode"),
            (F.col("l_suppkey").cast("bigint") * 2 + 1).alias("snode"),
        )
        .agg(F.countDistinct("l_orderkey").alias("w"))
    )
    mean_w = weights.agg(
        (F.sum("w").cast("double") / F.count(F.lit(1))).alias("mean_w")
    )
    pairs = (
        weights.crossJoin(F.broadcast(mean_w))
        .filter(F.col("w") >= F.lit(LPA_SUPPORT_X) * F.col("mean_w"))
        .select("cnode", "snode")
    )
    fwd = pairs.select(F.col("cnode").alias("src"), F.col("snode").alias("dst"))
    rev = pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
    return fwd.unionAll(rev)


def _lpa_mode_step(edge_side: DataFrame, neighbor_labels: DataFrame) -> DataFrame:
    """One half-step: every src node adopts the MODE of its neighbors'
    labels (tie → smallest label). One join + one count-aggregate + one
    top-1 window over the (node, label) count summary."""
    neigh = edge_side.join(
        neighbor_labels, edge_side["dst"] == neighbor_labels["node"]
    ).select("src", "label")
    counts = neigh.groupBy("src", "label").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("src").orderBy(F.desc("cnt"), F.asc("label"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("src").alias("node"), "label")
    )


def q_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by SEMI-SYNCHRONOUS label propagation over the
    support-floored customer–supplier graph: every node starts as its own
    label; each round updates the customer side (mode of its suppliers'
    labels, tie → smallest) and THEN the supplier side against the fresh
    customer labels. Fully-synchronous LPA OSCILLATES on bipartite graphs
    (the two sides swap label sets every round — measured on a crafted
    biclique); per-side half-steps are the standard fix and converge in a
    round or two on clique-shaped communities. {LPA_ITERS} rounds are
    unrolled into the plan like the PageRank power iterations, so the
    result is a pure function of the edge set and the oracle mirrors it
    CTE-for-CTE.

    Scale shape: a half-step is one edges⋈labels join (shuffles the label
    vector — N rows — against the hash-partitioned edge list, the same
    economics as a PageRank sweep) plus one (node, label) count-aggregate
    and one per-node top-1 window over the count summary (bounded by
    distinct neighbor labels, not edges). Per-round localCheckpoint keeps
    the unrolled lineage linear. Output is the community-size profile
    (top {LPA_TOP}) with the bipartite split (customers vs suppliers per
    community) as the curation-relevant signal."""
    edges = _edges_int_floored(spark, sf_dir).localCheckpoint(eager=True)
    edges_cs = edges.filter(F.col("src") % 2 == 0)  # customer ← suppliers
    edges_sc = edges.filter(F.col("src") % 2 == 1)  # supplier ← customers
    labels_c = (
        edges_cs.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    labels_s = (
        edges_sc.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(LPA_ITERS):
        labels_c = _lpa_mode_step(edges_cs, labels_s).localCheckpoint(eager=True)
        labels_s = _lpa_mode_step(edges_sc, labels_c).localCheckpoint(eager=True)
    labels = labels_c.unionByName(labels_s)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.when(F.col("node") % 2 == 0, 1).otherwise(0)).alias(
                "n_customers"
            ),
            F.sum(F.col("node") % 2).alias("n_suppliers"),
        )
        .orderBy(F.desc("n_members"), F.asc("community"))
        .limit(LPA_TOP)
    )


def _sql_graph_communities() -> str:
    base = f"""
weights AS (
  SELECT CAST(o_custkey AS BIGINT) * 2 AS cnode,
         CAST(l_suppkey AS BIGINT) * 2 + 1 AS snode,
         COUNT(DISTINCT l_orderkey) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
mw AS (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) AS mean_w FROM weights),
pairs AS (
  SELECT cnode, snode FROM weights, mw WHERE w >= {LPA_SUPPORT_X} * mean_w
),
edges AS (
  SELECT cnode AS src, snode AS dst FROM pairs
  UNION ALL
  SELECT snode AS src, cnode AS dst FROM pairs
),
ecs AS (SELECT src, dst FROM edges WHERE src % 2 = 0),
esc AS (SELECT src, dst FROM edges WHERE src % 2 = 1),
c0 AS (SELECT DISTINCT src AS node, src AS label FROM ecs),
s0 AS (SELECT DISTINCT src AS node, src AS label FROM esc)"""

    def step(out: str, edge_side: str, prev: str) -> str:
        return f"""
{out} AS (
  SELECT src AS node, label FROM (
    SELECT e.src, l.label, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (PARTITION BY e.src
                              ORDER BY COUNT(*) DESC, l.label ASC) AS rk
    FROM {edge_side} e JOIN {prev} l ON e.dst = l.node
    GROUP BY e.src, l.label
  ) WHERE rk = 1
)"""

    rounds = []
    pc, ps = "c0", "s0"
    for i in range(1, LPA_ITERS + 1):
        rounds.append(step(f"c{i}", "ecs", ps))
        pc = f"c{i}"
        rounds.append(step(f"s{i}", "esc", pc))
        ps = f"s{i}"
    return (
        "WITH "
        + base
        + ","
        + ",".join(rounds)
        + f"""
SELECT label AS community,
       COUNT(*) AS n_members,
       CAST(SUM(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_customers,
       CAST(SUM(node % 2) AS BIGINT) AS n_suppliers
FROM (SELECT * FROM {pc} UNION ALL SELECT * FROM {ps})
GROUP BY label
ORDER BY n_members DESC, community ASC
LIMIT {LPA_TOP}
"""
    )


# ---------------------------------------------------------------------------
# Degree assortativity (Newman 2002) on the co-purchase graph
# ---------------------------------------------------------------------------


def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over all directed edges — do
    high-degree parts co-purchase with other hubs (r > 0) or with the
    periphery (r < 0)? The single scalar that distinguishes social-style
    graphs from dependency-style graphs, and a standard health metric
    for recommendation graphs.

    Exactness: degrees are integers; all five moments (Σx, Σy, Σx²,
    Σy², Σxy over directed edges) are EXACT integer sums (deg ≤ ~10³,
    edges ~10⁶ at sf1 ⇒ Σx·y ≤ 10¹² ≪ 2⁶³); r is one fixed-order IEEE
    expression over them — the OLS/corr house pattern with zero decimal
    quantization anywhere.

    Scale shape: degree agg (node-keyed) + two broadcast-or-shuffle
    joins of the degree table onto the support-floored edge list (AQE
    decides; the table is O(nodes)) + ONE 1-row moment aggregate."""
    edges = _copurchase_edges(spark, sf_dir)
    und = edges.select(F.col("p1").alias("a"), F.col("p2").alias("b")).unionAll(
        edges.select(F.col("p2").alias("a"), F.col("p1").alias("b"))
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    da = deg.select(F.col("a"), F.col("deg").alias("dx"))
    db = deg.select(F.col("a").alias("b"), F.col("deg").alias("dy"))
    m = (
        und.join(da, "a")
        .join(db, "b")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum("dx").alias("sx"),
            F.sum("dy").alias("sy"),
            F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
            F.sum(F.col("dy") * F.col("dy")).alias("syy"),
            F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        )
    )
    n = F.col("n_edges").cast("double")
    cov = n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    vx = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    vy = n * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")
    return m.select(
        (F.col("n_edges") / 2).cast("long").alias("n_edges_undirected"),
        (cov / F.sqrt(vx * vy)).alias("assortativity"),
    )


_ORACLE_ASSORTATIVITY = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), capped AS (
  SELECT o, p FROM (
    SELECT o, p, COUNT(*) OVER (PARTITION BY o) AS n_parts FROM op
  ) WHERE n_parts <= {PARTS_PER_ORDER_CAP}
), edges AS (
  SELECT p1, p2 FROM (
    SELECT a.p AS p1, b.p AS p2, COUNT(*) AS support
    FROM capped a JOIN capped b ON a.o = b.o AND a.p < b.p
    GROUP BY 1, 2
  ) WHERE support >= {MIN_COSUPPORT}
), und AS (
  SELECT p1 AS a, p2 AS b FROM edges
  UNION ALL
  SELECT p2 AS a, p1 AS b FROM edges
), deg AS (
  SELECT a, COUNT(*) AS deg FROM und GROUP BY a
), m AS (
  SELECT COUNT(*) AS n_edges,
         SUM(da.deg) AS sx, SUM(db.deg) AS sy,
         SUM(da.deg * da.deg) AS sxx, SUM(db.deg * db.deg) AS syy,
         SUM(da.deg * db.deg) AS sxy
  FROM und u
  JOIN deg da ON da.a = u.a
  JOIN deg db ON db.a = u.b
)
SELECT CAST(n_edges // 2 AS BIGINT) AS n_edges_undirected,
       (CAST(n_edges AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / sqrt((CAST(n_edges AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n_edges AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS assortativity
FROM m
"""


# ---------------------------------------------------------------------------
# Bounded-hop weighted shortest paths (Bellman–Ford relaxation rounds)
# ---------------------------------------------------------------------------

SSSP_SOURCE_CUST = 1  # source node: customer key 1 (node id 2·1 = 2)
SSSP_ROUNDS = 6  # fixed relaxation rounds — "≤6-hop cheapest path"
SSSP_TOPK = 100


def _weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer–supplier bipartite graph with INTEGER edge weights
    (min l_quantity over the pair's lineitems — a cheapest-lane cost),
    both orientations, int node ids (customer c → 2c, supplier s →
    2s+1)."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            (F.col("o_custkey").cast("bigint") * 2).alias("cnode"),
            (F.col("l_suppkey").cast("bigint") * 2 + 1).alias("snode"),
        )
        .agg(F.min(F.col("l_quantity").cast("bigint")).alias("w"))
    )
    fwd = pairs.select(F.col("cnode").alias("src"), F.col("snode").alias("dst"), "w")
    rev = pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"), "w")
    return fwd.unionAll(rev)


def q_graph_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source WEIGHTED shortest distances within ``SSSP_ROUNDS``
    relaxation rounds (Bellman–Ford): dist_k(v) = cheapest cost over
    paths of ≤k edges. The round count is part of the operator contract
    (bounded-hop cheapest path — on this bipartite graph 6 rounds spans
    three customer↔supplier alternations), which is also what makes the
    result engine-portable: both engines run EXACTLY k rounds, so no
    fixed-point/termination semantics can diverge.

    Scale shape: each round is one (node-keyed) equi-join of the frontier
    against the edge list plus a min-agg — the Pregel-style iteration
    every distributed SSSP uses. State per round is O(nodes), integer
    arithmetic only; the edge list is localCheckpoint-ed once so k rounds
    don't re-derive the join subtree."""
    edges = _weighted_edges(spark, sf_dir).localCheckpoint(eager=True)
    dist = (
        edges.sparkSession.range(1)
        .select(
            F.lit(SSSP_SOURCE_CUST * 2).cast("bigint").alias("node"),
            F.lit(0).cast("bigint").alias("dist"),
        )
    )
    for _ in range(SSSP_ROUNDS):
        relaxed = dist.join(edges, dist["node"] == edges["src"]).select(
            F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            # per-round materialization: without it each round's plan
            # re-derives every previous round (measured: 94 exchanges /
            # 31 SMJs for 6 rounds → 18 exchanges with the cut lineage)
            .localCheckpoint(eager=True)
        )
    return (
        dist.select(
            F.concat(
                F.when(F.col("node") % 2 == 0, F.lit("c:")).otherwise(F.lit("s:")),
                (F.col("node") / 2).cast("bigint"),
            ).alias("node"),
            "dist",
        )
        .orderBy("dist", "node")
        .limit(SSSP_TOPK)
    )


def _sql_shortest_paths() -> str:
    relax = """
d{k} AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{p}
    UNION ALL
    SELECT e.dst AS node, d{p}.dist + e.w AS dist
    FROM d{p} JOIN edges e ON d{p}.node = e.src
  ) GROUP BY node
)"""
    rounds = ",".join(
        relax.format(k=k, p=k - 1) for k in range(1, SSSP_ROUNDS + 1)
    )
    return f"""
WITH pairs AS (
  SELECT o_custkey * 2 AS cnode, l_suppkey * 2 + 1 AS snode,
         MIN(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), edges AS (
  SELECT cnode AS src, snode AS dst, w FROM pairs
  UNION ALL
  SELECT snode AS src, cnode AS dst, w FROM pairs
), d0 AS (
  SELECT CAST({SSSP_SOURCE_CUST * 2} AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
),{rounds}
SELECT (CASE WHEN node % 2 = 0 THEN 'c:' ELSE 's:' END)
         || CAST(node // 2 AS VARCHAR) AS node,
       CAST(dist AS BIGINT) AS dist
FROM d{SSSP_ROUNDS}
ORDER BY dist, node
LIMIT {SSSP_TOPK}
"""


# ---------------------------------------------------------------------------
# Link prediction: common neighbors + Jaccard on the co-purchase graph
# ---------------------------------------------------------------------------

LINKPRED_TOPK = 25


def q_graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the support-floored co-purchase graph:
    for every NON-adjacent part pair with ≥1 common neighbor, score by
    common-neighbor count and neighborhood Jaccard cn/(da+db−cn); top-K
    by (jaccard, cn, pair). (Adamic–Adar's 1/log(deg) weighting is the
    usual companion — deliberately not offered: log is transcendental
    and this matrix bans platform-licensed functions from hash-gated
    values; Jaccard carries the same signal rationally.)

    Scale shape: the wedge join (two edge legs sharing the center node)
    IS the candidate generator — identical economics to the triangle
    count (support-floored edges keep Σdeg² bounded); existing edges
    drop out via one anti-join, degrees broadcast back on the pair
    keys. Integer counts + one rational division — no float surface."""
    edges = _copurchase_edges(spark, sf_dir)
    und = edges.select(F.col("p1").alias("a"), F.col("p2").alias("b")).unionAll(
        edges.select(F.col("p2").alias("a"), F.col("p1").alias("b"))
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    l1 = und.select(F.col("a").alias("x"), F.col("b").alias("c"))
    l2 = und.select(F.col("a").alias("y"), F.col("b").alias("c"))
    cand = (
        l1.join(l2, "c")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cn"))
        .join(
            edges,
            (F.col("x") == edges["p1"]) & (F.col("y") == edges["p2"]),
            "left_anti",
        )
    )
    da = deg.select(F.col("a").alias("x"), F.col("deg").alias("deg_x"))
    db = deg.select(F.col("a").alias("y"), F.col("deg").alias("deg_y"))
    # NOTE: no broadcast hint on the degree table — it is O(nodes) and
    # grows with the graph (a forced broadcast measured 8.8× at a ×16
    # scale probe; unhinted, AQE picks broadcast only while it fits)
    return (
        cand.join(da, "x")
        .join(db, "y")
        .select(
            F.col("x").alias("part_a"),
            F.col("y").alias("part_b"),
            F.col("cn").cast("long").alias("common_neighbors"),
            F.col("deg_x").cast("long").alias("deg_a"),
            F.col("deg_y").cast("long").alias("deg_b"),
            (
                F.col("cn").cast("double")
                / (F.col("deg_x") + F.col("deg_y") - F.col("cn")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy(
            F.col("jaccard").desc(),
            F.col("common_neighbors").desc(),
            "part_a",
            "part_b",
        )
        .limit(LINKPRED_TOPK)
    )


def _sql_link_prediction() -> str:
    return f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), capped AS (
  SELECT o, p FROM (
    SELECT o, p, COUNT(*) OVER (PARTITION BY o) AS n_parts FROM op
  ) WHERE n_parts <= {PARTS_PER_ORDER_CAP}
), edges AS (
  SELECT p1, p2 FROM (
    SELECT a.p AS p1, b.p AS p2, COUNT(*) AS support
    FROM capped a JOIN capped b ON a.o = b.o AND a.p < b.p
    GROUP BY 1, 2
  ) WHERE support >= {MIN_COSUPPORT}
), und AS (
  SELECT p1 AS a, p2 AS b FROM edges
  UNION ALL
  SELECT p2 AS a, p1 AS b FROM edges
), deg AS (
  SELECT a, COUNT(*) AS deg FROM und GROUP BY a
), cand AS (
  SELECT l1.a AS x, l2.a AS y, COUNT(*) AS cn
  FROM und l1 JOIN und l2 ON l1.b = l2.b AND l1.a < l2.a
  GROUP BY 1, 2
), nonadj AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.p1 = c.x AND e.p2 = c.y)
)
SELECT n.x AS part_a, n.y AS part_b,
       CAST(n.cn AS BIGINT) AS common_neighbors,
       CAST(da.deg AS BIGINT) AS deg_a, CAST(db.deg AS BIGINT) AS deg_b,
       CAST(n.cn AS DOUBLE) / CAST(da.deg + db.deg - n.cn AS DOUBLE) AS jaccard
FROM nonadj n
JOIN deg da ON da.a = n.x
JOIN deg db ON db.a = n.y
ORDER BY jaccard DESC, common_neighbors DESC, part_a, part_b
LIMIT {LINKPRED_TOPK}
"""


# ---------------------------------------------------------------------------
# k-core decomposition (iterative peeling, bounded unroll)
# ---------------------------------------------------------------------------

KCORE_K = 2       # keep nodes with degree >= K after repeated peeling
KCORE_ROUNDS = 6  # unrolled peel rounds; converges at every tested SF
                  # (measured effective peels: 0 at sf0.001, 3 at sf0.01,
                  # 5 at sf0.1 — round 6 is a no-op fixpoint certificate)


def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{k}-core of the part co-purchase graph: repeatedly peel nodes with
    degree < {k} until fixpoint — the standard graph-densification /
    spam-filtering primitive (the core is the maximal subgraph where every
    member keeps ≥{k} co-purchase partners AFTER weak parts drop out, which
    one-shot degree filtering cannot compute: removing a weak node can
    de-qualify its neighbors, hence the iteration).

    Executed as {r} unrolled peel rounds — each round recomputes degrees
    (map-side-combinable hash agg) and semi-joins the survivor set against
    both edge endpoints. Peeling is monotone (edge sets only shrink), so
    any round count ≥ the convergence depth returns the exact k-core, and
    both engines run the identical round count either way. Per-round
    ``localCheckpoint`` truncates the 2-joins-per-round lineage (the
    SSSP/PageRank lesson: exponential plan growth planned minutes, the
    checkpointed loop plans in seconds). At 100 TB each round shuffles on
    the node key only; the distributed-systems form of this exact loop is
    Quick et al.'s "scalable k-core" Pregel algorithm.

    Output: one summary row (node/edge counts, degree range) — the core
    invariant min_degree ≥ {k} is directly visible in the result.
    """
    e = _copurchase_edges(spark, sf_dir)
    edges = e.select(F.col("p1").alias("src"), F.col("p2").alias("dst")).unionAll(
        e.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
    ).localCheckpoint(eager=True)
    for _ in range(KCORE_ROUNDS):
        keep = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select("src")
        )
        edges = (
            edges.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    return deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_core_nodes"),
        (F.sum("deg") / F.lit(2)).cast("long").alias("n_core_edges"),
        F.min("deg").cast("long").alias("min_degree"),
        F.max("deg").cast("long").alias("max_degree"),
    )
q_graph_kcore.__doc__ = q_graph_kcore.__doc__ and q_graph_kcore.__doc__.format(k=KCORE_K, r=KCORE_ROUNDS)


def _sql_kcore() -> str:
    base = f"""
op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
capped AS (
  SELECT o, p FROM (
    SELECT o, p, COUNT(*) OVER (PARTITION BY o) AS np FROM op
  ) WHERE np <= {PARTS_PER_ORDER_CAP}
),
und AS (
  SELECT a.p AS p1, b.p AS p2
  FROM capped a JOIN capped b ON a.o = b.o
  WHERE a.p < b.p GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_COSUPPORT}
),
e0 AS MATERIALIZED (SELECT p1 AS src, p2 AS dst FROM und
       UNION ALL SELECT p2, p1 FROM und)"""
    rounds = []
    prev = "e0"
    for i in range(1, KCORE_ROUNDS + 1):
        rounds.append(f"""
k{i} AS MATERIALIZED (SELECT src FROM {prev} GROUP BY src HAVING COUNT(*) >= {KCORE_K}),
e{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM {prev} e
  WHERE e.src IN (SELECT src FROM k{i}) AND e.dst IN (SELECT src FROM k{i})
)""")
        prev = f"e{i}"
    return (
        "WITH "
        + base
        + ","
        + ",".join(rounds)
        + f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_core_nodes,
       CAST(SUM(deg) / 2 AS BIGINT) AS n_core_edges,
       CAST(MIN(deg) AS BIGINT) AS min_degree,
       CAST(MAX(deg) AS BIGINT) AS max_degree
FROM (SELECT src, COUNT(*) AS deg FROM {prev} GROUP BY src)
"""
    )


# ---------------------------------------------------------------------------
# Average neighbor degree by degree class (the knn(k) curve)
# ---------------------------------------------------------------------------


def q_graph_avg_neighbor_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average neighbor degree per degree class k — the knn(k) curve
    (Pastor-Satorras et al. 2001) whose slope is the DISAGGREGATED view
    of ``graph_assortativity``'s single coefficient: rising knn(k) means
    hubs attach to hubs, falling means hubs serve the periphery. On the
    part co-purchase graph this reads as "do popular parts co-sell with
    other popular parts?" — the merchandising version of rich-club
    analysis.

    Exactness: degrees are exact integer counts; per degree class the
    output is Σ(neighbor degree) / (class size · k) — one division of
    exact integers (Σ over DECIMAL to be 100 TB-safe). Scale shape:
    degree table (hash agg) joined onto the edge list twice on the node
    key (sort-merge, co-partitioned — the same key carries both legs),
    then a map-side-combinable agg to ≤|distinct degrees| rows.
    """
    e = _copurchase_edges(spark, sf_dir)
    edges = e.select(F.col("p1").alias("src"), F.col("p2").alias("dst")).unionAll(
        e.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    d_src = deg.select(F.col("src").alias("u"), F.col("deg").alias("ku"))
    d_dst = deg.select(F.col("src").alias("v"), F.col("deg").alias("kv"))
    joined = (
        edges.join(d_src, edges.src == d_src.u)
        .join(d_dst, edges.dst == d_dst.v)
        .select("ku", "kv")
    )
    agg = joined.groupBy("ku").agg(
        F.count(F.lit(1)).cast("long").alias("n_edge_ends"),
        F.sum(F.col("kv").cast("decimal(19,0)")).alias("s_nbr"),
    )
    return agg.select(
        F.col("ku").alias("degree"),
        (F.col("n_edge_ends") / F.col("ku")).cast("long").alias("n_nodes"),
        (F.col("s_nbr").cast("double") / F.col("n_edge_ends").cast("double")).alias(
            "avg_neighbor_degree"
        ),
    ).orderBy("degree")


_ORACLE_KNN_CURVE = f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
capped AS (
  SELECT o, p FROM (
    SELECT o, p, COUNT(*) OVER (PARTITION BY o) AS np FROM op
  ) WHERE np <= {PARTS_PER_ORDER_CAP}
),
und AS (
  SELECT a.p AS p1, b.p AS p2
  FROM capped a JOIN capped b ON a.o = b.o
  WHERE a.p < b.p GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_COSUPPORT}
),
edges AS (SELECT p1 AS src, p2 AS dst FROM und
          UNION ALL SELECT p2, p1 FROM und),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
joined AS (
  SELECT ds.deg AS ku, dd.deg AS kv
  FROM edges e
  JOIN deg ds ON e.src = ds.src
  JOIN deg dd ON e.dst = dd.src
),
agg AS (
  SELECT ku, CAST(COUNT(*) AS BIGINT) AS n_edge_ends,
         SUM(CAST(kv AS DECIMAL(19,0))) AS s_nbr
  FROM joined GROUP BY 1
)
SELECT ku AS degree,
       CAST(n_edge_ends / ku AS BIGINT) AS n_nodes,
       CAST(s_nbr AS DOUBLE) / CAST(n_edge_ends AS DOUBLE) AS avg_neighbor_degree
FROM agg
ORDER BY degree
"""


# ---------------------------------------------------------------------------
# Rich-club coefficient (hub interconnection density)
# ---------------------------------------------------------------------------

RICH_CLUB_KS = [2, 4, 8]


def q_graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) = 2·E_k / (N_k·(N_k−1)) for k ∈ {ks}:
    among parts with co-purchase degree > k, how densely do they connect
    to EACH OTHER (Zhou & Mondragón 2004)? φ rising with k = an
    interconnected hub elite (popular parts co-sell as a clique — bundle
    them); flat/falling = hubs serve disjoint niches. Completes the
    hub-structure triptych with ``graph_assortativity`` (one number) and
    ``graph_avg_neighbor_degree`` (the curve).

    Exactness: degrees, club sizes N_k, and intra-club edge counts E_k
    are exact integers; φ is ONE division per k row. Scale shape: ONE
    endpoint-degree join pass (shared shape with
    ``q_graph_avg_neighbor_degree``) collapses the graph to two tiny
    histograms — per-edge min endpoint degree and per-node degree — and
    EVERY k reads them with a conditional sum: adding grid points is
    free, and nothing per-k ever touches the edge list (the first cut
    ran a semi-join pair per k: 12 exchanges vs 6 in the plan audit).
    """
    e = _copurchase_edges(spark, sf_dir)
    edges = e.select(F.col("p1").alias("src"), F.col("p2").alias("dst"))
    deg = (
        edges.select(F.col("src").alias("n")).unionAll(
            edges.select(F.col("dst").alias("n"))
        )
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .localCheckpoint(eager=True)
    )
    # Histogram form: ONE endpoint-degree join pass (the knn-curve join)
    # collapses the graph to two tiny histograms — per-edge min endpoint
    # degree, per-node degree — and every k in the grid reads them with a
    # conditional sum. The first version ran a semi-join PAIR PER k (12
    # exchanges in the plan audit); this shape is 6 and adding grid points
    # is free.
    d_src = deg.select(F.col("n").alias("u"), F.col("deg").alias("ku"))
    d_dst = deg.select(F.col("n").alias("v"), F.col("deg").alias("kv"))
    edge_hist = (
        edges.join(d_src, edges.src == d_src.u)
        .join(d_dst, edges.dst == d_dst.v)
        .select(F.least("ku", "kv").alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    deg_hist = deg.groupBy("deg").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    grid = F.explode(
        F.array(*[F.lit(k) for k in RICH_CLUB_KS])
    ).alias("k")
    nk = (
        deg_hist.select(grid, "deg", "cnt")
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("deg") > F.col("k"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_club")
        )
    )
    ek = (
        edge_hist.select(grid, "m", "cnt")
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("m") > F.col("k"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("e_club")
        )
    )
    out = nk.join(ek, "k").select(
        "k",
        "n_club",
        "e_club",
        F.when(
            F.col("n_club") >= 2,
            (F.lit(2.0) * F.col("e_club").cast("double"))
            / (
                F.col("n_club").cast("double")
                * (F.col("n_club").cast("double") - F.lit(1.0))
            ),
        ).alias("phi"),
    )
    return out.orderBy("k")
q_graph_rich_club.__doc__ = q_graph_rich_club.__doc__ and q_graph_rich_club.__doc__.format(ks=RICH_CLUB_KS)


def _sql_rich_club() -> str:
    per_k = " UNION ALL ".join(
        f"""
SELECT {k} AS k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM deg WHERE deg > {k}) AS n_club,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM und e
         WHERE e.p1 IN (SELECT n FROM deg WHERE deg > {k})
           AND e.p2 IN (SELECT n FROM deg WHERE deg > {k})) AS e_club"""
        for k in RICH_CLUB_KS
    )
    return f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
capped AS (
  SELECT o, p FROM (
    SELECT o, p, COUNT(*) OVER (PARTITION BY o) AS np FROM op
  ) WHERE np <= {PARTS_PER_ORDER_CAP}
),
und AS MATERIALIZED (
  SELECT a.p AS p1, b.p AS p2
  FROM capped a JOIN capped b ON a.o = b.o
  WHERE a.p < b.p GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_COSUPPORT}
),
deg AS MATERIALIZED (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT p1 AS n FROM und UNION ALL SELECT p2 FROM und
  ) GROUP BY 1
),
per_k AS ({per_k})
SELECT k, n_club, e_club,
       CASE WHEN n_club >= 2
            THEN (2.0 * CAST(e_club AS DOUBLE))
                 / (CAST(n_club AS DOUBLE) * (CAST(n_club AS DOUBLE) - 1.0))
       END AS phi
FROM per_k
ORDER BY k
"""



# ---------------------------------------------------------------------------
# SALSA authority ranking on the customer→supplier bipartite graph (round 8)
# ---------------------------------------------------------------------------

SALSA_FP = 10**12   # integer fixed-point mass (the markov/pagerank scale)
SALSA_ITERS = 3     # full hub→authority→hub alternations, unrolled
SALSA_TOP = 20


def q_graph_salsa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALSA authority scores (Lempel & Moran 2000) over the bipartite
    customer→supplier purchase graph: HITS' hub/authority alternation
    with STOCHASTIC normalization — each half-step spreads every node's
    mass equally over its edges instead of L2-normalizing afterwards.
    That choice is what makes the whole computation exact integer
    fixed-point: mass is conserved (no global renormalize, hence no
    overflow ladder and no sqrt), and each term is one
    ``mass DIV degree`` — the ``events_markov_stationary`` discipline on
    a bipartite double walk. The classic use: "authoritative suppliers"
    = those reachable from many well-connected customers, a different
    (and more manipulation-resistant) signal than raw degree.

    {it} unrolled alternations from the uniform customer start; the
    oracle unrolls the identical integer recurrence through MATERIALIZED
    CTEs. Scale shape: the edge build is the data-sized step (distinct
    (cust, supp) via one join + dedup, localCheckpoint'd once); each
    half-step is an edge⋈mass equi-join + hash agg — linear in edges,
    {it} rounds; the final top-{top} is a domain-sized sort.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = edges.groupBy("cust").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    indeg = edges.groupBy("supp").agg(F.count(F.lit(1)).cast("long").alias("indeg"))
    e_out = edges.join(outdeg, "cust").localCheckpoint(eager=True)
    e_in = edges.join(indeg, "supp").localCheckpoint(eager=True)
    n_cust = outdeg.count()  # scalar: node count, not data-sized
    h = outdeg.select(
        "cust", (F.lit(SALSA_FP) / F.lit(n_cust)).cast("long").alias("mass")
    )
    a = None
    for _ in range(SALSA_ITERS):
        a = (
            e_out.join(h, "cust")
            .select("supp", F.expr("mass DIV outdeg").alias("part"))
            .groupBy("supp")
            .agg(F.sum("part").cast("long").alias("mass"))
            .localCheckpoint(eager=True)
        )
        h = (
            e_in.join(a, "supp")
            .select("cust", F.expr("mass DIV indeg").alias("part"))
            .groupBy("cust")
            .agg(F.sum("part").cast("long").alias("mass"))
            .localCheckpoint(eager=True)
        )
    return (
        a.join(indeg, "supp")
        .select(
            "supp",
            F.col("mass").alias("authority_fp"),
            (F.col("mass").cast("double") / F.lit(float(SALSA_FP))).alias("authority"),
            "indeg",
        )
        .orderBy(F.desc("authority_fp"), F.asc("supp"))
        .limit(SALSA_TOP)
    )
q_graph_salsa.__doc__ = q_graph_salsa.__doc__ and q_graph_salsa.__doc__.format(it=SALSA_ITERS, top=SALSA_TOP)


def _sql_salsa() -> str:
    base = f"""
edges AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
outdeg AS MATERIALIZED (
  SELECT cust, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY 1
),
indeg AS MATERIALIZED (
  SELECT supp, CAST(COUNT(*) AS BIGINT) AS indeg FROM edges GROUP BY 1
),
h0 AS MATERIALIZED (
  SELECT cust, CAST({SALSA_FP} // (SELECT COUNT(*) FROM outdeg) AS BIGINT) AS mass
  FROM outdeg
)"""
    rounds = []
    prev_h = "h0"
    for i in range(1, SALSA_ITERS + 1):
        rounds.append(f"""
a{i} AS MATERIALIZED (
  SELECT e.supp, CAST(SUM(h.mass // o.outdeg) AS BIGINT) AS mass
  FROM edges e JOIN outdeg o ON e.cust = o.cust JOIN {prev_h} h ON e.cust = h.cust
  GROUP BY 1
),
h{i} AS MATERIALIZED (
  SELECT e.cust, CAST(SUM(a.mass // i.indeg) AS BIGINT) AS mass
  FROM edges e JOIN indeg i ON e.supp = i.supp JOIN a{i} a ON e.supp = a.supp
  GROUP BY 1
)""")
        prev_h = f"h{i}"
    return (
        "WITH "
        + base
        + ","
        + ",".join(rounds)
        + f"""
SELECT a.supp AS supp, a.mass AS authority_fp,
       CAST(a.mass AS DOUBLE) / CAST({SALSA_FP} AS DOUBLE) AS authority,
       i.indeg
FROM a{SALSA_ITERS} a JOIN indeg i ON a.supp = i.supp
ORDER BY authority_fp DESC, supp ASC
LIMIT {SALSA_TOP}
"""
    )


# ---------------------------------------------------------------------------
# HITS hubs/authorities on the directed customer->supplier purchase graph
# ---------------------------------------------------------------------------

HITS_ITERS = 2
HITS_TOP = 10
HITS_FP = 10**15


def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS on the DIRECTED purchase graph (customer -> supplier edge per
    distinct buying relationship): hub scores for customers (buyers whose
    baskets point at authoritative suppliers) and authority scores for
    suppliers, {it} mutual-reinforcement rounds, top {k} per role — the
    link-analysis twin of ``graph_pagerank``/``graph_salsa`` that
    separates the two node roles instead of mixing them in one rank.

    Determinism: each half-step sum is a fixed-point floor-quantized
    DECIMAL aggregate (the PageRank pattern, order-free on any
    partitioning); normalization is by the group MAX (max of identical
    doubles is order-free; one division per node) rather than the L2
    norm — same fixed point up to scale, one fewer reduction.

    Scale shape: per half-step, one join of the score vector against the
    edge list on its key + one map-side-combinable hash agg — Pregel's
    synchronous step relationally, identical partitioning reusable
    across rounds (edge list localCheckpointed once; each normalized
    score vector localCheckpointed per half-step so the plan stays
    O(iters) exchanges instead of an unrolled lineage — the
    PageRank/HyperBall discipline). No collect, no driver state.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").cast("bigint").alias("c"),
            F.col("l_suppkey").cast("bigint").alias("s"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    hubs = pairs.select("c").distinct().select("c", F.lit(1.0).alias("h"))
    fp = F.lit(float(HITS_FP))
    auth = None
    for _ in range(HITS_ITERS):
        a_raw = (
            hubs.join(pairs, "c")
            .groupBy("s")
            .agg(
                (
                    F.sum(F.floor(F.col("h") * fp).cast("decimal(38,0)")).cast(
                        "double"
                    )
                    / fp
                ).alias("a_raw")
            )
        )
        a_max = a_raw.agg(F.max("a_raw").alias("_mx"))
        auth = (
            a_raw.crossJoin(F.broadcast(a_max))
            .select("s", (F.col("a_raw") / F.col("_mx")).alias("a"))
            .localCheckpoint(eager=True)
        )
        h_raw = (
            auth.join(pairs, "s")
            .groupBy("c")
            .agg(
                (
                    F.sum(F.floor(F.col("a") * fp).cast("decimal(38,0)")).cast(
                        "double"
                    )
                    / fp
                ).alias("h_raw")
            )
        )
        h_max = h_raw.agg(F.max("h_raw").alias("_mx"))
        hubs = (
            h_raw.crossJoin(F.broadcast(h_max))
            .select("c", (F.col("h_raw") / F.col("_mx")).alias("h"))
            .localCheckpoint(eager=True)
        )
    top_a = (
        auth.select(
            F.lit("authority").alias("role"),
            F.concat(F.lit("s:"), F.col("s").cast("string")).alias("node"),
            F.col("a").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(HITS_TOP)
    )
    top_h = (
        hubs.select(
            F.lit("hub").alias("role"),
            F.concat(F.lit("c:"), F.col("c").cast("string")).alias("node"),
            F.col("h").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(HITS_TOP)
    )
    return top_a.unionAll(top_h).orderBy("role", F.desc("score"), F.asc("node"))
q_graph_hits.__doc__ = q_graph_hits.__doc__ and q_graph_hits.__doc__.format(it=HITS_ITERS, k=HITS_TOP)


def _sql_hits() -> str:
    fp = float(HITS_FP)
    base = """
pairs AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS c, CAST(l_suppkey AS BIGINT) AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
h0 AS (SELECT DISTINCT c, 1.0::DOUBLE AS h FROM pairs)"""
    iters = []
    prev_h = "h0"
    prev_a = None
    for i in range(1, HITS_ITERS + 1):
        iters.append(f"""
ar{i} AS (
  SELECT s, CAST(SUM(CAST(floor(h * {fp!r}) AS DECIMAL(38,0))) AS DOUBLE) / {fp!r} AS a_raw
  FROM {prev_h} JOIN pairs USING (c) GROUP BY s
),
a{i} AS (SELECT s, a_raw / (SELECT MAX(a_raw) FROM ar{i}) AS a FROM ar{i}),
hr{i} AS (
  SELECT c, CAST(SUM(CAST(floor(a * {fp!r}) AS DECIMAL(38,0))) AS DOUBLE) / {fp!r} AS h_raw
  FROM a{i} JOIN pairs USING (s) GROUP BY c
),
h{i} AS (SELECT c, h_raw / (SELECT MAX(h_raw) FROM hr{i}) AS h FROM hr{i})""")
        prev_h = f"h{i}"
        prev_a = f"a{i}"
    return (
        "WITH "
        + base
        + ","
        + ",".join(iters)
        + f"""
SELECT * FROM (
  (SELECT 'authority' AS role, 's:' || CAST(s AS VARCHAR) AS node, a AS score
   FROM {prev_a} ORDER BY score DESC, node ASC LIMIT {HITS_TOP})
  UNION ALL
  (SELECT 'hub' AS role, 'c:' || CAST(c AS VARCHAR) AS node, h AS score
   FROM {prev_h} ORDER BY score DESC, node ASC LIMIT {HITS_TOP})
)
ORDER BY role, score DESC, node ASC
"""
    )


# ---------------------------------------------------------------------------
# Personalized PageRank from a seed set (random walk with restart)
# ---------------------------------------------------------------------------

PPR_DAMPING = 0.85
PPR_ITERS = 3
PPR_TOP = 20
PPR_SEED_MOD = 10  # seed set: suppliers with s_suppkey % 10 == 1


def q_graph_ppr_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank with restart to a fixed supplier cohort
    (s_suppkey % {md} == 1 — a deterministic stand-in for "this
    merchant's suppliers" that is non-empty at every scale factor):
    rank(v) = (1-d)*seed(v)/|S| + d * sum incoming rank/degree,
    {it} unrolled rounds on the undirected customer-supplier graph —
    "entities related to THIS set", the recommendation/entity-expansion
    primitive that global PageRank can't answer.

    The rank vector stays SPARSE: round i materializes only nodes within
    i hops of the seed set (non-seed nodes with no inbound contribution
    have exactly rank 0 and never exist as rows) — at 100 TB the frontier
    size, not the graph size, bounds the per-round state, the same
    locality argument as ``graph_khop``. Contribution sums are
    fixed-point floor-quantized DECIMAL aggregates (the PageRank
    pattern). Per round there is exactly ONE data-sized join — the
    frontier against the once-materialized (src, dst, degree) edge table
    (degree pre-joined into the localCheckpoint, so the per-round plan
    never re-joins it) — and the restart mass attaches by UNION + re-agg
    rather than a full-outer join: every node has at most two mass rows
    (restart, damped inbound sum) and IEEE addition of two doubles is
    commutative, so the 2-addend SUM is order-free. (The r9 first cut
    did ranks⋈degree⋈edges plus a full-outer per round and went 11.5x at
    organic sf1; this shape is the PageRank A/B discipline applied to
    the sparse-frontier case.)
    """
    edges = _edges_int(spark, sf_dir)
    degree = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree")).select(
        F.col("src").alias("dnode"), "degree"
    )
    edges_deg = (
        edges.join(degree, edges["src"] == degree["dnode"])
        .select("src", "dst", "degree")
        .localCheckpoint(eager=True)
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    seeds = supplier.filter(F.col("s_suppkey") % PPR_SEED_MOD == 1).select(
        (F.col("s_suppkey").cast("bigint") * 2 + 1).alias("node")
    )
    n_seed = seeds.agg(F.count(F.lit(1)).alias("_ns"))
    restart = seeds.crossJoin(F.broadcast(n_seed)).select(
        "node",
        (F.lit(1.0 - PPR_DAMPING) / F.col("_ns").cast("double")).alias("mass"),
    )
    fp = F.lit(float(PR_FP))
    ranks = seeds.crossJoin(F.broadcast(n_seed)).select(
        "node", (F.lit(1.0) / F.col("_ns").cast("double")).alias("rank")
    )
    for _ in range(PPR_ITERS):
        contrib = ranks.join(edges_deg, ranks["node"] == edges_deg["src"]).select(
            F.col("dst"),
            F.floor((F.col("rank") / F.col("degree")) * fp)
            .cast("decimal(38,0)")
            .alias("contrib_fp"),
        )
        damped = contrib.groupBy("dst").agg(
            (
                F.lit(PPR_DAMPING)
                * (F.sum("contrib_fp").cast("double") / fp)
            ).alias("mass")
        ).select(F.col("dst").alias("node"), "mass")
        ranks = (
            damped.unionAll(restart)
            .groupBy("node")
            .agg(F.sum("mass").alias("rank"))
        )
    labeled = ranks.select(
        F.concat(
            F.when(F.col("node") % 2 == 0, F.lit("c:")).otherwise(F.lit("s:")),
            F.shiftright(F.col("node"), 1).cast("string"),
        ).alias("node"),
        "rank",
    )
    return labeled.orderBy(F.desc("rank"), F.asc("node")).limit(PPR_TOP)
q_graph_ppr_seeded.__doc__ = q_graph_ppr_seeded.__doc__ and q_graph_ppr_seeded.__doc__.format(md=PPR_SEED_MOD, it=PPR_ITERS)


def _sql_ppr() -> str:
    fp = float(PR_FP)
    base = f"""
pairs AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS cnode,
                  CAST(l_suppkey AS BIGINT) * 2 + 1 AS snode
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT cnode AS src, snode AS dst FROM pairs
  UNION ALL
  SELECT snode AS src, cnode AS dst FROM pairs
),
degree AS (SELECT src, COUNT(*) AS degree FROM edges GROUP BY src),
seeds AS (
  SELECT CAST(s_suppkey AS BIGINT) * 2 + 1 AS node
  FROM supplier WHERE s_suppkey % {PPR_SEED_MOD} = 1
),
ns AS (SELECT COUNT(*) AS _ns FROM seeds),
restart AS (SELECT node, {1.0 - PPR_DAMPING} / CAST(_ns AS DOUBLE) AS restart FROM seeds, ns),
r0 AS (SELECT node, 1.0 / CAST(_ns AS DOUBLE) AS rank FROM seeds, ns)"""
    iters = []
    prev = "r0"
    for i in range(1, PPR_ITERS + 1):
        iters.append(f"""
s{i} AS (
  SELECT e.dst,
         CAST(SUM(CAST(floor((r.rank / d.degree) * {fp!r}) AS DECIMAL(38,0)))
              AS DOUBLE) / {fp!r} AS _sum
  FROM {prev} r JOIN degree d ON r.node = d.src JOIN edges e ON r.node = e.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT COALESCE(s{i}.dst, restart.node) AS node,
         COALESCE(restart.restart, 0.0) + {PPR_DAMPING} * COALESCE(s{i}._sum, 0.0) AS rank
  FROM s{i} FULL OUTER JOIN restart ON s{i}.dst = restart.node
)""")
        prev = f"r{i}"
    return (
        "WITH "
        + base
        + ","
        + ",".join(iters)
        + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'c:' ELSE 's:' END || CAST(node // 2 AS VARCHAR) AS node,
       rank
FROM {prev}
ORDER BY rank DESC, node ASC
LIMIT {PPR_TOP}
"""
    )


# ---------------------------------------------------------------------------
# Round-10 additions: resource-allocation link prediction and HyperBall
# ---------------------------------------------------------------------------

RA_TOP = 20
RA_FP = 10**12  # fixed-point scale for the 1/deg(center) weights


def q_graph_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-Allocation link prediction over the customer–supplier
    bipartite graph: for every supplier pair, RA(a,b) = Σ over common
    customers z of 1/deg(z) — the hub-discounting weighting
    ``graph_link_prediction`` deliberately could not offer (Adamic–Adar
    needs 1/log deg, a transcendental this matrix bans; RA keeps the
    same "a shared customer who buys from everyone is weak evidence"
    signal with a plain reciprocal). Weights are FIXED-POINT exact:
    floor({fp} / deg(z)) summed as integers — deg ≤ {cap} so the floor
    loses < 1e-12 relative and both engines floor identically; the only
    float is the final /{fp} rescale.

    Scale shape: identical candidate economics to
    ``graph_supplier_similarity`` — pairs explode inline from each
    customer's capped sorted supplier array (one hash agg, no self-join,
    C(k,2) per customer with k ≤ {cap}), each pair born carrying its
    customer's weight; one (supp_a, supp_b) hash agg finishes. The cap
    is mirrored in the oracle, so the gate certifies the capped
    semantics."""
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    capped = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("supps"))
        .filter(F.size("supps") <= SUPPS_PER_CUST_CAP)
    )
    pair_expr = F.expr(
        "flatten(transform(supps, (x, i) -> "
        "transform(slice(supps, i + 2, size(supps)), "
        "y -> struct(x AS supp_a, y AS supp_b))))"
    )
    weighted = capped.select(
        F.explode(pair_expr).alias("p"),
        F.expr(f"CAST({RA_FP} AS BIGINT) div size(supps)").alias("w_fp"),
    )
    scored = (
        weighted.select("p.supp_a", "p.supp_b", "w_fp")
        .groupBy("supp_a", "supp_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_custs"),
            F.sum("w_fp").cast("long").alias("ra_fp"),
        )
    )
    return scored.select(
        "supp_a",
        "supp_b",
        "common_custs",
        (F.col("ra_fp").cast("double") / F.lit(float(RA_FP))).alias("ra_score"),
    ).orderBy(
        F.desc("ra_fp"), F.asc("supp_a"), F.asc("supp_b")
    ).limit(RA_TOP)
q_graph_resource_allocation.__doc__ = q_graph_resource_allocation.__doc__ and q_graph_resource_allocation.__doc__.format(fp=RA_FP, cap=SUPPS_PER_CUST_CAP)



KATZ_ITERS = 3
KATZ_ALPHA_NUM, KATZ_ALPHA_DEN = 1, 8  # attenuation α = 1/8 — exact rational
KATZ_FP = 10**9  # fixed-point scale for the score vector
KATZ_TOP = 20


def q_graph_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality on the undirected purchase graph, truncated at
    path length {it}: x = Σ_{{k=1..{it}}} α^k·(A^k·1) — "how many walks
    end here, geometrically discounted by length" — the centrality that
    COUNTS PATHS where PageRank splits mass (a hub with many weak
    spokes ranks high in Katz, low in PageRank) and converges for
    α < 1/λ_max by construction of the truncation. Completes the
    centrality ladder: degree → PageRank → HITS/SALSA (mutual) → PPR
    (seeded) → HyperBall (distance) → Katz (walk-counting).

    Exactness: with α = {an}/{ad} EXACT, each round is x ← (A·x)·{an}
    div {ad} + A·1·... concretely the walk-sum accumulates in
    FIXED-POINT integers: x₀ = {fp}; per round the neighbor sum is an
    integer agg and the α-discount one INTEGER floor-divide (the SQL
    `div`, never the double `/` — a 10¹⁵ fixed-point sum would leave
    the 2⁵³ exact window) — zero float surface until the final /{fp}
    rescale. Per-round
    localCheckpoint (the PageRank/HITS discipline) keeps the plan
    O(iters). The oracle unrolls the same {it} rounds as MATERIALIZED
    CTEs (the SALSA pattern).

    Scale shape: per round one edges⋈scores join on the node key + one
    map-side-combinable hash agg — Pregel's step relationally."""
    edges = _edges_int(spark, sf_dir).localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    # x holds the CUMULATIVE katz sum; w holds the current walk layer
    state = nodes.select(
        "node",
        F.lit(0).cast("long").alias("x_fp"),
        F.lit(KATZ_FP).cast("long").alias("w_fp"),
    ).localCheckpoint(eager=True)
    for _ in range(KATZ_ITERS):
        msgs = (
            edges.join(state.select(F.col("node").alias("src"), "w_fp"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("w_fp").cast("long").alias("nbr_fp"))
        )
        state = (
            state.join(msgs, "node", "left")
            .select(
                "node",
                "x_fp",
                # integer floor-div (never the double / operator: a 10^15
                # fixed-point sum would leave the 2^53 exact window)
                F.expr(
                    f"CAST(coalesce(nbr_fp, 0L) * {KATZ_ALPHA_NUM}"
                    f" div {KATZ_ALPHA_DEN} AS BIGINT)"
                ).alias("w_new"),
            )
            .select(
                "node",
                (F.col("x_fp") + F.col("w_new")).cast("long").alias("x_fp"),
                F.col("w_new").alias("w_fp"),
            )
            .localCheckpoint(eager=True)
        )
    lbl = F.concat(
        F.when(F.col("node") % 2 == 0, F.lit("c:")).otherwise(F.lit("s:")),
        # exact bit-shift, not double division + truncation (r11 ADVICE):
        # same idiom as the PageRank/LPA label paths, exact for all longs
        F.shiftright(F.col("node"), 1).cast("string"),
    )
    return (
        state.select(
            lbl.alias("node"),
            F.col("x_fp").alias("katz_fp"),
            (F.col("x_fp").cast("double") / F.lit(float(KATZ_FP))).alias("katz"),
        )
        .orderBy(F.desc("katz_fp"), F.asc("node"))
        .limit(KATZ_TOP)
    )
q_graph_katz_centrality.__doc__ = q_graph_katz_centrality.__doc__ and q_graph_katz_centrality.__doc__.format(
        it=KATZ_ITERS, an=KATZ_ALPHA_NUM, ad=KATZ_ALPHA_DEN, fp=KATZ_FP
    )


def _sql_katz() -> str:
    base = f"""
edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS cnode,
           CAST(l_suppkey AS BIGINT) * 2 + 1 AS snode
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  ) t, (SELECT UNNEST([0, 1]) AS d) dd,
  LATERAL (SELECT CASE WHEN d = 0 THEN cnode ELSE snode END AS src,
                  CASE WHEN d = 0 THEN snode ELSE cnode END AS dst) x
),
s0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS x_fp,
         CAST({KATZ_FP} AS BIGINT) AS w_fp
  FROM edges
)"""
    rounds = []
    prev = "s0"
    for i in range(1, KATZ_ITERS + 1):
        rounds.append(f"""
m{i} AS MATERIALIZED (
  SELECT e.dst AS node, CAST(SUM(s.w_fp) AS BIGINT) AS nbr_fp
  FROM edges e JOIN {prev} s ON e.src = s.node
  GROUP BY 1
),
s{i} AS MATERIALIZED (
  SELECT s.node,
         CAST(s.x_fp + COALESCE(m.nbr_fp, 0) * {KATZ_ALPHA_NUM} // {KATZ_ALPHA_DEN} AS BIGINT) AS x_fp,
         CAST(COALESCE(m.nbr_fp, 0) * {KATZ_ALPHA_NUM} // {KATZ_ALPHA_DEN} AS BIGINT) AS w_fp
  FROM {prev} s LEFT JOIN m{i} m ON s.node = m.node
)""")
        prev = f"s{i}"
    return (
        "WITH "
        + base
        + ","
        + ",".join(rounds)
        + f"""
SELECT (CASE WHEN node % 2 = 0 THEN 'c:' ELSE 's:' END)
         || CAST(node // 2 AS VARCHAR) AS node,
       x_fp AS katz_fp,
       CAST(x_fp AS DOUBLE) / {float(KATZ_FP)!r} AS katz
FROM {prev}
ORDER BY katz_fp DESC, node ASC
LIMIT {KATZ_TOP}
"""
    )


AA_FP = 10**12  # fixed-point scale for the 1/ln(deg) weights
# Python-precomputed weight LUT over the LITERAL degree domain 2..cap —
# the periodogram escape: ln never runs engine-side (banned transcendental,
# tests/test_numeric_portability.py); both engines consume the SAME
# Python-computed integers, so the sum is exact and platform-free.
_AA_WEIGHTS = {k: int(math.floor(AA_FP / math.log(k))) for k in range(2, 65)}


def q_graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the customer–supplier bipartite
    graph: AA(a,b) = Σ over common customers z of 1/ln(deg(z)) — the
    CLASSIC hub-discounting weight, completing the link-prediction
    ladder (``graph_link_prediction`` unweighted, ``graph_resource_
    allocation`` 1/deg, this entry 1/ln deg — the literature's default
    and the gentlest discount, so high-degree shared customers still
    count where RA zeroes them out).

    Determinism: deg(z) ≥ 2 for any common neighbor (it touches both
    endpoints) and is capped at {cap}, so the weight domain is the
    LITERAL integer range 2..{cap} — floor({fp}/ln k) is PRECOMPUTED in
    Python per k (the periodogram LUT escape: ln is a banned
    engine-side transcendental) and consumed as identical integer
    literals by both engines; the pair agg sums INTEGERS order-free,
    and the only float is the final /{fp} rescale.

    Scale shape: identical to ``graph_resource_allocation`` — pairs
    explode inline from each customer's capped sorted supplier array,
    one (supp_a, supp_b) hash agg, cap mirrored in the oracle."""
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    capped = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("supps"))
        .filter(F.size("supps") <= SUPPS_PER_CUST_CAP)
    )
    pair_expr = F.expr(
        "flatten(transform(supps, (x, i) -> "
        "transform(slice(supps, i + 2, size(supps)), "
        "y -> struct(x AS supp_a, y AS supp_b))))"
    )
    lut = None
    for k in range(2, SUPPS_PER_CUST_CAP + 1):
        cond = F.size("supps") == k
        w = F.lit(_AA_WEIGHTS[k])
        lut = F.when(cond, w) if lut is None else lut.when(cond, w)
    weighted = capped.filter(F.size("supps") >= 2).select(
        F.explode(pair_expr).alias("p"),
        lut.cast("long").alias("w_fp"),
    )
    scored = (
        weighted.select("p.supp_a", "p.supp_b", "w_fp")
        .groupBy("supp_a", "supp_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_custs"),
            F.sum("w_fp").cast("long").alias("aa_fp"),
        )
    )
    return scored.select(
        "supp_a",
        "supp_b",
        "common_custs",
        (F.col("aa_fp").cast("double") / F.lit(float(AA_FP))).alias("aa_score"),
    ).orderBy(
        F.desc("aa_fp"), F.asc("supp_a"), F.asc("supp_b")
    ).limit(RA_TOP)
q_graph_adamic_adar.__doc__ = q_graph_adamic_adar.__doc__ and q_graph_adamic_adar.__doc__.format(
        fp=AA_FP, cap=SUPPS_PER_CUST_CAP
    )


_AA_CASE = " ".join(f"WHEN {k} THEN {w}" for k, w in sorted(_AA_WEIGHTS.items()))

_ORACLE_ADAMIC_ADAR = f"""
WITH cs_raw AS (
  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), sized AS (
  SELECT cust, supp, COUNT(*) OVER (PARTITION BY cust) AS k
  FROM cs_raw
), cs AS (
  SELECT cust, supp,
         CAST(CASE k {_AA_CASE} END AS BIGINT) AS w_fp
  FROM sized WHERE k <= {SUPPS_PER_CUST_CAP} AND k >= 2
), pairs AS (
  SELECT a.supp AS supp_a, b.supp AS supp_b,
         CAST(COUNT(*) AS BIGINT) AS common_custs,
         CAST(SUM(a.w_fp) AS BIGINT) AS aa_fp
  FROM cs a JOIN cs b ON a.cust = b.cust AND a.supp < b.supp
  GROUP BY 1, 2
)
SELECT supp_a, supp_b, common_custs,
       CAST(aa_fp AS DOUBLE) / {float(AA_FP)!r} AS aa_score
FROM pairs
ORDER BY aa_fp DESC, supp_a ASC, supp_b ASC
LIMIT {RA_TOP}
"""


_ORACLE_RESOURCE_ALLOCATION = f"""
WITH cs_raw AS (
  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), sized AS (
  SELECT cust, supp, COUNT(*) OVER (PARTITION BY cust) AS k
  FROM cs_raw
), cs AS (
  SELECT cust, supp, CAST({RA_FP} AS BIGINT) // k AS w_fp
  FROM sized WHERE k <= {SUPPS_PER_CUST_CAP}
), pairs AS (
  SELECT a.supp AS supp_a, b.supp AS supp_b,
         CAST(COUNT(*) AS BIGINT) AS common_custs,
         CAST(SUM(a.w_fp) AS BIGINT) AS ra_fp
  FROM cs a JOIN cs b ON a.cust = b.cust AND a.supp < b.supp
  GROUP BY 1, 2
)
SELECT supp_a, supp_b, common_custs,
       CAST(ra_fp AS DOUBLE) / {float(RA_FP)!r} AS ra_score
FROM pairs
ORDER BY ra_fp DESC, supp_a ASC, supp_b ASC
LIMIT {RA_TOP}
"""


HB_M = 32  # HyperBall registers per node (p = 5)
HB_BITS = 5
HB_REST_BITS = 48 - HB_BITS  # md5 48-bit prefix minus the register selector
HB_ALPHA = 0.697  # standard HLL alpha for m = 32
HB_SCALE = HB_ALPHA * HB_M * HB_M * float(2**50)
HB_LC_THRESHOLD = 2.5 * HB_M
HB_ITERS = 3
# Python-precomputed m*ln(m/V) linear-counting LUT — the Hilbert-LUT escape
# from the no-transcendentals policy (sketches.py uses the identical trick)
_HB_LC_LUT = [
    (v, float(HB_M) * math.log(float(HB_M) / float(v))) for v in range(1, HB_M + 1)
]


def _sql_hb_lut() -> str:
    rows = ", ".join(f"({v}, CAST({lc!r} AS DOUBLE))" for v, lc in _HB_LC_LUT)
    return f"(VALUES {rows}) lut(v, lc_est)"


def q_graph_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall (Boldi–Vigna): the neighborhood function N(t) = Σ_v
    |ball(v, t)| of the customer–supplier graph, estimated with one
    {m}-register HyperLogLog PER NODE, merged along edges — THE
    large-graph distance-distribution algorithm (it replaced exact BFS
    for "effective diameter of the web graph" because register merge is
    associative: ball(v,t+1) = HLL-merge of v's and its neighbors'
    t-balls). Exact t-hop reachability would materialize Θ(n²) pairs by
    t=3 on this graph; the register table stays ≤ |V|·{m} rows forever.

    Registers are RELATIONAL rows (node, reg, m_j) — the merge is a plain
    (node, reg) MAX hash agg after pulling neighbor registers across the
    edge list, so both engines run the identical integer program: md5
    48-bit prefix hash, leading-zero rank via length(bin(rest)), harmonic
    sum carried as the exact integer Σ2^(50−m_j) (sketches.py recipe),
    small-range linear counting via a {m}-row Python-precomputed LUT.
    N(t) is an fsum over per-node estimates; reach_fraction = N(t)/n² is
    the distance-CDF readout whose first t ≥ 0.9 is the effective
    diameter.

    Scale shape: per iteration ONE edges⋈registers join + one map-side-
    combinable (node, reg) MAX agg — state O(|V|·m), traffic O(|E|·m)
    worst case; no per-node BFS frontier sets, no pair materialization.
    The loop is {it} fixed unrolled iterations (bipartite: 3 hops spans
    c→s→c→s), localCheckpointed per round like PageRank."""
    edges = _edges_int(spark, sf_dir).localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    x = F.conv(
        F.substring(F.md5(F.col("node").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    rest = F.shiftright(x, HB_BITS)
    rho = F.when(rest == 0, F.lit(HB_REST_BITS + 1)).otherwise(
        F.lit(HB_REST_BITS + 1) - F.length(F.bin(rest))
    )
    regs = nodes.select(
        "node", (x % F.lit(HB_M)).alias("reg"), rho.alias("m_j")
    ).localCheckpoint(eager=True)

    lut = regs.sparkSession.createDataFrame(_HB_LC_LUT, "v LONG, lc_est DOUBLE")

    def ball_sum(r: DataFrame, t: int) -> DataFrame:
        est = r.groupBy("node").agg(
            (
                F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(50 - m_j AS INT))"))
                + (F.lit(HB_M) - F.count(F.lit(1))) * F.lit(2**50)
            ).alias("int_sum"),
            (F.lit(HB_M) - F.count(F.lit(1))).cast("long").alias("zero_regs"),
        )
        raw = F.lit(HB_SCALE) / F.col("int_sum").cast("double")
        corr = F.when(
            (raw <= F.lit(HB_LC_THRESHOLD)) & (F.col("zero_regs") > 0),
            F.col("lc_est"),
        ).otherwise(raw)
        return (
            est.join(F.broadcast(lut), F.col("zero_regs") == F.col("v"), "left")
            .select(corr.alias("ball_est"))
            .agg(
                F.lit(t).cast("int").alias("t"),
                F.count(F.lit(1)).cast("long").alias("n_nodes"),
                fsum("ball_est", scale=4).alias("ball_sum_est"),
            )
        )

    out = ball_sum(regs, 0)
    cur = regs
    for t in range(1, HB_ITERS + 1):
        pulled = edges.join(cur, edges["dst"] == cur["node"]).select(
            edges["src"].alias("node"), "reg", "m_j"
        )
        cur = (
            cur.unionAll(pulled)
            .groupBy("node", "reg")
            .agg(F.max("m_j").alias("m_j"))
            .localCheckpoint(eager=True)
        )
        out = out.unionAll(ball_sum(cur, t))
    return out.select(
        "t",
        "n_nodes",
        "ball_sum_est",
        (
            F.col("ball_sum_est")
            / (F.col("n_nodes").cast("double") * F.col("n_nodes").cast("double"))
        ).alias("reach_fraction"),
    ).orderBy("t")
q_graph_hyperball.__doc__ = q_graph_hyperball.__doc__ and q_graph_hyperball.__doc__.format(
        m=HB_M, it=HB_ITERS
    )


def _sql_hyperball() -> str:
    x = _sql_hex_to_int("md5(CAST(node AS VARCHAR))", 1, 12)
    est_sql = """
  SELECT {t} AS t, node,
         SUM((CAST(1 AS BIGINT) << (50 - m_j)))
           + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << 50) AS int_sum,
         CAST({m} - COUNT(*) AS BIGINT) AS zero_regs
  FROM {src} GROUP BY node
"""
    iters = []
    prev = "b0"
    for t in range(1, HB_ITERS + 1):
        iters.append(
            f"""b{t} AS (
  SELECT node, reg, MAX(m_j) AS m_j FROM (
    SELECT node, reg, m_j FROM {prev}
    UNION ALL
    SELECT e.src AS node, r.reg, r.m_j FROM edges e JOIN {prev} r ON e.dst = r.node
  ) GROUP BY 1, 2
)"""
        )
        prev = f"b{t}"
    est_blocks = " UNION ALL ".join(
        "(" + est_sql.format(t=t, m=HB_M, src=f"b{t}") + ")"
        for t in range(0, HB_ITERS + 1)
    )
    return f"""
WITH edges AS (
  SELECT CAST(o_custkey AS BIGINT) * 2 AS src,
         CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  UNION
  SELECT CAST(l_suppkey AS BIGINT) * 2 + 1, CAST(o_custkey AS BIGINT) * 2
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
), b0 AS (
  SELECT node, {x} % {HB_M} AS reg,
         CASE WHEN {x} // {HB_M} = 0 THEN {HB_REST_BITS + 1}
              ELSE {HB_REST_BITS + 1} - length(bin({x} // {HB_M}))
         END AS m_j
  FROM nodes
), {",".join(iters)}, ests AS (
  {est_blocks}
), corrected AS (
  SELECT t, node,
         CASE WHEN ({HB_SCALE!r} / CAST(int_sum AS DOUBLE)) <= {HB_LC_THRESHOLD!r}
                   AND zero_regs > 0
              THEN lut.lc_est
              ELSE {HB_SCALE!r} / CAST(int_sum AS DOUBLE)
         END AS ball_est
  FROM ests LEFT JOIN {_sql_hb_lut()} ON zero_regs = lut.v
)
SELECT CAST(t AS INTEGER) AS t,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       {sql_fsum("ball_est", scale=4)} AS ball_sum_est,
       {sql_fsum("ball_est", scale=4)}
         / (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)) AS reach_fraction
FROM corrected
GROUP BY t
ORDER BY t
"""


# ---------------------------------------------------------------------------
# k-truss decomposition (round 12)
# ---------------------------------------------------------------------------

KTRUSS_K = 3  # every surviving edge sits in >= k-2 = 1 triangle
# (k=4 peels the support-floored graph EMPTY at sf0.01+ — a trivially
# matching 0-row result; the 3-truss keeps a live, still-shrinking core:
# peeling an unsupported edge can destroy its neighbours' triangles, so
# rounds 2+ do real work)
KTRUSS_ROUNDS = 4  # unrolled peeling rounds — BOTH engines run exactly these
KTRUSS_TOP = 20

_SQL_CAPPED_EDGES = f"""
op AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
capped AS MATERIALIZED (
  SELECT o, p FROM (
    SELECT o, p, COUNT(*) OVER (PARTITION BY o) AS n_parts FROM op
  ) WHERE n_parts <= {PARTS_PER_ORDER_CAP}
),
e0 AS MATERIALIZED (
  SELECT a.p AS p1, b.p AS p2
  FROM capped a JOIN capped b USING (o)
  WHERE a.p < b.p
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_COSUPPORT}
)"""


def _truss_round_sql(i: int) -> str:
    """One peeling round: undirected view -> wedge-join common-neighbour
    counts -> keep edges with support >= k-2."""
    return f"""
und{i} AS MATERIALIZED (
  SELECT p1 AS u, p2 AS v FROM e{i}
  UNION ALL
  SELECT p2 AS u, p1 AS v FROM e{i}
),
cn{i} AS MATERIALIZED (
  SELECT a.u AS p1, b.u AS p2, CAST(COUNT(*) AS BIGINT) AS s
  FROM und{i} a JOIN und{i} b ON a.v = b.v AND a.u < b.u
  GROUP BY 1, 2
),
e{i + 1} AS MATERIALIZED (
  SELECT e.p1, e.p2
  FROM e{i} e JOIN cn{i} c ON c.p1 = e.p1 AND c.p2 = e.p2
  WHERE c.s >= {KTRUSS_K - 2}
)"""


def _truss_support(e: DataFrame) -> DataFrame:
    """Per-edge triangle support of the CURRENT edge set: undirected view,
    wedge join on the shared neighbour, count per (p1 < p2) pair."""
    und = e.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionAll(
        e.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    )
    a = und.select(F.col("u").alias("ua"), F.col("v").alias("w"))
    b = und.select(F.col("u").alias("ub"), F.col("v").alias("w"))
    return (
        a.join(b, "w")
        .filter(F.col("ua") < F.col("ub"))
        .groupBy(F.col("ua").alias("p1"), F.col("ub").alias("p2"))
        .agg(F.count(F.lit(1)).cast("long").alias("s"))
    )


def q_graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KTRUSS_K}-truss of the part co-purchase graph: iteratively peel
    every edge supported by fewer than {KTRUSS_K} − 2 = {KTRUSS_K - 2}
    triangles until (near-)fixpoint — the standard COHESIVE-SUBGRAPH
    mining rung ABOVE ``graph_kcore`` (degree peeling): trussness
    constrains each EDGE's triangle embedding, so k-trusses are the
    dense, community-core regions k-cores over-approximate. Reports the
    surviving edge count and the top {KTRUSS_TOP} edges by final
    support.

    Fixed-round contract: BOTH engines run exactly {KTRUSS_ROUNDS}
    peeling rounds (the ``graph_shortest_paths`` convention —
    termination semantics cannot diverge; the support-floored graph
    peels to fixpoint well within them at tested scales, and a
    non-converged prefix is still a valid peeling state on both sides).
    Per round: undirected view → wedge self-join on the shared
    neighbour → per-edge common-neighbour count → filter; the edge set
    is localCheckpointed each round (the ``graph_hits`` lineage
    discipline — without it the {KTRUSS_ROUNDS}-round plan re-executes
    the wedge join tree {KTRUSS_ROUNDS}× deep).

    Scale: every round's wedge join runs on the SUPPORT-FLOORED sparse
    edge set (~3.6k edges at sf0.1, near-constant in SF — the
    ``graph_triangles`` domain argument), and peeling only shrinks it.
    All counts integer-exact.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    e = _copurchase_edges(spark, sf_dir)
    for _ in range(KTRUSS_ROUNDS):
        sup = _truss_support(e)
        e = (
            e.join(sup, ["p1", "p2"])
            .filter(F.col("s") >= KTRUSS_K - 2)
            .select("p1", "p2")
            .localCheckpoint(eager=True)
        )
    final_sup = _truss_support(e)
    survivors = e.join(final_sup, ["p1", "p2"])
    tot = survivors.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        survivors.crossJoin(F.broadcast(tot))
        .select("p1", "p2", F.col("s").alias("support"), "n_edges")
        .orderBy(F.desc("support"), F.asc("p1"), F.asc("p2"))
        .limit(KTRUSS_TOP)
    )


def _sql_ktruss() -> str:
    rounds = ",".join(_truss_round_sql(i) for i in range(KTRUSS_ROUNDS))
    n = KTRUSS_ROUNDS
    return f"""
WITH {_SQL_CAPPED_EDGES},{rounds},
undF AS MATERIALIZED (
  SELECT p1 AS u, p2 AS v FROM e{n}
  UNION ALL
  SELECT p2 AS u, p1 AS v FROM e{n}
),
cnF AS MATERIALIZED (
  SELECT a.u AS p1, b.u AS p2, CAST(COUNT(*) AS BIGINT) AS s
  FROM undF a JOIN undF b ON a.v = b.v AND a.u < b.u
  GROUP BY 1, 2
),
surv AS (
  SELECT e.p1, e.p2, c.s
  FROM e{n} e JOIN cnF c ON c.p1 = e.p1 AND c.p2 = e.p2
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM surv)
SELECT p1, p2, s AS support, n_edges
FROM surv CROSS JOIN tot
ORDER BY support DESC, p1 ASC, p2 ASC
LIMIT {KTRUSS_TOP}
"""


# ---------------------------------------------------------------------------
# Local bridges (round 12)
# ---------------------------------------------------------------------------

LOCAL_BRIDGE_TOP = 20


def q_graph_local_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL BRIDGES of the part co-purchase graph: edges whose endpoints
    share NO common neighbour — deleting one raises its endpoints'
    distance above 2 (Granovetter's weak-tie/structural-hole edges:
    triangle-embedded ties are redundant; local bridges are where
    information/substitution actually crosses communities). The exact
    structural complement of ``graph_ktruss`` (maximal triangle
    embedding) on the same graph. Reports the bridge count and the
    first {LOCAL_BRIDGE_TOP} bridge edges.

    Plan: ONE wedge self-join enumerates every pair with ≥1 common
    neighbour; a LEFT ANTI join drops those from the edge list — edges
    that survive have zero triangles through them. Integer-exact set
    logic, no floats anywhere. Scale: wedge join on the support-floored
    sparse edge set (the ``graph_triangles`` domain argument); the anti
    join is edge-domain-sized.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    e = _copurchase_edges(spark, sf_dir)
    cn_pairs = _truss_support(e).select("p1", "p2")
    bridges = e.join(cn_pairs, ["p1", "p2"], "left_anti")
    tot = bridges.agg(F.count(F.lit(1)).cast("long").alias("n_bridges"))
    return (
        bridges.crossJoin(F.broadcast(tot))
        .select("p1", "p2", "n_bridges")
        .orderBy(F.asc("p1"), F.asc("p2"))
        .limit(LOCAL_BRIDGE_TOP)
    )


_ORACLE_LOCAL_BRIDGES = f"""
WITH {_SQL_CAPPED_EDGES},
und AS MATERIALIZED (
  SELECT p1 AS u, p2 AS v FROM e0
  UNION ALL
  SELECT p2 AS u, p1 AS v FROM e0
),
cn AS MATERIALIZED (
  SELECT DISTINCT a.u AS p1, b.u AS p2
  FROM und a JOIN und b ON a.v = b.v AND a.u < b.u
),
bridges AS (
  SELECT e.p1, e.p2
  FROM e0 e LEFT JOIN cn c ON c.p1 = e.p1 AND c.p2 = e.p2
  WHERE c.p1 IS NULL
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bridges FROM bridges)
SELECT p1, p2, n_bridges
FROM bridges CROSS JOIN tot
ORDER BY p1 ASC, p2 ASC
LIMIT {LOCAL_BRIDGE_TOP}
"""


# ---------------------------------------------------------------------------
# Radius-2 harmonic centrality (round 13)
# ---------------------------------------------------------------------------

HARMONIC_TOP = 20


def q_graph_harmonic_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RADIUS-2 HARMONIC CENTRALITY on the part co-purchase graph:
    H₂(v) = |N₁(v)|/1 + |N₂(v)|/2 — the bounded-radius truncation of
    harmonic centrality (Boldi & Vigna 2014, the centrality
    ``graph_hyperball`` estimates probabilistically at full radius;
    this entry is its EXACT small-radius companion, and the top-20
    table is the 'most substitutable / best-connected parts' ranking).
    Exact distance classes: N₁ = direct neighbours, N₂ = nodes at
    distance exactly 2 (wedge-reachable minus direct minus self).

    Exactness: pure integer set algebra — degree count, one wedge
    self-join for distinct 2-paths, a LEFT ANTI against the edge list
    for the exactly-2 class; the score is carried as the INTEGER
    2·H₂ = 2|N₁| + |N₂| (ranking never touches a float; ties break on
    part id asc) and ships as one final /2. Top-k via orderBy+limit
    (TakeOrderedAndProject — per-partition heaps, no global sort).

    Scale: the wedge join on the support-floored, order-capped sparse
    edge set — the same bounded-wedge argument as ``graph_ktruss`` /
    ``graph_local_bridges`` on the same graph.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    e = _copurchase_edges(spark, sf_dir)
    und = e.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionAll(
        e.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    )
    d1 = und.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("n1"))
    a = und.select(F.col("u").alias("src"), F.col("v").alias("mid"))
    b = und.select(F.col("u").alias("mid2"), F.col("v").alias("dst"))
    two = (
        a.join(b, a["mid"] == b["mid2"])
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .join(
            und.select(F.col("u").alias("src"), F.col("v").alias("dst")),
            ["src", "dst"],
            "left_anti",
        )
    )
    d2 = two.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("n2"))
    scored = (
        d1.join(d2, d1["u"] == d2["src"], "left")
        .select(
            F.col("u").alias("part"),
            "n1",
            F.coalesce(F.col("n2"), F.lit(0)).cast("long").alias("n2"),
        )
        .withColumn("h2x2", (F.lit(2) * F.col("n1") + F.col("n2")).cast("long"))
    )
    return (
        scored.select(
            "part",
            F.col("n1").alias("n_dist1"),
            F.col("n2").alias("n_dist2"),
            (F.col("h2x2").cast("double") / F.lit(2.0)).alias("harmonic_r2"),
            "h2x2",
        )
        .orderBy(F.desc("h2x2"), F.asc("part"))
        .limit(HARMONIC_TOP)
        .drop("h2x2")
    )


_ORACLE_HARMONIC = f"""
WITH {_SQL_CAPPED_EDGES},
und AS MATERIALIZED (
  SELECT p1 AS u, p2 AS v FROM e0
  UNION ALL
  SELECT p2 AS u, p1 AS v FROM e0
),
d1 AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS n1 FROM und GROUP BY 1
),
two AS (
  SELECT DISTINCT a.u AS src, b.v AS dst
  FROM und a JOIN und b ON a.v = b.u
  WHERE a.u <> b.v
),
exact2 AS (
  SELECT t.src, t.dst
  FROM two t LEFT JOIN und e ON e.u = t.src AND e.v = t.dst
  WHERE e.u IS NULL
),
d2 AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS n2 FROM exact2 GROUP BY 1
),
scored AS (
  SELECT d1.u AS part, d1.n1, CAST(COALESCE(d2.n2, 0) AS BIGINT) AS n2,
         CAST(2 * d1.n1 + COALESCE(d2.n2, 0) AS BIGINT) AS h2x2
  FROM d1 LEFT JOIN d2 ON d2.src = d1.u
)
SELECT part, n1 AS n_dist1, n2 AS n_dist2,
       CAST(h2x2 AS DOUBLE) / 2.0 AS harmonic_r2
FROM scored
ORDER BY h2x2 DESC, part ASC
LIMIT {HARMONIC_TOP}
"""


# ---------------------------------------------------------------------------
# Per-user dyad reciprocity on the journey transition graph (round 13)
# ---------------------------------------------------------------------------

RECIP_MIN_DYADS = 2  # users with a single dyad carry no reciprocity signal


def q_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYAD RECIPROCITY (Wasserman–Faust dyad census, mutual/adjacent) of
    each user's first-order journey transition graph, reported as a
    decile distribution: per user, the directed edges are the distinct
    consecutive event-type pairs of ``events_transitions``; an adjacent
    dyad is an unordered type pair with ≥1 direction present, a MUTUAL
    dyad has both (the A→B→A ping-pong signature — high per-user
    reciprocity is a classic bot/scripted-session screen beside
    ``user_bot_screen``, while organic journeys are mostly one-way
    funnels). Users with fewer than RECIP_MIN_DYADS (2) dyads are
    excluded (no signal in a single pair).

    Exactness: dyads are exact distinct-count algebra — per (user,
    unordered pair) the two direction flags are MAX'd, mutual = both
    present; the decile bucket is the INTEGER cross-multiplication
    least(9, (10·mutual) div dyads) (Spark ``div`` / DuckDB ``//`` on
    BIGINT — no float in the bucketing); the pooled per-bucket
    reciprocity is ONE division of two exact BIGINT sums. Self-loops
    (A→A) are excluded — a dyad is a pair of DISTINCT types.

    Scale shape: one (user, ts)-keyed lag window (the transitions
    shuffle), one (user, pair) hash agg, one user-level hash agg, then
    a ≤10-row bucket agg — every stage map-side combinable after the
    lag.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            F.lag("event_type").over(w).alias("a"),
            F.col("event_type").alias("b"),
        )
        .filter(F.col("a").isNotNull() & (F.col("a") != F.col("b")))
        .select(
            "user_id",
            F.least("a", "b").alias("lo"),
            F.greatest("a", "b").alias("hi"),
            (F.col("a") < F.col("b")).cast("int").alias("fwd"),
        )
    )
    dyads = pairs.groupBy("user_id", "lo", "hi").agg(
        F.max("fwd").alias("has_f"),
        F.max(F.lit(1) - F.col("fwd")).alias("has_b"),
    )
    per_user = dyads.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dyads"),
        F.sum(F.col("has_f") * F.col("has_b")).cast("long").alias("n_mutual"),
    )
    bucketed = per_user.filter(F.col("n_dyads") >= RECIP_MIN_DYADS).select(
        F.least(F.lit(9), F.expr("(10 * n_mutual) div n_dyads"))
        .cast("int")
        .alias("recip_decile"),
        "n_dyads",
        "n_mutual",
    )
    return (
        bucketed.groupBy("recip_decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("n_dyads").cast("long").alias("total_dyads"),
            F.sum("n_mutual").cast("long").alias("total_mutual"),
            (
                F.sum("n_mutual").cast("double")
                / F.sum("n_dyads").cast("double")
            ).alias("pooled_reciprocity"),
        )
        .orderBy("recip_decile")
    )


_ORACLE_RECIPROCITY = f"""
WITH seq AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS a,
         event_type AS b
  FROM events
), pairs AS (
  SELECT user_id, LEAST(a, b) AS lo, GREATEST(a, b) AS hi,
         CASE WHEN a < b THEN 1 ELSE 0 END AS fwd
  FROM seq WHERE a IS NOT NULL AND a <> b
), dyads AS (
  SELECT user_id, lo, hi, MAX(fwd) AS has_f, MAX(1 - fwd) AS has_b
  FROM pairs GROUP BY 1, 2, 3
), per_user AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_dyads,
         CAST(SUM(has_f * has_b) AS BIGINT) AS n_mutual
  FROM dyads GROUP BY 1
)
SELECT CAST(LEAST(9, (10 * n_mutual) // n_dyads) AS INT) AS recip_decile,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n_dyads) AS BIGINT) AS total_dyads,
       CAST(SUM(n_mutual) AS BIGINT) AS total_mutual,
       CAST(SUM(n_mutual) AS DOUBLE) / CAST(SUM(n_dyads) AS DOUBLE)
         AS pooled_reciprocity
FROM per_user
WHERE n_dyads >= {RECIP_MIN_DYADS}
GROUP BY 1
ORDER BY recip_decile
"""


# ---------------------------------------------------------------------------
# Modularity of the LPA partition (round 14)
# ---------------------------------------------------------------------------


def q_graph_modularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman-Girvan modularity Q of the ``graph_communities`` label-
    propagation partition on the support-floored customer-supplier
    graph: Q = Σ_c [e_c/m − (d_c/2m)²] — the fraction of edges inside
    communities minus what a degree-preserving random rewiring would
    put there. LPA reports WHAT the communities are; Q is the missing
    "are they real" score (Q ≈ 0 → the partition is no better than
    chance; > ~0.3 → substantive structure), and the regression guard
    for any change to the LPA support floor or iteration count.

    Exactness: the partition replays the exact ``graph_communities``
    machinery ({it} unrolled semi-synchronous rounds, deterministic
    mode tie-breaks); m, the intra-community edge count, and every d_c
    are exact integers (each undirected edge counted once from its
    customer side); Σd_c² is an exact DECIMAL(38,0) sum, limb-
    converted, so Q is TWO IEEE terms. Degenerate contract: an empty
    floored edge set → all NULL via the m > 0 guard.

    Scale shape: the LPA joins dominate (the ``graph_communities``
    economics); the modularity tail is two label joins on the edge
    list plus community-sized aggs.

    Reference analog: none (engine addition, SURVEY.md §2.7)."""
    edges = _edges_int_floored(spark, sf_dir).localCheckpoint(eager=True)
    edges_cs = edges.filter(F.col("src") % 2 == 0)
    edges_sc = edges.filter(F.col("src") % 2 == 1)
    labels_c = (
        edges_cs.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    labels_s = (
        edges_sc.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(LPA_ITERS):
        labels_c = _lpa_mode_step(edges_cs, labels_s).localCheckpoint(eager=True)
        labels_s = _lpa_mode_step(edges_sc, labels_c).localCheckpoint(eager=True)
    labels = labels_c.unionByName(labels_s)
    pairs = edges_cs.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    lu = labels.select(F.col("node").alias("u"), F.col("label").alias("lu"))
    lv = labels.select(F.col("node").alias("v"), F.col("label").alias("lv"))
    tagged = pairs.join(lu, "u").join(lv, "v")
    m_intra = tagged.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.when(F.col("lu") == F.col("lv"), 1).otherwise(0))
        .cast("long")
        .alias("intra"),
    )
    ends = pairs.select(F.col("u").alias("node")).unionAll(
        pairs.select(F.col("v").alias("node"))
    )
    deg = (
        ends.join(labels, "node")
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("d_c"))
    )
    dsq = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.sum((F.col("d_c") * F.col("d_c")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("d2"),
    )
    nn = labels.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    red = m_intra.crossJoin(F.broadcast(dsq)).crossJoin(F.broadcast(nn))
    md = F.col("m").cast("double")
    q_mod = F.col("intra").cast("double") / md - dec_to_double(F.col("d2")) / (
        F.lit(4.0) * md * md
    )
    ok = F.col("m") > 0
    return red.select(
        "n_nodes",
        F.col("m").alias("n_edges"),
        "n_communities",
        F.col("intra").alias("intra_edges"),
        F.when(ok, q_mod).alias("modularity_q"),
    )


q_graph_modularity_score.__doc__ = q_graph_modularity_score.__doc__ and (
    q_graph_modularity_score.__doc__.format(it=LPA_ITERS)
)


def _sql_graph_modularity() -> str:
    base = f"""
weights AS (
  SELECT CAST(o_custkey AS BIGINT) * 2 AS cnode,
         CAST(l_suppkey AS BIGINT) * 2 + 1 AS snode,
         COUNT(DISTINCT l_orderkey) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
mw AS (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) AS mean_w FROM weights),
pairs AS (
  SELECT cnode, snode FROM weights, mw WHERE w >= {LPA_SUPPORT_X} * mean_w
),
edges AS (
  SELECT cnode AS src, snode AS dst FROM pairs
  UNION ALL
  SELECT snode AS src, cnode AS dst FROM pairs
),
ecs AS (SELECT src, dst FROM edges WHERE src % 2 = 0),
esc AS (SELECT src, dst FROM edges WHERE src % 2 = 1),
c0 AS (SELECT DISTINCT src AS node, src AS label FROM ecs),
s0 AS (SELECT DISTINCT src AS node, src AS label FROM esc)"""

    def step(out: str, edge_side: str, prev: str) -> str:
        return f"""
{out} AS (
  SELECT src AS node, label FROM (
    SELECT e.src, l.label, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (PARTITION BY e.src
                              ORDER BY COUNT(*) DESC, l.label ASC) AS rk
    FROM {edge_side} e JOIN {prev} l ON e.dst = l.node
    GROUP BY e.src, l.label
  ) WHERE rk = 1
)"""

    rounds = []
    pc, ps = "c0", "s0"
    for i in range(1, LPA_ITERS + 1):
        rounds.append(step(f"c{i}", "ecs", ps))
        pc = f"c{i}"
        rounds.append(step(f"s{i}", "esc", pc))
        ps = f"s{i}"
    return (
        "WITH "
        + base
        + ","
        + ",".join(rounds)
        + f""",
labels AS (SELECT * FROM {pc} UNION ALL SELECT * FROM {ps}),
tagged AS (
  SELECT p.cnode AS u, p.snode AS v, a.label AS lu, b.label AS lv
  FROM pairs p
  JOIN labels a ON a.node = p.cnode
  JOIN labels b ON b.node = p.snode
), m_intra AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(CASE WHEN lu = lv THEN 1 ELSE 0 END) AS BIGINT) AS intra
  FROM tagged
), deg AS (
  SELECT l.label, CAST(COUNT(*) AS BIGINT) AS d_c
  FROM (SELECT cnode AS node FROM pairs
        UNION ALL SELECT snode AS node FROM pairs) e
  JOIN labels l ON l.node = e.node
  GROUP BY 1
), dsq AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
         CAST(SUM(CAST(d_c * d_c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS d2
  FROM deg
), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM labels)
SELECT n_nodes, m AS n_edges, n_communities, intra AS intra_edges,
       CASE WHEN m > 0
            THEN CAST(intra AS DOUBLE) / CAST(m AS DOUBLE)
                 - {sql_dec_to_double("d2")}
                   / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)) END AS modularity_q
FROM m_intra CROSS JOIN dsq CROSS JOIN nn
"""
    )


QUERIES = {
    "graph_modularity_score": q_graph_modularity_score,
    "graph_harmonic_radius": q_graph_harmonic_radius,
    "graph_reciprocity": q_graph_reciprocity,
    "graph_ktruss": q_graph_ktruss,
    "graph_local_bridges": q_graph_local_bridges,
    "graph_salsa": q_graph_salsa,
    "graph_communities": q_graph_communities,
    "graph_supplier_similarity": q_graph_supplier_similarity,
    "graph_pagerank": q_graph_pagerank,
    "graph_degree_dist": q_graph_degree_dist,
    "graph_triangles": q_graph_triangles,
    "graph_clustering_coeff": q_graph_clustering_coeff,
    "graph_khop": q_graph_khop,
    "recursive_cte_walks": q_recursive_cte_walks,
    "basket_rules": q_basket_rules,
    "graph_shortest_paths": q_graph_shortest_paths,
    "graph_link_prediction": q_graph_link_prediction,
    "graph_assortativity": q_graph_assortativity,
    "graph_kcore": q_graph_kcore,
    "graph_avg_neighbor_degree": q_graph_avg_neighbor_degree,
    "graph_rich_club": q_graph_rich_club,
    "graph_hits": q_graph_hits,
    "graph_ppr_seeded": q_graph_ppr_seeded,
    "graph_resource_allocation": q_graph_resource_allocation,
    "graph_adamic_adar": q_graph_adamic_adar,
    "graph_katz_centrality": q_graph_katz_centrality,
    "graph_hyperball": q_graph_hyperball,
}

ORACLE = {
    "graph_modularity_score": _sql_graph_modularity(),
    "graph_harmonic_radius": _ORACLE_HARMONIC,
    "graph_reciprocity": _ORACLE_RECIPROCITY,
    "graph_ktruss": _sql_ktruss(),
    "graph_local_bridges": _ORACLE_LOCAL_BRIDGES,
    "graph_salsa": _sql_salsa(),
    "graph_communities": _sql_graph_communities(),
    "graph_supplier_similarity": _ORACLE_SUPPLIER_SIMILARITY,
    "graph_pagerank": _sql_pagerank(),
    "graph_degree_dist": _ORACLE_DEGREE_DIST,
    "graph_triangles": _ORACLE_TRIANGLES,
    "graph_clustering_coeff": _ORACLE_CLUSTERING,
    "graph_khop": _sql_khop(),
    "recursive_cte_walks": _sql_recursive_walks(),
    "basket_rules": _sql_basket_rules(),
    "graph_shortest_paths": _sql_shortest_paths(),
    "graph_link_prediction": _sql_link_prediction(),
    "graph_assortativity": _ORACLE_ASSORTATIVITY,
    "graph_kcore": _sql_kcore(),
    "graph_avg_neighbor_degree": _ORACLE_KNN_CURVE,
    "graph_rich_club": _sql_rich_club(),
    "graph_hits": _sql_hits(),
    "graph_ppr_seeded": _sql_ppr(),
    "graph_resource_allocation": _ORACLE_RESOURCE_ALLOCATION,
    "graph_adamic_adar": _ORACLE_ADAMIC_ADAR,
    "graph_katz_centrality": _sql_katz(),
    "graph_hyperball": _sql_hyperball(),
}
