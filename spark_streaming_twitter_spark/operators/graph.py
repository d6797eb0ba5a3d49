"""Graph operators: fixed-iteration PageRank over the near-duplicate
candidate graph.

Iterative-algorithm breadth beyond ``dedup_group_ids``' connected
components: PageRank centrality over the UNDIRECTED graph whose edges are
the MinHash-LSH candidate pairs. The use case is real in a dedup pipeline —
within a duplicate cluster, the highest-centrality document is the natural
canonical representative (most corroborated by other near-dups).

Determinism contract: ranks are scaled BIGINT (1e12 = rank 1.0) and every
step is exact integer arithmetic — contributions are ``rank DIV degree``
(all values positive, so truncation == floor on both engines), damping is
``15/100 * SCALE + (85 * contrib_sum) DIV 100``. The DuckDB oracle unrolls
the same K iterations as CTEs; results match bitwise with no float drift.

Scale shape (100 TB): each iteration is one join keyed on node id + one
aggregation keyed on destination — the canonical distributed PageRank plan.
Edges are materialized once (localCheckpoint; write to parquet at cluster
scale) so the LSH subtree runs once, not once per iteration; K is fixed and
small, so the plan is K unrolled join+agg stages, each shuffle-keyed on
high-cardinality node ids. The undirected (symmetric) edge set guarantees
no dangling nodes, so no dangling-mass redistribution term is needed.
Integer headroom: ranks <= N * 1e12, x85 must stay under 2^63 — at larger N
drop the per-node scale accordingly (documented trade: rank resolution vs
node count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_twitter_spark.dedup.dedup import (
    _MINHASH_BUCKETS_SQL,
    dedup_minhash_lsh_pairs,
)
from spark_streaming_twitter_spark.registry import query

SCALE = 1_000_000_000_000  # rank 1.0 as scaled BIGINT
BASE = 15 * SCALE // 100  # (1 - d) with damping d = 0.85, exact
K_ITERS = 3


def pagerank(edges: DataFrame, k: int = K_ITERS) -> DataFrame:
    """K exact-integer PageRank iterations over a symmetric edge set.

    ``edges`` must be directed-both-ways (undirected) so every node has an
    in-edge and an out-edge — no dangling mass. Returns (id, rank_scaled).
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = deg.select(F.col("src").alias("id"), F.lit(SCALE).cast("bigint").alias("r"))
    for _ in range(k):
        contribs = (
            edges.join(ranks, edges.src == ranks.id)
            .join(deg, "src")
            .select(F.col("dst").alias("id"), F.expr("r DIV deg").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        # Symmetric edges => every node receives >= 1 contribution, so the
        # inner shape loses nobody.
        ranks = contribs.select(
            "id", (F.lit(BASE) + F.expr("(85 * c) DIV 100")).alias("r")
        )
    return ranks


def _iter_ctes(k: int) -> str:
    ctes = [
        f"r0 AS (SELECT src AS id, CAST({SCALE} AS BIGINT) AS r FROM deg)"
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"""c{i} AS (
  SELECT e.dst AS id, sum(r.r // d.deg) AS c
  FROM edges e JOIN r{i - 1} r ON e.src = r.id JOIN deg d ON e.src = d.src
  GROUP BY 1
),
r{i} AS (SELECT id, CAST({BASE} + (85 * c) // 100 AS BIGINT) AS r FROM c{i})"""
        )
    return ",\n".join(ctes)


@query(
    "dedup_graph_pagerank",
    oracle=f"""
WITH {_MINHASH_BUCKETS_SQL},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
{_iter_ctes(K_ITERS)}
SELECT id AS doc_id, r AS rank_scaled FROM r{K_ITERS}
""",
    doc=f"Fixed-{K_ITERS}-iteration PageRank (damping 0.85, exact scaled-"
    "BIGINT arithmetic) over the undirected LSH candidate-pair graph: the "
    "centrality ranking that picks a canonical doc per duplicate cluster. "
    "Each iteration = join on node id + agg on destination; edges "
    "localCheckpointed once so the LSH subtree is not re-run per "
    "iteration. Oracle = the same K iterations unrolled as CTEs; floor "
    "division on positive integers matches DIV bitwise.",
)
def dedup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint()
    )
    return pagerank(edges).select(
        F.col("id").alias("doc_id"), F.col("r").alias("rank_scaled")
    )


@query(
    "copurchase_triangle_stats",
    oracle="""
WITH inc AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
edges AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
),
verts AS (
  SELECT count(DISTINCT x) AS n_vertices
  FROM (SELECT u AS x FROM edges UNION ALL SELECT v FROM edges)
),
wedges AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1 JOIN edges e2 ON e1.v = e2.u
),
tris AS (
  SELECT count(*) AS n_triangles
  FROM wedges w JOIN edges e ON w.a = e.u AND w.c = e.v
)
SELECT (SELECT n_vertices FROM verts) AS n_vertices,
       (SELECT count(*) FROM edges) AS n_edges,
       (SELECT count(*) FROM wedges) AS n_wedges,
       (SELECT n_triangles FROM tris) AS n_triangles
""",
    doc="Triangle counting over the co-purchase graph (parts sharing an "
    "order): the canonical two-join triangle enumeration with id-ordered "
    "edges (u < v), so every triangle (a<b<c) is generated exactly once "
    "as wedge (a-b-c) closed by edge (a,c) — no post-hoc division by 6. "
    "Plan: dedup the order-part incidence, build distinct ordered edges "
    "via a self-join on the order key, then wedge join (edges x edges on "
    "the middle vertex) + closing semi-join, all equi-joins shuffle-keyed "
    "on vertex ids. Scale notes: wedge count is sum-of-squared-degrees — "
    "the production optimization is degree-ordering the edge orientation "
    "(each edge points low->high degree), which bounds per-vertex wedge "
    "fan-out by sqrt(m) for a total O(m^1.5); the id-ordered variant "
    "here keeps the oracle exactly replayable and documents the swap. "
    "The closing join is the hot stage; AQE handles skewed hub parts.",
)
def copurchase_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_twitter_spark.catalog import table

    inc = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    b = inc.select(F.col("o"), F.col("p").alias("q"))
    edges = (
        inc.join(b, "o")
        .where(F.col("p") < F.col("q"))
        .select(F.col("p").alias("u"), F.col("q").alias("v"))
        .distinct()
        # materialized once: three downstream consumers (vertex count,
        # wedge join twice, closing join) — same rationale as pagerank's
        # edge checkpoint; at cluster scale this is a parquet write
        .localCheckpoint()
    )
    n_vertices = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .agg(F.count_distinct("x").alias("n_vertices"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = edges.join(
        e2, edges.v == e2.b
    ).select(F.col("u").alias("a"), F.col("v").alias("b"), "c")
    n_wedges = wedges.agg(F.count(F.lit(1)).alias("n_wedges"))
    closing = edges.select(
        F.col("u").alias("a"), F.col("v").alias("c")
    )
    n_tris = wedges.join(closing, ["a", "c"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    return (
        n_vertices.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(n_wedges))
        .crossJoin(F.broadcast(n_tris))
    )


@query(
    "copurchase_node_clustering",
    oracle="""
WITH inc AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
edges AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
),
degrees AS (
  SELECT x AS part, count(*) AS deg
  FROM (SELECT u AS x FROM edges UNION ALL SELECT v FROM edges)
  GROUP BY 1
),
tris AS (
  SELECT w.a, w.b, w.c
  FROM (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM edges e1 JOIN edges e2 ON e1.v = e2.u) w
  JOIN edges e ON w.a = e.u AND w.c = e.v
),
tri_counts AS (
  SELECT x AS part, count(*) AS n_tri
  FROM (SELECT a AS x FROM tris UNION ALL
        SELECT b FROM tris UNION ALL
        SELECT c FROM tris)
  GROUP BY 1
)
SELECT d.part, CAST(d.deg AS BIGINT) AS deg,
       CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_triangles,
       CAST(2 * coalesce(t.n_tri, 0) * 1000000
            // (d.deg * (d.deg - 1)) AS BIGINT) AS clustering_scaled
FROM degrees d LEFT JOIN tri_counts t ON t.part = d.part
WHERE d.deg >= 2
""",
    doc="Per-node clustering coefficient on the co-purchase graph — the "
    "local-density feature (2*tri(v) / deg(v)(deg(v)-1)) that separates "
    "parts embedded in tight co-purchase cliques from hub parts bridging "
    "unrelated orders, in exact scaled BIGINT. Reuses the id-ordered "
    "two-join triangle enumeration (copurchase_triangle_stats): each "
    "enumerated triangle credits all three vertices via a 3-way "
    "union-explode, then joins the degree table. Same scale notes as "
    "the global count (wedge stage is sum-of-squared-degrees; "
    "degree-ordering is the production orientation); the per-node "
    "aggregation adds one groupBy over 3x the triangle rows.",
)
def copurchase_node_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_twitter_spark.catalog import table

    inc = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    b = inc.select(F.col("o"), F.col("p").alias("q"))
    edges = (
        inc.join(b, "o")
        .where(F.col("p") < F.col("q"))
        .select(F.col("p").alias("u"), F.col("q").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    degrees = (
        edges.select(F.col("u").alias("part"))
        .unionAll(edges.select(F.col("v").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = edges.join(e2, edges.v == e2.b).select(
        F.col("u").alias("a"), F.col("v").alias("b"), "c"
    )
    closing = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tris = wedges.join(closing, ["a", "c"])
    tri_counts = (
        tris.select(F.col("a").alias("part"))
        .unionAll(tris.select(F.col("b").alias("part")))
        .unionAll(tris.select(F.col("c").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return (
        degrees.where(F.col("deg") >= 2)
        .join(tri_counts, "part", "left")
        .withColumn("n_tri", F.coalesce(F.col("n_tri"), F.lit(0)))
        .select(
            "part",
            F.col("deg").cast("bigint").alias("deg"),
            F.col("n_tri").cast("bigint").alias("n_triangles"),
            F.expr("2 * n_tri * 1000000 DIV (deg * (deg - 1))")
            .cast("bigint")
            .alias("clustering_scaled"),
        )
    )


@query(
    "copurchase_khop_features",
    oracle="""
WITH inc AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
und AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM inc a JOIN inc b ON a.o = b.o AND a.p <> b.p
),
feat AS (
  SELECT p_partkey AS id,
         CAST(round(p_retailprice * 100) AS BIGINT) AS cents
  FROM part
),
h1 AS (
  SELECT e.u AS id, count(*) AS n_1hop, sum(f.cents) AS s1
  FROM und e JOIN feat f ON e.v = f.id GROUP BY e.u
),
two AS (
  SELECT DISTINCT e1.u AS id, e2.v AS w
  FROM und e1 JOIN und e2 ON e1.v = e2.u
  WHERE e2.v <> e1.u
),
two_excl AS (
  SELECT t.id, t.w
  FROM two t LEFT JOIN und d ON t.id = d.u AND t.w = d.v
  WHERE d.u IS NULL
),
h2 AS (
  SELECT t.id, count(*) AS n_2hop, sum(f.cents) AS s2
  FROM two_excl t JOIN feat f ON t.w = f.id GROUP BY t.id
)
SELECT h1.id AS part_id,
       CAST(h1.n_1hop AS BIGINT) AS n_1hop,
       CAST(h1.s1 AS BIGINT) AS sum_price_1hop_cents,
       CAST(coalesce(h2.n_2hop, 0) AS BIGINT) AS n_2hop,
       CAST(coalesce(h2.s2, 0) AS BIGINT) AS sum_price_2hop_cents
FROM h1 LEFT JOIN h2 ON h1.id = h2.id
ORDER BY coalesce(h2.n_2hop, 0) DESC, part_id ASC
LIMIT 25
""",
    doc="K-hop neighborhood feature aggregation — the message-passing "
    "primitive a GNN data pipeline materializes offline (GraphSAGE-style "
    "neighbor features without the model): per part, the DISTINCT "
    "exact-distance-1 and exact-distance-2 co-purchase neighborhoods "
    "and their exact price-cents feature sums. Hop 1 is one join keyed "
    "on vertex id against the broadcast feature dim; hop 2 is the wedge "
    "join (same plan as triangle counting) deduped, minus self, minus "
    "direct neighbors via LEFT ANTI against the edge set — so 'distance "
    "2' is exact, not 'reachable in 2'. Features integer-scaled "
    "(cents), top-25 page via TakeOrdered. Scale: wedge volume is "
    "sum-of-squared-degrees — the same degree-orientation bound as "
    "triangles applies, and production GNN samplers cap per-node "
    "fan-out (uniform neighbor sampling) with the identical plan; hub "
    "skew lands in the wedge join where AQE's skew splitter engages.",
)
def copurchase_khop_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_twitter_spark.catalog import table

    inc = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    b = inc.select(F.col("o"), F.col("p").alias("q"))
    und = (
        inc.join(b, "o")
        .where(F.col("p") != F.col("q"))
        .select(F.col("p").alias("u"), F.col("q").alias("v"))
        .distinct()
        .localCheckpoint()  # three consumers: h1, wedge join, anti join
    )
    feat = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"),
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
    )
    h1 = (
        und.join(F.broadcast(feat), und.v == feat.id)
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("n_1hop"), F.sum("cents").alias("s1"))
        .select(F.col("u").alias("id"), "n_1hop", "s1")
    )
    e2 = und.select(F.col("u").alias("m"), F.col("v").alias("w"))
    two = (
        und.join(e2, und.v == F.col("m"))
        .where(F.col("w") != F.col("u"))
        .select(F.col("u").alias("id"), "w")
        .distinct()
    )
    direct = und.select(F.col("u").alias("id"), F.col("v").alias("w"))
    two_excl = two.join(direct, ["id", "w"], "left_anti")
    h2 = (
        two_excl.join(F.broadcast(feat), two_excl.w == feat.id)
        .groupBy(two_excl.id)
        .agg(F.count(F.lit(1)).alias("n_2hop"), F.sum("cents").alias("s2"))
    )
    out = (
        h1.join(h2, "id", "left")
        .select(
            F.col("id").alias("part_id"),
            F.col("n_1hop").cast("bigint").alias("n_1hop"),
            F.col("s1").cast("bigint").alias("sum_price_1hop_cents"),
            F.coalesce("n_2hop", F.lit(0)).cast("bigint").alias("n_2hop"),
            F.coalesce("s2", F.lit(0)).cast("bigint").alias(
                "sum_price_2hop_cents"
            ),
        )
    )
    return out.orderBy(F.col("n_2hop").desc(), F.col("part_id").asc()).limit(25)
