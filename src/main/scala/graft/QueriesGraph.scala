package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructType}
import graft.etl.{Lineage, LogParse, MozLog}
import graft.jx.{Formats, QueryParser, Runner}
import graft.llm.{Contamination, Dedup, Multimodal, Pipelines, Similarity, TextAnalysis}
import graft.meta.MetaColumns
import graft.operators.{CountMin, Joins, Kmv, Sessionize, SetOps}
import graft.streaming.EventStream
import graft.tables.Catalog

/** Query + oracle definitions — graph analytics: PageRank family, triangles, BFS, communities, k-core.
  * Concatenated into SparkEntry.queries / SparkEntry.oracleSql (the
  * driver contract); see SparkEntry's scaladoc for the output and
  * floating-point conventions every entry follows. */
private[graft] object QueriesGraph {
  import QueryShared._

  /** The two co-occurrence edge lists the graph family shares,
    * STAGED cross-query (round 11 — the q342/q347 pattern applied to
    * the graph cohort): six queries build the identical 1-in-4
    * sampled part graph (q141/q147/q184/q205/q219/q256) and three
    * the full repeat-co-purchase graph (q206/q221/q333); the
    * self-join that mines each runs once per (dir, shape), every
    * later consumer reads the parquet. At 100 TB this is simply the
    * materialized edge table every graph workload starts from. */
  private def sampledEdgesWeighted(spark: SparkSession,
                                   dir: String): DataFrame =
    graft.operators.Staged.getOrBuild(spark,
      s"coocc_edges::$dir::pmod4_weighted") {
      graft.operators.Graph.coOccurrenceEdgesWeighted(
        tbl(spark, dir, "lineitem")
          .filter(pmod(col("l_partkey"), lit(4)) === 0),
        col("l_orderkey"), col("l_partkey"))
    }

  /** The unweighted 1-in-4 edge set is the weighted one's key set
    * (distinct (src,dst) ≡ the groupBy keys of the weighted mine),
    * so BOTH shapes serve from ONE staged self-join: q146 reads the
    * weights, the six unweighted consumers project them away (the
    * column never leaves the parquet scan). Previously the two
    * near-identical mines were staged separately. */
  private def sampledEdges(spark: SparkSession, dir: String): DataFrame =
    sampledEdgesWeighted(spark, dir).select(col("src"), col("dst"))

  private def repeatEdges(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Staged.getOrBuild(spark,
      s"coocc_edges::$dir::full_weighted_w2") {
      graft.operators.Graph.coOccurrenceEdgesWeighted(
          tbl(spark, dir, "lineitem"),
          col("l_orderkey"), col("l_partkey"))
        .filter(col("w") >= 2).select(col("src"), col("dst"))
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- PageRank centrality over the parts-ordered-together graph:
    //     3 fixed iterations in DETERMINISTIC mode (per-node sums fold
    //     the value-sorted contribution list, so every iteration is
    //     bit-exact across engines — the q103 trick applied to a graph
    //     loop); damping stays 0.85 with the oracle computing
    //     1 - CAST(0.85 AS DOUBLE) so both engines subtract the same
    //     IEEE double. Top 50 by rounded rank, node tiebreak ---
    "q141_pagerank" -> { (spark, dir) =>
      // part universe sampled 1-in-4: a pair survives iff BOTH ends
      // do (~1/16 of edges), keeping the bench-scale graph in the
      // tens of thousands of edges while exercising the same loop
      val edges = sampledEdges(spark, dir)
      graft.operators.Graph.pageRank(edges, iterations = 3,
          damping = 0.85, deterministic = true)
        .select(col("node"), round(col("pr"), 9).as("pr"))
        .orderBy(col("pr").desc, col("node").asc)
        .limit(50)
    },


    // --- weighted PageRank: co-order STRENGTH (shared-order counts)
    //     splits each part's rank proportionally instead of evenly —
    //     same deterministic-fold loop as q141, 2 iterations ---
    "q146_pagerank_weighted" -> { (spark, dir) =>
      // the staged weighted mine — the SAME artifact the six
      // unweighted cohort siblings project their edge set from
      // (sampledEdges), so the one self-join has seven consumers
      val edges = sampledEdgesWeighted(spark, dir)
      graft.operators.Graph.pageRank(edges, iterations = 2,
          damping = 0.85, deterministic = true, weighted = true)
        .select(col("node"), round(col("pr"), 9).as("pr"))
        .orderBy(col("pr").desc, col("node").asc)
        .limit(50)
    },


    // --- per-node triangle counts over the same co-order graph:
    //     canonical a<b edges, wedge self-join on the lower endpoint,
    //     one closing equi-join — exact integers end to end ---
    "q147_triangles" -> { (spark, dir) =>
      val edges = sampledEdges(spark, dir)
      graft.operators.Graph.triangleCounts(edges)
        .orderBy(col("node"))
    },


    // --- TEXTBOOK PageRank (dangling-mass redistribution) over a
    //     bipartite customer→order edge list where EVERY order node
    //     is a sink: without the redistribution its received mass
    //     would leak each round and ranks drift off-standard. The
    //     node set is src ∪ dst; deterministic fold keeps the per-
    //     round dangling sum bit-exact for the oracle's replay ---
    "q149_pagerank_dangling" -> { (spark, dir) =>
      val orders = tbl(spark, dir, "orders")
      val edges = orders.select(col("o_custkey").as("src"),
        (col("o_orderkey") + 10000000L).as("dst"))
      graft.operators.Graph.pageRank(edges, iterations = 3,
          damping = 0.85, deterministic = true, danglingMass = true)
        .select(col("node"), round(col("pr"), 12).as("pr"))
        .orderBy(col("pr").desc, col("node").asc)
        .limit(100)
    },


    // --- local clustering coefficient over the q147 co-occurrence
    //     graph: 2·tri/(d·(d−1)) per node — exact integer counts
    //     (degree-oriented triangle enumeration) + one pinned-order
    //     IEEE division, hash-compared UNROUNDED; degree-<2 nodes
    //     report 0.0 by convention. ---
    "q184_clustering_coeff" -> { (spark, dir) =>
      val edges = sampledEdges(spark, dir)
      graft.operators.Graph.clusteringCoefficients(edges)
        .orderBy(col("node"))
    },


    // --- multi-source BFS reach ("blast radius") over the part
    //     co-purchase graph: seeds at hop 0, min-hop per node, capped
    //     depth. The engine runs frontier iteration (one edge equi-
    //     join + one visited anti-join per round, operators/
    //     Graph.bfsHops) so per-round work is |frontier|·deg — the
    //     path-multiplicity blowup lives only in the oracle's
    //     recursive CTE, which dedups (node, hop) pairs per step. ---
    "q205_bfs_hops" -> { (spark, dir) =>
      // q141's 1-in-4 part sampling: same frontier loop, bench-scale
      // edge list (the full sf0.1 graph is 2.4M edges and 8+ s)
      val edges = sampledEdges(spark, dir)
      val seeds = edges.select(col("src").as("node"))
        .filter(col("node") % 100 === 0).distinct()
      graft.operators.Graph.bfsHops(edges, seeds, maxHops = 3)
        .orderBy(col("node"))
    },


    // --- common-neighbor link prediction ("frequently bought with
    //     the same things") over the REPEAT co-purchase graph (pairs
    //     sharing >= 2 distinct orders — the w-filter keeps the graph
    //     sparse at every scale: sum deg^2 is ~120k at sf0.001 and
    //     FALLS with sf as repeat pairs thin out). Non-adjacent pairs
    //     ranked by shared-neighbor count; neighborhood Jaccard as an
    //     exact integer ratio. maxWedgeDegree=40 exercises the hub
    //     cap (binds only at sf0.001), mirrored exactly in the
    //     oracle; surviving pairs keep UNCAPPED exact degrees. ---
    "q206_link_predict" -> { (spark, dir) =>
      val edges = repeatEdges(spark, dir)
      graft.operators.Graph.linkPrediction(edges, topK = 100,
          maxWedgeDegree = Some(40L))
        .orderBy(col("jac_num").desc, col("x"), col("y"))
    },


    // --- PERSONALIZED PageRank (random walk with restart — the
    //     related-items / trust-propagation form): teleport mass
    //     concentrates on the q205 seed set, so rank measures
    //     proximity to the seeds, not global centrality. Same staged
    //     loop as q141 (one edge equi-join + node agg per round),
    //     deterministic value-sorted folds; oracle replays 3 rounds
    //     as chained CTEs with the seed-indicator teleport vector. ---
    "q219_ppr" -> { (spark, dir) =>
      val edges = sampledEdges(spark, dir)
      val seeds = edges.select(col("src").as("node"))
        .filter(col("node") % 100 === 0).distinct()
      graft.operators.Graph.pageRank(edges, iterations = 3,
          damping = 0.85, deterministic = true, restart = Some(seeds))
        .select(col("node"), round(col("pr"), 9).as("pr"))
        .orderBy(col("pr").desc, col("node").asc)
        .limit(50)
    },


    // --- deterministic label-propagation communities over the q206
    //     repeat-co-purchase graph: 3 synchronous rounds, plurality
    //     neighbor label with smallest-label tie-break (the async/
    //     random variants are irreproducible by design — pinned
    //     rounds + pinned ties are what an oracle can replay, 3
    //     chained CTE rounds here). Per round: one adjacency join +
    //     one (node,label) count + one node arg-min. ---
    "q221_communities" -> { (spark, dir) =>
      val edges = repeatEdges(spark, dir)
      graft.operators.Graph.labelPropagation(edges, rounds = 3)
        .orderBy(col("node"))
    },


    // --- k-CORE PEELING (4 fixed rounds, k=8) on the q147 part
    //     co-occurrence graph: rounds drop nodes with degree < k and
    //     recompute — the dense-subgraph / hub-spam separator. The
    //     bounded-round contract makes the oracle a 4×-chained CTE
    //     replay (the q219/q221 discipline). ---
    "q256_kcore" -> { (spark, dir) =>
      val edges = sampledEdges(spark, dir)
      graft.operators.Graph.kCorePeel(edges, k = 8, rounds = 4)
        .orderBy(col("node"))
    },


    // --- MODULARITY of the q221 label-propagation communities (the
    //     standard Newman-Girvan quality score the detection step is
    //     judged by): Q = Σ_c [ m_c/m − (d_c/2m)² ] computed as ONE
    //     exact integer expression per community (4·m·m_c − d_c²)
    //     over 4m², divided once — no accumulation of doubles, so
    //     the score hash-matches the oracle's full 3-round replay.
    //     Emits the 20 largest communities with their contributions
    //     plus the global score; at 100 TB the whole computation is
    //     two broadcast joins of the (tiny) label table against the
    //     canonical edge list. ---
    "q333_modularity" -> rounded("contrib" -> 6, "modularity" -> 6)({
      (spark, dir) =>
      // the co-occurrence self-join is the expensive stage: the
      // STAGED parquet edge list (shared with q206/q221) feeds both
      // the propagation loop and the modularity censuses — no
      // localCheckpoint needed, the artifact is already materialized
      val edges = repeatEdges(spark, dir)
      val labels = graft.operators.Graph
        .labelPropagation(edges, rounds = 3)
        .localCheckpoint() // loop output; three downstream joins
      val canon = edges
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b")).distinct()
        .localCheckpoint() // feeds m, degrees, and intra-edge counts
      val m = canon.agg(count(lit(1)).as("me"))
      val deg = canon.select(col("a").as("node"))
        .unionByName(canon.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
      val intra = canon
        .join(labels.select(col("node").as("a"),
          col("label").as("la")), Seq("a"))
        .join(labels.select(col("node").as("b"),
          col("label").as("lb")), Seq("b"))
        .filter(col("la") === col("lb"))
        .groupBy(col("la").as("label"))
        .agg(count(lit(1)).as("intra_edges"))
      val per = deg.join(labels, Seq("node"))
        .groupBy(col("label"))
        .agg(sum(col("d")).as("degree_sum"),
          count(lit(1)).as("n_nodes"))
        .join(intra, Seq("label"), "left")
        .withColumn("intra_edges",
          coalesce(col("intra_edges"), lit(0L)))
        .crossJoin(broadcast(m))
        .withColumn("__cnum", lit(4L) * col("me") * col("intra_edges")
          - col("degree_sum") * col("degree_sum"))
      val glob = per.agg(sum(col("__cnum")).as("__qnum"),
        max(col("me")).as("__me"))
      per.orderBy(col("n_nodes").desc, col("label").asc).limit(20)
        .crossJoin(broadcast(glob))
        .select(col("label"), col("n_nodes"), col("intra_edges"),
          col("degree_sum"),
          (col("__cnum").cast("double") /
            (lit(4L) * col("me") * col("me")).cast("double"))
            .as("contrib"),
          col("me").as("m_edges"),
          (col("__qnum").cast("double") /
            (lit(4L) * col("__me") * col("__me")).cast("double"))
            .as("modularity"))
        .orderBy(col("label"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    // 3 unrolled PageRank iterations; per-node sums fold the
    // value-sorted contribution list (list_reduce starts from the
    // first element, Spark's aggregate from 0.0 — IEEE-identical
    // since 0.0 + x = x); damping constants built from
    // CAST(0.85 AS DOUBLE) so both engines use the same doubles
    "q141_pagerank" -> """
      WITH eg AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                  FROM lineitem WHERE l_partkey % 4 = 0),
      e AS (SELECT DISTINCT a.i AS src, b.i AS dst
            FROM eg a JOIN eg b ON a.g = b.g AND a.i <> b.i),
      n AS (SELECT DISTINCT src AS node FROM e),
      nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM n),
      deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg
              FROM e GROUP BY 1),
      p0 AS (SELECT node, 1.0 / nn.nd AS pr FROM n CROSS JOIN nn),
      s1 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p0 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p1 AS (SELECT n.node,
               (1.0 - CAST(0.85 AS DOUBLE)) / nn.nd
                 + CAST(0.85 AS DOUBLE)
                   * coalesce(s1.s, CAST(0 AS DOUBLE)) AS pr
             FROM n CROSS JOIN nn LEFT JOIN s1 ON n.node = s1.node),
      s2 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p1 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p2 AS (SELECT n.node,
               (1.0 - CAST(0.85 AS DOUBLE)) / nn.nd
                 + CAST(0.85 AS DOUBLE)
                   * coalesce(s2.s, CAST(0 AS DOUBLE)) AS pr
             FROM n CROSS JOIN nn LEFT JOIN s2 ON n.node = s2.node),
      s3 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p2 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p3 AS (SELECT n.node,
               (1.0 - CAST(0.85 AS DOUBLE)) / nn.nd
                 + CAST(0.85 AS DOUBLE)
                   * coalesce(s3.s, CAST(0 AS DOUBLE)) AS pr
             FROM n CROSS JOIN nn LEFT JOIN s3 ON n.node = s3.node)
      SELECT node, round(pr, 9) AS pr FROM p3
      ORDER BY round(pr, 9) DESC, node LIMIT 50""",


    // q141's loop with proportional contributions: w = shared-order
    // count, outdeg = Σw; ×1-exactness keeps the two forms comparable
    "q146_pagerank_weighted" -> """
      WITH eg AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                  FROM lineitem WHERE l_partkey % 4 = 0),
      e AS (SELECT a.i AS src, b.i AS dst,
                   CAST(count(*) AS DOUBLE) AS w
            FROM eg a JOIN eg b ON a.g = b.g AND a.i <> b.i
            GROUP BY 1, 2),
      n AS (SELECT DISTINCT src AS node FROM e),
      nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM n),
      deg AS (SELECT src, CAST(sum(w) AS DOUBLE) AS outdeg
              FROM e GROUP BY 1),
      p0 AS (SELECT node, 1.0 / nn.nd AS pr FROM n CROSS JOIN nn),
      s1 AS (SELECT e.dst AS node,
               list_reduce(list((p.pr * e.w) / d.outdeg
                                ORDER BY (p.pr * e.w) / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p0 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p1 AS (SELECT n.node,
               (1.0 - CAST(0.85 AS DOUBLE)) / nn.nd
                 + CAST(0.85 AS DOUBLE)
                   * coalesce(s1.s, CAST(0 AS DOUBLE)) AS pr
             FROM n CROSS JOIN nn LEFT JOIN s1 ON n.node = s1.node),
      s2 AS (SELECT e.dst AS node,
               list_reduce(list((p.pr * e.w) / d.outdeg
                                ORDER BY (p.pr * e.w) / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p1 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p2 AS (SELECT n.node,
               (1.0 - CAST(0.85 AS DOUBLE)) / nn.nd
                 + CAST(0.85 AS DOUBLE)
                   * coalesce(s2.s, CAST(0 AS DOUBLE)) AS pr
             FROM n CROSS JOIN nn LEFT JOIN s2 ON n.node = s2.node)
      SELECT node, round(pr, 9) AS pr FROM p2
      ORDER BY round(pr, 9) DESC, node LIMIT 50""",


    // canonical edges -> wedges on the lower endpoint -> closing join;
    // one count per triangle corner — all integers
    "q147_triangles" -> """
      WITH eg AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                  FROM lineitem WHERE l_partkey % 4 = 0),
      e0 AS (SELECT DISTINCT a.i AS src, b.i AS dst
             FROM eg a JOIN eg b ON a.g = b.g AND a.i <> b.i),
      canon AS (SELECT DISTINCT least(src, dst) AS a,
                                greatest(src, dst) AS b
                FROM e0 WHERE src <> dst),
      w AS (SELECT c1.a, c1.b AS x, c2.b AS y
            FROM canon c1 JOIN canon c2
              ON c1.a = c2.a AND c1.b < c2.b),
      t AS (SELECT w.a, w.x, w.y
            FROM w JOIN canon c ON c.a = w.x AND c.b = w.y),
      pc AS (SELECT a AS node FROM t
             UNION ALL SELECT x FROM t
             UNION ALL SELECT y FROM t)
      SELECT node, CAST(count(*) AS BIGINT) AS triangles
      FROM pc GROUP BY 1 ORDER BY 1""",


    // textbook PageRank with dangling-mass redistribution: per round
    // the mass on sink nodes (value-sorted fold, bit-exact) splits
    // uniformly; same IEEE op order as the engine's danglingMass path
    "q149_pagerank_dangling" -> """
      WITH e AS (SELECT o_custkey AS src,
                        o_orderkey + 10000000 AS dst FROM orders),
      n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM n),
      deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg
              FROM e GROUP BY 1),
      p0 AS (SELECT node, 1.0 / nn.nd AS pr FROM n CROSS JOIN nn),
      d1 AS (SELECT coalesce(list_reduce(list(pr ORDER BY pr),
                      (a, b) -> a + b), CAST(0 AS DOUBLE)) AS m
             FROM p0 WHERE node NOT IN (SELECT src FROM deg)),
      s1 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p0 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p1 AS (SELECT n.node,
               (1.0 - CAST(0.85 AS DOUBLE)) / nn.nd
                 + CAST(0.85 AS DOUBLE)
                   * (coalesce(s1.s, CAST(0 AS DOUBLE))
                      + d1.m / nn.nd) AS pr
             FROM n CROSS JOIN nn CROSS JOIN d1
                    LEFT JOIN s1 ON n.node = s1.node),
      d2 AS (SELECT coalesce(list_reduce(list(pr ORDER BY pr),
                      (a, b) -> a + b), CAST(0 AS DOUBLE)) AS m
             FROM p1 WHERE node NOT IN (SELECT src FROM deg)),
      s2 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p1 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p2 AS (SELECT n.node,
               (1.0 - CAST(0.85 AS DOUBLE)) / nn.nd
                 + CAST(0.85 AS DOUBLE)
                   * (coalesce(s2.s, CAST(0 AS DOUBLE))
                      + d2.m / nn.nd) AS pr
             FROM n CROSS JOIN nn CROSS JOIN d2
                    LEFT JOIN s2 ON n.node = s2.node),
      d3 AS (SELECT coalesce(list_reduce(list(pr ORDER BY pr),
                      (a, b) -> a + b), CAST(0 AS DOUBLE)) AS m
             FROM p2 WHERE node NOT IN (SELECT src FROM deg)),
      s3 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p2 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p3 AS (SELECT n.node,
               (1.0 - CAST(0.85 AS DOUBLE)) / nn.nd
                 + CAST(0.85 AS DOUBLE)
                   * (coalesce(s3.s, CAST(0 AS DOUBLE))
                      + d3.m / nn.nd) AS pr
             FROM n CROSS JOIN nn CROSS JOIN d3
                    LEFT JOIN s3 ON n.node = s3.node)
      SELECT node, round(pr, 12) AS pr FROM p3
      ORDER BY round(pr, 12) DESC, node LIMIT 100""",


    "q184_clustering_coeff" -> """
      WITH eg AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                  FROM lineitem WHERE l_partkey % 4 = 0),
      e0 AS (SELECT DISTINCT a.i AS src, b.i AS dst
             FROM eg a JOIN eg b ON a.g = b.g AND a.i <> b.i),
      canon AS (SELECT DISTINCT least(src, dst) AS a,
                                greatest(src, dst) AS b
                FROM e0 WHERE src <> dst),
      deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d
              FROM (SELECT a AS node FROM canon
                    UNION ALL SELECT b FROM canon)
              GROUP BY 1),
      w AS (SELECT c1.a, c1.b AS x, c2.b AS y
            FROM canon c1 JOIN canon c2
              ON c1.a = c2.a AND c1.b < c2.b),
      t AS (SELECT w.a, w.x, w.y
            FROM w JOIN canon c ON c.a = w.x AND c.b = w.y),
      pc AS (SELECT a AS node FROM t
             UNION ALL SELECT x FROM t
             UNION ALL SELECT y FROM t),
      tc AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles
             FROM pc GROUP BY 1)
      SELECT deg.node, deg.d,
             CAST(coalesce(tc.triangles, 0) AS BIGINT) AS triangles,
             CASE WHEN deg.d >= 2 THEN
               (2.0 * CAST(coalesce(tc.triangles, 0) AS DOUBLE)) /
                 CAST(deg.d * (deg.d - 1) AS DOUBLE)
             ELSE 0.0 END AS coeff
      FROM deg LEFT JOIN tc USING (node) ORDER BY deg.node""",


    "q205_bfs_hops" -> """
      WITH RECURSIVE m AS (
        SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem
        WHERE l_partkey % 4 = 0),
      e AS (SELECT DISTINCT a.i AS src, b.i AS dst
            FROM m a JOIN m b ON a.g = b.g AND a.i <> b.i),
      r AS (
        SELECT DISTINCT src AS node, 0 AS hop FROM e WHERE src % 100 = 0
        UNION
        SELECT e.dst, r.hop + 1 FROM r JOIN e ON e.src = r.node
        WHERE r.hop < 3)
      SELECT node, CAST(min(hop) AS INT) AS hop
      FROM r GROUP BY node ORDER BY node""",


    "q206_link_predict" -> """
      WITH m AS (
        SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      w AS (SELECT a.i AS src, b.i AS dst, count(*) AS w
            FROM m a JOIN m b ON a.g = b.g AND a.i <> b.i
            GROUP BY 1, 2),
      canon AS (SELECT DISTINCT least(src, dst) AS a,
                       greatest(src, dst) AS b
                FROM w WHERE w >= 2),
      adj AS (SELECT a AS n, b AS nbr FROM canon
              UNION ALL SELECT b, a FROM canon),
      deg AS (SELECT n, count(*) AS d FROM adj GROUP BY 1),
      ctr AS (SELECT adj.n, adj.nbr FROM adj JOIN deg USING (n)
              WHERE deg.d <= 40),
      cn AS (SELECT l.nbr AS x, r.nbr AS y, count(*) AS cn
             FROM ctr l JOIN ctr r ON l.n = r.n AND l.nbr < r.nbr
             GROUP BY 1, 2),
      cand AS (SELECT cn.x, cn.y, cn.cn FROM cn
               LEFT JOIN canon ON canon.a = cn.x AND canon.b = cn.y
               WHERE canon.a IS NULL)
      SELECT cand.x, cand.y, cand.cn AS jac_num,
             dx.d + dy.d - cand.cn AS jac_den
      FROM cand JOIN deg dx ON dx.n = cand.x
                JOIN deg dy ON dy.n = cand.y
      ORDER BY jac_num DESC, x, y LIMIT 100""",


    "q219_ppr" -> """
      WITH eg AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                  FROM lineitem WHERE l_partkey % 4 = 0),
      e AS (SELECT DISTINCT a.i AS src, b.i AS dst
            FROM eg a JOIN eg b ON a.g = b.g AND a.i <> b.i),
      n AS (SELECT DISTINCT src AS node FROM e),
      seeds AS (SELECT DISTINCT src AS node FROM e WHERE src % 100 = 0),
      sn AS (SELECT CAST(count(*) AS DOUBLE) AS sd FROM seeds),
      rv AS (SELECT n.node,
                    CASE WHEN s.node IS NOT NULL THEN 1.0 / sn.sd
                         ELSE CAST(0 AS DOUBLE) END AS r
             FROM n CROSS JOIN sn LEFT JOIN seeds s ON n.node = s.node),
      deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg
              FROM e GROUP BY 1),
      p0 AS (SELECT node, r AS pr FROM rv),
      s1 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p0 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p1 AS (SELECT rv.node,
               (1.0 - CAST(0.85 AS DOUBLE)) * rv.r
                 + CAST(0.85 AS DOUBLE)
                   * coalesce(s1.s, CAST(0 AS DOUBLE)) AS pr
             FROM rv LEFT JOIN s1 ON rv.node = s1.node),
      s2 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p1 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p2 AS (SELECT rv.node,
               (1.0 - CAST(0.85 AS DOUBLE)) * rv.r
                 + CAST(0.85 AS DOUBLE)
                   * coalesce(s2.s, CAST(0 AS DOUBLE)) AS pr
             FROM rv LEFT JOIN s2 ON rv.node = s2.node),
      s3 AS (SELECT e.dst AS node,
               list_reduce(list(p.pr / d.outdeg
                                ORDER BY p.pr / d.outdeg),
                           (a, b) -> a + b) AS s
             FROM e JOIN p2 p ON e.src = p.node
                    JOIN deg d ON e.src = d.src
             GROUP BY 1),
      p3 AS (SELECT rv.node,
               (1.0 - CAST(0.85 AS DOUBLE)) * rv.r
                 + CAST(0.85 AS DOUBLE)
                   * coalesce(s3.s, CAST(0 AS DOUBLE)) AS pr
             FROM rv LEFT JOIN s3 ON rv.node = s3.node)
      SELECT node, round(pr, 9) AS pr FROM p3
      ORDER BY pr DESC, node LIMIT 50""",


    "q221_communities" -> """
      WITH m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                 FROM lineitem),
      wp AS (SELECT a.i AS src, b.i AS dst, count(*) AS w
             FROM m a JOIN m b ON a.g = b.g AND a.i <> b.i
             GROUP BY 1, 2),
      canon AS (SELECT DISTINCT least(src, dst) AS a,
                       greatest(src, dst) AS b
                FROM wp WHERE w >= 2),
      adj AS (SELECT a AS node, b AS nbr FROM canon
              UNION ALL SELECT b, a FROM canon),
      l0 AS (SELECT DISTINCT node, node AS label FROM adj),
      c1 AS (SELECT adj.node, l.label, count(*) AS c
             FROM adj JOIN l0 l ON adj.nbr = l.node GROUP BY 1, 2),
      l1 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label) AS rn
               FROM c1) WHERE rn = 1),
      c2 AS (SELECT adj.node, l.label, count(*) AS c
             FROM adj JOIN l1 l ON adj.nbr = l.node GROUP BY 1, 2),
      l2 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label) AS rn
               FROM c2) WHERE rn = 1),
      c3 AS (SELECT adj.node, l.label, count(*) AS c
             FROM adj JOIN l2 l ON adj.nbr = l.node GROUP BY 1, 2),
      l3 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label) AS rn
               FROM c3) WHERE rn = 1)
      SELECT node, label FROM l3 ORDER BY node""",


    "q256_kcore" -> """
      WITH m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                 FROM lineitem WHERE l_partkey % 4 = 0),
      e0 AS (SELECT DISTINCT a.i AS src, b.i AS dst
             FROM m a JOIN m b USING (g) WHERE a.i <> b.i),
      b1 AS (SELECT src FROM (SELECT src, count(*) AS deg FROM e0
               GROUP BY 1) WHERE deg < 8),
      e1 AS (SELECT * FROM e0
             WHERE src NOT IN (SELECT src FROM b1)
               AND dst NOT IN (SELECT src FROM b1)),
      b2 AS (SELECT src FROM (SELECT src, count(*) AS deg FROM e1
               GROUP BY 1) WHERE deg < 8),
      e2 AS (SELECT * FROM e1
             WHERE src NOT IN (SELECT src FROM b2)
               AND dst NOT IN (SELECT src FROM b2)),
      b3 AS (SELECT src FROM (SELECT src, count(*) AS deg FROM e2
               GROUP BY 1) WHERE deg < 8),
      e3 AS (SELECT * FROM e2
             WHERE src NOT IN (SELECT src FROM b3)
               AND dst NOT IN (SELECT src FROM b3)),
      b4 AS (SELECT src FROM (SELECT src, count(*) AS deg FROM e3
               GROUP BY 1) WHERE deg < 8),
      e4 AS (SELECT * FROM e3
             WHERE src NOT IN (SELECT src FROM b4)
               AND dst NOT IN (SELECT src FROM b4))
      SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
      FROM e4 GROUP BY 1 ORDER BY 1""",


    "q333_modularity" -> """
      WITH mm AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                  FROM lineitem),
      wp AS (SELECT a.i AS src, b.i AS dst, count(*) AS w
             FROM mm a JOIN mm b ON a.g = b.g AND a.i <> b.i
             GROUP BY 1, 2),
      canon AS (SELECT DISTINCT least(src, dst) AS a,
                       greatest(src, dst) AS b
                FROM wp WHERE w >= 2),
      adj AS (SELECT a AS node, b AS nbr FROM canon
              UNION ALL SELECT b, a FROM canon),
      l0 AS (SELECT DISTINCT node, node AS label FROM adj),
      c1 AS (SELECT adj.node, l.label, count(*) AS c
             FROM adj JOIN l0 l ON adj.nbr = l.node GROUP BY 1, 2),
      l1 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label) AS rn
               FROM c1) WHERE rn = 1),
      c2 AS (SELECT adj.node, l.label, count(*) AS c
             FROM adj JOIN l1 l ON adj.nbr = l.node GROUP BY 1, 2),
      l2 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label) AS rn
               FROM c2) WHERE rn = 1),
      c3 AS (SELECT adj.node, l.label, count(*) AS c
             FROM adj JOIN l2 l ON adj.nbr = l.node GROUP BY 1, 2),
      l3 AS (SELECT node, label FROM (
               SELECT node, label, row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label) AS rn
               FROM c3) WHERE rn = 1),
      me AS (SELECT CAST(count(*) AS BIGINT) AS me FROM canon),
      deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d
              FROM adj GROUP BY 1),
      ie AS (SELECT la.label, CAST(count(*) AS BIGINT) AS mc
             FROM canon c
             JOIN l3 la ON la.node = c.a
             JOIN l3 lb ON lb.node = c.b
             WHERE la.label = lb.label GROUP BY 1),
      ds AS (SELECT l3.label, CAST(sum(deg.d) AS BIGINT) AS dc,
                    CAST(count(*) AS BIGINT) AS sz
             FROM deg JOIN l3 USING (node) GROUP BY 1),
      pc AS (SELECT ds.label, ds.sz, coalesce(ie.mc, 0) AS mc, ds.dc,
                    4 * me.me * coalesce(ie.mc, 0) - ds.dc * ds.dc
                      AS cnum
             FROM ds LEFT JOIN ie USING (label) CROSS JOIN me),
      gl AS (SELECT CAST(sum(cnum) AS BIGINT) AS qnum FROM pc),
      top AS (SELECT * FROM pc
              ORDER BY sz DESC, label ASC LIMIT 20)
      SELECT t.label, t.sz AS n_nodes, t.mc AS intra_edges,
             t.dc AS degree_sum,
             round(t.cnum * 1.0 / (4 * me.me * me.me), 6) AS contrib,
             me.me AS m_edges,
             round(gl.qnum * 1.0 / (4 * me.me * me.me), 6)
               AS modularity
      FROM top t CROSS JOIN me CROSS JOIN gl
      ORDER BY t.label"""
  )
}
