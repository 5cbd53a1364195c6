package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relational edge lists (complements the
  * connected-components operator in llm.scala).
  *
  * PageRank here is EXACT integer fixed-point arithmetic: ranks are
  * scaled longs and every per-edge contribution is the integer division
  * `(pr * 85) div (100 * outdeg)`. Long sums are order-insensitive, so
  * the result is bit-identical across partitionings, thread counts and
  * engines — a float PageRank could never hash-match a DuckDB oracle
  * (partial-sum order differs); the fixed-point formulation is how you
  * make an iterative numeric algorithm oracle-checkable.
  *
  * 100-TB shape: one edge shuffle per iteration (join on the source
  * key, re-aggregate on the destination), degree table computed once,
  * per-iteration localCheckpoint to pin lineage — same execution
  * discipline as dedupClusters.
  */
object Graph {

  /** 3-iteration integer PageRank over the undirected customer↔supplier
    * bipartite graph induced by orders⨝lineitem (customer nodes = 2k,
    * supplier nodes = 2k+1). */
  private def graphPagerank(s: SparkSession, dir: String): DataFrame = {
    val pairs = T(s, dir, "orders").select("o_orderkey", "o_custkey")
      .join(T(s, dir, "lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
      // columnar cache (2 longs/row, compressed) — materialized by the
      // strategy-picking count below, then read by deg AND edgesD so
      // the orders⨝lineitem distinct runs once
      .persist()
    // Runtime strategy switch (the x100 stress run turned the scaladoc's
    // "at a scale where ranks outgrows the broadcast threshold, switch
    // to repartition+persist" note from advice into a failure: the
    // row-block localCheckpoints of the 118M-row edge tables plus three
    // per-iteration full-edge exchanges OOM'd an 8 GB heap). One cheap
    // count on the cached pair set picks the plan, AQE-style:
    val bigGraph = pairs.count() > 2000000L
    val edges = pairs
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
    val deg0 = edges.groupBy("a").agg(count(lit(1)).as("outdeg"))
    // small graphs: pin with localCheckpoint (row blocks, cheapest to
    // build — the driver-bench path, byte-identical to rounds 1-5).
    // big graphs: columnar-compressed persist, and edgesD keeps an
    // explicit hash partitioning on the join key so every iteration's
    // SortMergeJoin exchanges ONLY the ranks table (InMemoryTableScan
    // preserves outputPartitioning; a checkpoint's LogicalRDD drops it)
    val deg = if (bigGraph) deg0.persist() else deg0.localCheckpoint()
    val edgesD0 = edges.join(deg, "a")
    val edgesD =
      if (bigGraph) edgesD0.repartition(col("a")).persist()
      else edgesD0.localCheckpoint()
    var ranks = deg.select(col("a").as("node"), lit(1000000L).as("pr"))
    // superseded per-iteration checkpoints are freed as soon as the next
    // one materializes (same heap discipline as dedupClusters); the
    // initial ranks frame is NOT a checkpoint (it still reads deg's
    // blocks), so only loop-produced checkpoints are eligible
    var supersededCp: Option[DataFrame] = None
    for (it <- 1 to 3) {
      // big graphs: hash-join against the SMALL ranks side instead of
      // sort-merge — an SMJ would re-SORT the 118M-row cached edge side
      // every iteration, and at ×100 scale those sort buffers (not the
      // caches) are what pushed the heap over 8 GB when the key ran
      // mid-suite rather than solo. The ranks build side is nodes/P
      // rows per task — trivially resident.
      val ranksJ = if (bigGraph) ranks.hint("shuffle_hash") else ranks
      val contribs = edgesD.join(ranksJ, col("a") === col("node"))
        .select(col("b"), expr("(pr * 85) div (100 * outdeg)").as("c"))
        .groupBy("b").agg(sum(col("c")).as("sc"))
      ranks = deg.select(col("a").as("node"))
        .join(contribs, col("node") === col("b"), "left_outer")
        .select(col("node"), (lit(150000L) + coalesce(col("sc"), lit(0L))).as("pr"))
        .localCheckpoint()
      supersededCp.foreach(org.apache.spark.sql.graftshim.Shim.unpersistLocalCheckpoint)
      supersededCp = Some(ranks)
      // after iteration 1 the support caches (deg, edgesD) are built;
      // the raw pair cache is dead weight from here on
      if (it == 1) pairs.unpersist(blocking = false)
    }
    // the final ranks checkpoint is self-contained — the support tables
    // are no longer reachable from the returned plan (pairs was already
    // dropped after iteration 1)
    if (bigGraph) { deg.unpersist(blocking = false); edgesD.unpersist(blocking = false) }
    else Seq(deg, edgesD).foreach(org.apache.spark.sql.graftshim.Shim.unpersistLocalCheckpoint)
    ranks.orderBy("node")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (graphPagerank _),
  )

  private def iterSql(prev: String, cN: String, rN: String): String =
    s"""$cN AS (SELECT e.b, SUM((r.pr * 85) // (100 * d.outdeg)) AS sc
       | FROM edges e JOIN $prev r ON e.a = r.node JOIN deg d ON e.a = d.a
       | GROUP BY e.b),
       |$rN AS (SELECT deg.a AS node, 150000 + COALESCE(sc, 0) AS pr
       | FROM deg LEFT JOIN $cN ON deg.a = $cN.b)""".stripMargin

  val oracle: Map[String, String] = Map(
    "graph_pagerank" ->
      s"""WITH pairs AS (
         | SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
         | FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
         |deg AS (SELECT a, COUNT(*) AS outdeg FROM edges GROUP BY a),
         |r0 AS (SELECT a AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
         |${iterSql("r0", "c1", "r1")},
         |${iterSql("r1", "c2", "r2")},
         |${iterSql("r2", "c3", "r3")}
         |SELECT node, CAST(pr AS BIGINT) AS pr FROM r3 ORDER BY node""".stripMargin,
  )
}
