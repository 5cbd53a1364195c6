package graft

import graft.ops._
import org.apache.spark.sql.functions._

/** observe() / QueryExecutionListener: the metrics ride the query and the
  * listener reads the exact values — the two halves the scored key's
  * hash-match alone cannot assert. */
class ObserveSuite extends SparkSuiteBase {

  test("pipe_observe_metrics: listener observes exact scan-health values") {
    val collector = new Observability.MetricsCollector
    spark.listenerManager.register(collector)
    try {
      val df = run("pipe_observe_metrics")
      df.collect()
      // expected values computed independently from the raw table
      val exp = T(spark, SF, "documents")
        .agg(count(lit(1)), count_if(length(col("text")) === 0), sum(col("n_chars")))
        .head()
      // listener delivery is async (listener bus); the executed frame's
      // own observedMetrics is the synchronous fallback
      val m = collector.await("graft_corpus_scan", 10000)
        .orElse(df.queryExecution.observedMetrics.get("graft_corpus_scan"))
        .getOrElse(fail("graft_corpus_scan metrics never observed"))
      assert(m.getAs[Long]("rows_scanned") === exp.getLong(0))
      assert(m.getAs[Long]("empty_text") === exp.getLong(1))
      assert(m.getAs[Long]("chars_total") === exp.getLong(2))
      assert(m.getAs[Long]("rows_scanned") > 0, "degenerate fixture")
    } finally spark.listenerManager.unregister(collector)
  }

  test("observe() does not perturb the query result") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "c"))
      .toDF("id", "v")
    val plain = base.groupBy().agg(sum($"id")).head().getLong(0)
    val observed = Observability.observeRowHealth(base, "health", Seq("id", "v"))
      .groupBy().agg(sum($"id"))
    // collect() (not head(), which plans a NEW limited QueryExecution)
    // so the metrics land on THIS frame's queryExecution
    assert(observed.collect()(0).getLong(0) === plain)
    val m = observed.queryExecution.observedMetrics("health")
    assert(m.getAs[Long]("rows") === 3L)
    assert(m.getAs[Long]("id_nulls") === 0L)
    assert(m.getAs[Long]("v_nulls") === 1L)
  }
}
