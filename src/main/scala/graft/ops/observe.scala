package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline observability — `Dataset.observe()` + QueryExecutionListener.
  *
  * The production surface every long pipeline needs: row-count /
  * null-rate / checksum assertions that ride ON the query as named
  * aggregate metrics (a `CollectMetrics` node in the plan), computed
  * while rows stream past — no second pass over the data, no extra
  * action. At 100 TB a separate validation scan costs as much as the
  * query itself; an observe() metric is free.
  *
  * Two halves:
  *  - `observe` attaches the metrics to the Dataset (plan-side);
  *  - a [[QueryExecutionListener]] (or `queryExecution.observedMetrics`
  *    on the executed frame) reads them after any action (read-side).
  *
  * The scored key (`pipe_observe_metrics`) proves the plan-side: the
  * metrics ride a normal oracled aggregation without perturbing its
  * result. ObserveSuite proves the read-side: the listener observes the
  * exact row/empty/char counts for the fixture corpus.
  */
object Observability {

  /** Attach standard row-health metrics to any frame: total rows plus a
    * null count per named column. Read back after an action via
    * [[MetricsCollector]] or `df.queryExecution.observedMetrics(name)`.
    */
  def observeRowHealth(df: DataFrame, name: String, cols: Seq[String]): DataFrame = {
    val nullCounts: Seq[Column] =
      cols.map(c => count_if(col(c).isNull).as(s"${c}_nulls"))
    df.observe(name, count(lit(1)).as("rows"), nullCounts: _*)
  }

  /** Listener that captures observed-metric rows by metric name.
    * Registration is per-session (`spark.listenerManager.register`);
    * delivery is asynchronous on the listener bus, so readers poll via
    * [[await]] rather than assuming synchronous delivery. */
  final class MetricsCollector extends QueryExecutionListener {
    private val seen = new java.util.concurrent.ConcurrentHashMap[String, Row]()
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (k, v) => seen.put(k, v) }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    def get(name: String): Option[Row] = Option(seen.get(name))
    def await(name: String, timeoutMs: Long): Option[Row] = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      var r = get(name)
      while (r.isEmpty && System.nanoTime() < deadline) { Thread.sleep(20); r = get(name) }
      r
    }
  }

  /** Scored pipeline-with-metrics query: per-language corpus summary with
    * scan-health metrics observed on the input leg — rows scanned, empty
    * documents, total characters. The observe node passes every row
    * through unchanged, so the oracle is simply the aggregation itself;
    * the driver's hash-match is the proof that observability costs zero
    * correctness. ObserveSuite asserts the metric VALUES. */
  private def observeMetrics(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .observe("graft_corpus_scan",
        count(lit(1)).as("rows_scanned"),
        count_if(length(col("text")) === 0).as("empty_text"),
        sum(col("n_chars")).as("chars_total"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_observe_metrics" -> (observeMetrics _),
  )

  val oracle: Map[String, String] = Map(
    "pipe_observe_metrics" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        | CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
