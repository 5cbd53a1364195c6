package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan for one or more query keys
  * (the `.explain` snapshots PLANS.md carries). Not part of the shipped
  * library surface.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <key>[,<key>...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val keys = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (k <- keys) {
      println(s"==== $k ====")
      println(graft.SparkEntry.queries(k)(spark, dir).queryExecution.executedPlan)
    }
    spark.stop()
  }
}
