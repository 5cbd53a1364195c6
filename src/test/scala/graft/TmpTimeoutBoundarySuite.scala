package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** Scratch (deleted before commit): pins whether EventTimeTimeout fires at
  * timeout == watermark (<=) or only when watermark passes it (<).
  */
class TmpTimeoutBoundarySuite extends SparkSuiteBase {

  test("timeout boundary: fire at equality or strictly past?") {
    import spark.implicits._
    val in = MemoryStream[Streams.SessionEvent](spark)
    // gap 30 min, watermark delay 10 min
    val out = Streams.customSessions(in.toDS(), 30 * 60 * 1000L, "10 minutes")
    val q = out.writeStream.format("memory").queryName("tb").outputMode("append").start()
    try {
      in.addData(Streams.SessionEvent(7, Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      q.processAllAvailable()
      // wm = 00:40 - 10min = 00:30:00.000 == timeout(7) = 00:00 + 30min
      in.addData(Streams.SessionEvent(8, Timestamp.valueOf("2024-01-01 00:40:00"), 1.0))
      q.processAllAvailable()
      val atEq = spark.table("tb").collect().map(_.getAs[Long]("user_id")).toSet
      println(s"BOUNDARY at wm==timeout emitted users: $atEq")
      // push wm 1 ms past the timeout
      in.addData(Streams.SessionEvent(9, Timestamp.valueOf("2024-01-01 00:40:00.001"), 1.0))
      q.processAllAvailable()
      val past = spark.table("tb").collect().map(_.getAs[Long]("user_id")).toSet
      println(s"BOUNDARY at wm==timeout+1ms emitted users: $past")
      assert(past.contains(7L) || atEq.contains(7L))
      println(if (atEq.contains(7L)) "BOUNDARY VERDICT: fires at <= (inclusive)"
              else "BOUNDARY VERDICT: fires only at < (strict)")
    } finally q.stop()
  }
}
