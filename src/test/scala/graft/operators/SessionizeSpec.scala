package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class SessionizeSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    // user 1: two sessions split by a 31-minute gap
    (1L, ts("2024-01-01 10:00:00"), 1L, 1.0),
    (1L, ts("2024-01-01 10:10:00"), 2L, 2.0),
    (1L, ts("2024-01-01 10:41:00"), 3L, 3.0),
    // user 2: one event, one session
    (2L, ts("2024-01-01 09:00:00"), 4L, 5.0)
  ).toDF("user_id", "ts", "event_id", "value")

  test("splits on gap STRICTLY greater than the threshold") {
    val out = Sessionize.assign(events, "user_id", "ts", "event_id", 1800L)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L && out(2L) == 1L) // 10-min gap: same session
    assert(out(3L) == 2L)                  // 31-min gap: new session
    assert(out(4L) == 1L)                  // ids are 1-based per user

    // a gap of EXACTLY the threshold stays in the session
    val exact = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 0.0),
      (1L, ts("2024-01-01 10:30:00"), 2L, 0.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val e = Sessionize.assign(exact, "user_id", "ts", "event_id", 1800L)
      .select("session_id").as[Long].collect()
    assert(e.toSet == Set(1L))
  }

  test("session rollup: bounds, counts, exact duration, value sum") {
    val out = Sessionize.sessions(events, "user_id", "ts", "event_id",
        "value", 1800L)
      .orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    val s11 = out(0)
    assert(s11.getAs[Long]("user_id") == 1L)
    assert(s11.getAs[Long]("n_events") == 2L)
    assert(s11.getAs[Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
    assert(s11.getAs[Timestamp]("session_end") == ts("2024-01-01 10:10:00"))
    assert(s11.getAs[Double]("duration_s") == 600.0)
    assert(s11.getAs[Double]("sum_value") == 3.0)
    // singleton sessions have zero duration
    assert(out(2).getAs[Double]("duration_s") == 0.0)
    assert(out(2).getAs[Long]("n_events") == 1L)
  }

  test("rejects a non-positive gap") {
    intercept[IllegalArgumentException] {
      Sessionize.assign(events, "user_id", "ts", "event_id", 0L)
    }
  }

  // Spark 4 reads tz-less parquet timestamp[us] — every driver events
  // table — as TIMESTAMP_NTZ; r8's unix_micros(ts) failed analysis on
  // exactly that type (q42/q43 red at sf0.1). Pin the NTZ path.
  test("accepts a TIMESTAMP_NTZ event-time column") {
    import org.apache.spark.sql.functions.{col, expr}
    val ntz = events.withColumn("ts",
      col("ts").cast("timestamp_ntz"))
    assert(ntz.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val out = Sessionize.sessions(ntz, "user_id", "ts", "event_id",
        "value", 1800L)
      .orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Double]("duration_s") == 600.0)
  }
}
