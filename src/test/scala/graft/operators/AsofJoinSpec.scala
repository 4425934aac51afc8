package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

import java.sql.Timestamp

/** Boundary semantics of the union-and-window AS-OF join, matching SQL
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`.
  */
class AsofJoinSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  private def run(
      left: Seq[(Long, Long, Timestamp)],
      right: Seq[(Long, Timestamp, String)]): Map[Long, Option[String]] = {
    val l = left.toDF("event_id", "k", "t")
    val r = right.toDF("k", "t", "v")
    AsofJoin.backward(l, r, "k", "t", "k", "t", Seq("v"))
      .collect()
      .map(row => row.getAs[Long]("event_id") -> Option(row.getAs[String]("v")))
      .toMap
  }

  test("picks the most recent right row at or before the left time") {
    val out = run(
      left = Seq((1L, 10L, ts(100)), (2L, 10L, ts(250))),
      right = Seq((10L, ts(50), "a"), (10L, ts(200), "b"), (10L, ts(300), "c")))
    assert(out(1L) === Some("a"))
    assert(out(2L) === Some("b"))
  }

  test("equal timestamps match (inclusive bound)") {
    val out = run(
      left = Seq((1L, 10L, ts(200))),
      right = Seq((10L, ts(200), "exact")))
    assert(out(1L) === Some("exact"))
  }

  test("no earlier right row -> null match; other keys don't leak") {
    val out = run(
      left = Seq((1L, 10L, ts(10)), (2L, 99L, ts(500))),
      right = Seq((10L, ts(50), "late"), (11L, ts(1), "otherkey")))
    assert(out(1L) === None)
    assert(out(2L) === None)
  }

  test("null right timestamps never become a standing match") {
    val l = Seq((1L, 10L, ts(100))).toDF("event_id", "k", "t")
    val r = Seq((Some(10L), None: Option[Timestamp], "nullts"))
      .toDF("k", "t", "v")
    val out = AsofJoin.backward(l, r, "k", "t", "k", "t", Seq("v")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("v") === null)
  }

  test("null left timestamp matches nothing") {
    val l = Seq((Some(1L), Some(10L), None: Option[Timestamp]))
      .toDF("event_id", "k", "t")
    val r = Seq((10L, ts(50), "a")).toDF("k", "t", "v")
    val out = AsofJoin.backward(l, r, "k", "t", "k", "t", Seq("v")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("v") === null)
  }

  private def runFwd(
      left: Seq[(Long, Long, Timestamp)],
      right: Seq[(Long, Timestamp, String)]): Map[Long, Option[String]] = {
    val l = left.toDF("event_id", "k", "t")
    val r = right.toDF("k", "t", "v")
    AsofJoin.forward(l, r, "k", "t", "k", "t", Seq("v"))
      .collect()
      .map(row => row.getAs[Long]("event_id") -> Option(row.getAs[String]("v")))
      .toMap
  }

  test("forward: picks the nearest right row at or after the left time") {
    val out = runFwd(
      left = Seq((1L, 10L, ts(100)), (2L, 10L, ts(250)), (3L, 10L, ts(200))),
      right = Seq((10L, ts(50), "a"), (10L, ts(200), "b"), (10L, ts(300), "c")))
    assert(out(1L) === Some("b"))
    assert(out(2L) === Some("c"))
    assert(out(3L) === Some("b")) // inclusive bound
  }

  test("forward: no later right row -> null; null left time matches nothing") {
    val out = runFwd(
      left = Seq((1L, 10L, ts(400)), (2L, 10L, null)),
      right = Seq((10L, ts(300), "c")))
    assert(out(1L) === None)
    assert(out(2L) === None)
  }

  test("every left row survives (left join cardinality)") {
    val left = (1L to 100L).map(i => (i, i % 7, ts(i)))
    val right = Seq((3L, ts(0), "z"))
    val out = run(left, right)
    assert(out.size === 100)
    assert(out.count(_._2.isDefined) === left.count(_._2 == 3L))
  }
}
