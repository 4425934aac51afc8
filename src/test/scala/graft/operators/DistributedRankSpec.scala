package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** The distributed two-pass ntile must be bit-identical to the SQL
  * reference semantics (single-partition `ntile(n) OVER (ORDER BY ...)`)
  * for every row — sizes, boundaries, and tie handling included.
  */
class DistributedRankSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def referenceNtile(n: Int, rows: Seq[(Long, Long)]): Map[Long, Int] = {
    val df = rows.toDF("v", "id")
    val w = Window.orderBy(col("v").desc, col("id"))
    df.select(col("id"), ntile(n).over(w).as("tile"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  private def distributedNtile(n: Int, rows: Seq[(Long, Long)]): Map[Long, Int] = {
    val df = rows.toDF("v", "id").repartition(7) // deliberately scrambled
    DistributedRank.ntile(df, n, Seq(col("v").desc, col("id")), numPartitions = 5)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("tile")).toMap
  }

  test("matches reference ntile on uneven division (103 rows, 4 tiles)") {
    val rng = new scala.util.Random(42)
    val rows = (1L to 103L).map(i => (rng.nextInt(1000).toLong, i))
    assert(distributedNtile(4, rows) === referenceNtile(4, rows))
  }

  test("matches reference ntile with heavy ties") {
    val rows = (1L to 50L).map(i => ((i % 3).toLong, i))
    assert(distributedNtile(4, rows) === referenceNtile(4, rows))
  }

  test("matches reference ntile when rows < tiles") {
    val rows = Seq((5L, 1L), (3L, 2L), (9L, 3L))
    assert(distributedNtile(7, rows) === referenceNtile(7, rows))
  }

  test("exact division (100 rows, 4 tiles of 25)") {
    val rows = (1L to 100L).map(i => (i, i))
    val tiles = distributedNtile(4, rows)
    assert(tiles.values.groupBy(identity).view.mapValues(_.size).toMap ===
      Map(1 -> 25, 2 -> 25, 3 -> 25, 4 -> 25))
    assert(tiles === referenceNtile(4, rows))
  }

  test("default parallelism tracks spark.sql.shuffle.partitions") {
    val df = (1L to 10L).toDF("v")
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(DistributedRank.resolvePartitions(
        df, DistributedRank.SessionDefault) === 7)
      // an explicit request always wins over the session setting
      assert(DistributedRank.resolvePartitions(df, 5) === 5)
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("offset lookup above ChainMax uses the broadcast-join path") {
    // perPid longer than the CASE-chain bound: offsets must still be
    // applied exactly (pid i → 10*i), now through a broadcast join.
    val p = 1500
    val parted = (0 until p).map(i => (i, i.toLong)).toDF("__pid", "x")
    val perPid = IndexedSeq.tabulate(p)(i => 10L * i)
    val got = DistributedRank.withOffset(parted, perPid)
    assert(got.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    val rows = got.collect()
      .map(r => r.getAs[Int]("__pid") -> r.getAs[Long]("__off")).toMap
    assert(rows === (0 until p).map(i => i -> 10L * i).toMap)
  }

  private def referenceNtileBy(
      n: Int, rows: Seq[(String, Long, Long)]): Map[Long, Int] = {
    val df = rows.toDF("g", "v", "id")
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    df.select(col("id"), ntile(n).over(w).as("tile"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("ntileBy matches per-group reference ntile, uneven groups") {
    val rng = new scala.util.Random(11)
    // group sizes 103 / 40 / 3 / 1 — uneven division, rows < tiles,
    // singleton group, all in one call
    val rows = (1L to 103L).map(i => ("a", rng.nextInt(9).toLong, i)) ++
      (104L to 143L).map(i => ("b", rng.nextInt(9).toLong, i)) ++
      (144L to 146L).map(i => ("c", 0L, i)) ++
      Seq(("d", 5L, 147L))
    val got = DistributedRank.ntileBy(
        rows.toDF("g", "v", "id").repartition(7), 4,
        Seq("g"), Seq(col("v"), col("id")), numPartitions = 5)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("tile")).toMap
    assert(got === referenceNtileBy(4, rows))
  }

  test("ntileBy keeps input columns and adds only tile") {
    val rows = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 3L, 3L))
    val out = DistributedRank.ntileBy(rows.toDF("g", "v", "id"), 2,
      Seq("g"), Seq(col("v"), col("id")))
    assert(out.columns.sorted.toSeq === Seq("g", "id", "tile", "v"))
  }

  test("global row number is a permutation of 1..N in sort order") {
    val rng = new scala.util.Random(7)
    val rows = (1L to 200L).map(i => (rng.nextInt(50).toLong, i))
    val rn = DistributedRank
      .withGlobalRowNumber(rows.toDF("v", "id"), Seq(col("v"), col("id")), 5)
      .collect().map(r => (r.getAs[Long]("v"), r.getAs[Long]("id"), r.getAs[Long]("__rn")))
    assert(rn.map(_._3).sorted.toSeq === (1L to 200L))
    val bySort = rn.sortBy(t => (t._1, t._2)).map(_._3).toSeq
    assert(bySort === (1L to 200L))
  }
}
