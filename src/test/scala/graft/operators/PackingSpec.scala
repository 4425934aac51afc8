package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class PackingSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("prefix sum matches the single-partition window oracle") {
    val df = spark.range(10000).select(
      col("id"), ((col("id") * 37) % 100 + 1).as("v"))
    val got = Packing.prefixSum(df, col("id"), col("v"), numPartitions = 8)
      .select("id", "tokens_before").as[(Long, Long)].collect().toMap
    val w = Window.orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("e",
        coalesce(sum("v").over(w), lit(0L)))
      .select("id", "e").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("pack assigns contiguous blocks; per-block token totals ≈ budget") {
    val df = spark.range(5000).select(
      col("id"), ((col("id") * 13) % 400 + 50).as("n"))
    val packed = Packing.pack(df, "id", "n", budget = 4096,
      numPartitions = 8)
    // block ids are dense from 0
    val blocks = packed.select("block_id").distinct()
      .as[Long].collect().sorted
    assert(blocks.head == 0 && blocks.last == blocks.length - 1)
    // every non-final block's span covers exactly the budget boundary:
    // first doc of block b starts at < b*budget + doc tokens ≥ boundary
    val starts = packed.groupBy("block_id")
      .agg(min("tokens_before").as("first_start"))
      .select("block_id", "first_start").as[(Long, Long)].collect()
    starts.foreach { case (b, s) =>
      assert(s < (b + 1) * 4096 && s >= 0)
    }
    // docs crossing a boundary span >1 block
    val spanning = packed.where(col("n_blocks") > 1).count()
    assert(spanning > 0, "fixture must contain boundary-crossing docs")
  }

  test("zero-token docs span exactly 1 block, even on a budget boundary") {
    // ids 0,1 fill block 0 exactly (budget 10); id 2 is empty AT the
    // boundary, id 4 empty mid-block — both must report n_blocks = 1
    val df = Seq((0L, 4L), (1L, 6L), (2L, 0L), (3L, 5L), (4L, 0L))
      .toDF("id", "n")
    val m = Packing.pack(df, "id", "n", budget = 10, numPartitions = 2)
      .select("id", "n_blocks").as[(Long, Int)].collect().toMap
    assert(m(2L) == 1 && m(4L) == 1)
  }

  test("deterministic under repartition") {
    val df = spark.range(3000).select(
      col("id"), ((col("id") * 7) % 90 + 1).as("v"))
    val a = Packing.pack(df, "id", "v", 1024, 8)
      .select("id", "block_id").as[(Long, Long)].collect().sorted.toSeq
    val b = Packing.pack(df.repartition(11), "id", "v", 1024, 8)
      .select("id", "block_id").as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("no single-partition window in the plan") {
    val df = spark.range(100).select(col("id"), lit(5L).as("v"))
    val packed = Packing.prefixSum(df, col("id"), col("v"), 8)
    packed.collect()
    val plan = packed.queryExecution.executedPlan.toString
    // the only window is partitioned by __pid
    assert(plan.contains("windowspecdefinition(__pid"),
      s"expected a __pid-partitioned window:\n$plan")
  }
}
