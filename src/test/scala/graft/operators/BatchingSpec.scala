package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class BatchingSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private lazy val docs = Seq(
    // group "en": bucket 0 holds lengths {10, 20}, bucket 32 holds {40}
    ("en", 10), ("en", 20), ("en", 40),
    // group "de": one exact-boundary doc — 32 lands in bucket 32
    ("de", 32)
  ).toDF("lang", "len")

  test("buckets by floor(len/width)*width and computes exact waste") {
    val out = Batching.lengthBuckets(docs, col("len"), col("lang"), 32)
      .orderBy("group", "bucket_lo").collect()
    assert(out.length == 3)
    val de = out(0)
    assert(de.getAs[String]("group") == "de")
    assert(de.getAs[Int]("bucket_lo") == 32)
    assert(de.getAs[Double]("pad_waste_pct") == 0.0) // single doc: no pad
    val en0 = out(1)
    assert(en0.getAs[Int]("bucket_lo") == 0)
    assert(en0.getAs[Long]("n_docs") == 2L)
    assert(en0.getAs[Long]("sum_tokens") == 30L)
    assert(en0.getAs[Int]("max_tokens") == 20)
    // padded volume 2·20=40, waste 40−30=10 → 0.25 exactly
    assert(en0.getAs[Double]("pad_waste_pct") == 0.25)
    val en32 = out(2)
    assert(en32.getAs[Int]("bucket_lo") == 32)
    assert(en32.getAs[Long]("n_docs") == 1L)
  }

  test("single shuffle: one partial-aggregated exchange, no window") {
    val plan = Batching.lengthBuckets(docs, col("len"), col("lang"), 32)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    // exactly one exchange (the groupBy), preceded by partial agg
    assert("Exchange".r.findAllIn(plan).size == 1)
    assert(plan.contains("partial_"))
  }

  test("rejects non-positive width") {
    intercept[IllegalArgumentException] {
      Batching.lengthBuckets(docs, col("len"), col("lang"), 0)
    }
  }
}
