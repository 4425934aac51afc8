package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Bucket-capping semantics: the two-pass row-preserving form
  * (dropOversized) and the one-pass collect form (cappedBuckets /
  * cappedPostings / cappedPairs) must agree with the brute-force
  * definition — including NULL-keyed buckets (ADVICE r7: a plain
  * equality anti-join silently exempts NULL keys from the cap) — and
  * must stay correct when the anti-join cannot broadcast.
  */
class BucketCapSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // buckets: "a"×5, "b"×2, null×4, "c"×1 — cap 3 keeps b and c only
  private def postings = Seq(
    ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 5L),
    ("b", 6L), ("b", 7L),
    (null, 8L), (null, 9L), (null, 10L), (null, 11L),
    ("c", 12L)).toDF("k", "id")

  test("dropOversized drops oversized buckets including NULL-keyed ones") {
    val kept = BucketCap.dropOversized(postings, 3, "k")
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(6L, 7L, 12L))
  }

  test("dropOversized keeps small NULL-keyed buckets") {
    val kept = BucketCap.dropOversized(postings, 10, "k")
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == (1L to 12L))
  }

  test("dropOversized without broadcast (shuffle anti-join fallback)") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val kept = BucketCap.dropOversized(postings, 3, "k")
        .select("id").as[Long].collect().sorted
      assert(kept.toSeq == Seq(6L, 7L, 12L))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("dropOversized plans no forced broadcast hint") {
    // the logical plan must carry no ResolvedHint: AQE alone decides
    // broadcast vs shuffle from the aggregated key-set's actual size
    val plan = BucketCap.dropOversized(postings, 3, "k")
      .queryExecution.analyzed.toString
    assert(!plan.contains("ResolvedHint"), plan)
  }

  test("cappedPostings returns the same row set as dropOversized") {
    val a = BucketCap.dropOversized(postings, 3, "k")
      .select("k", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    val b = BucketCap.cappedPostings(postings, 3, "id", "k")
      .select("k", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(a.toSet == b.toSet)
    assert(a.length == b.length)
  }

  test("cappedBuckets boundary: bucket of exactly max survives, max+1 drops") {
    val df = (1L to 7L).map(i => ("x", i)).toDF("k", "id")
    assert(BucketCap.cappedBuckets(df, 7, "id", "k").count() == 1)
    assert(BucketCap.cappedBuckets(df, 6, "id", "k").count() == 0)
  }

  test("cappedBuckets collects every id of a surviving bucket") {
    val ids = BucketCap.cappedBuckets(postings, 4, "id", "k")
      .where(col("k").isNull)
      .select(explode(col("__ids")).as("id")).as[Long].collect().sorted
    assert(ids.toSeq == Seq(8L, 9L, 10L, 11L))
  }

  test("cappedPairs matches brute-force within-bucket pairs") {
    val expected = postings.as[(String, Long)].collect()
      .filter(_._1 != null).groupBy(_._1).filter(_._2.length <= 3)
      .toSeq.flatMap { case (_, rows) =>
        val ids = rows.map(_._2).toSeq
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }.toSet
    val got = BucketCap.cappedPairs(postings, 3, "id", "k")
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("cappedPairs caps NULL-keyed buckets like any other") {
    // cap 4: null bucket (4 ids) survives → its C(4,2)=6 pairs appear
    val got = BucketCap.cappedPairs(postings, 4, "id", "k")
      .as[(Long, Long)].collect().toSet
    val nullPairs = for (a <- 8L to 11L; b <- 8L to 11L if a < b) yield (a, b)
    assert(nullPairs.toSet.subsetOf(got))
    // cap 3: null bucket dropped whole
    val capped = BucketCap.cappedPairs(postings, 3, "id", "k")
      .as[(Long, Long)].collect().toSet
    assert(capped.intersect(nullPairs.toSet).isEmpty)
  }

  test("cappedPairs multiplicity: one row per shared bucket") {
    val df = Seq(("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L))
      .toDF("k", "id")
    val rows = BucketCap.cappedPairs(df, 10, "id", "k")
      .as[(Long, Long)].collect()
    assert(rows.toSeq == Seq((1L, 2L), (1L, 2L)))
  }

  test("bounded_collect buffer is capped: oversized bucket never held") {
    // 100k rows of one key under cap 10: the aggregation buffer holds
    // at most 11 elements (correctness proxy: result drops the bucket;
    // the bound itself is by construction in BoundedCollect.update)
    val big = spark.range(100000).select(lit("hot").as("k"), col("id"))
      .union(Seq(("cold", -1L)).toDF("k", "id"))
    val out = BucketCap.cappedBuckets(big, 10, "id", "k")
    assert(out.select("k").as[String].collect().toSeq == Seq("cold"))
  }

  test("bounded_collect works over string ids") {
    val df = Seq(("k1", "a"), ("k1", "b"), ("k2", "c")).toDF("k", "id")
    val got = BucketCap.cappedPairs(df, 5, "id", "k")
      .as[(String, String)].collect().toSet
    assert(got == Set(("a", "b")))
  }
}
