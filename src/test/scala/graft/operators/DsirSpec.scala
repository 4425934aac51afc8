package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class DsirSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // target docs speak vocab A, raw-only docs speak vocab B; mixed doc
  // in between — importance weights must order A-docs > mixed > B-docs
  private lazy val corpus = {
    val a = (0 until 20).map(i => (i.toLong, "alpha beta gamma delta", true))
    val b = (20 until 40).map(i => (i.toLong, "omega psi chi phi", false))
    val m = Seq((40L, "alpha beta omega psi", false))
    (a ++ b ++ m).toDF("doc_id", "text", "is_target")
  }

  test("target-like documents score higher than raw-only documents") {
    val w = Dsir.importanceWeights(corpus, "doc_id", "text",
        col("is_target"), buckets = 64)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(w(0L) > w(40L), s"pure-target ${w(0L)} vs mixed ${w(40L)}")
    assert(w(40L) > w(20L), s"mixed ${w(40L)} vs pure-raw ${w(20L)}")
    assert(w(0L) > 0 && w(20L) < 0)
  }

  test("n_grams counts unigrams + adjacent bigrams") {
    val n = Dsir.importanceWeights(corpus, "doc_id", "text",
        col("is_target"), buckets = 64)
      .where($"doc_id" === 0L).select("n_grams").as[Long].head()
    assert(n === 4 + 3)
  }

  test("weights are partitioning-independent (integer statistics)") {
    val a = Dsir.importanceWeights(corpus, "doc_id", "text",
        col("is_target"), buckets = 32)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = Dsir.importanceWeights(corpus.repartition(11), "doc_id",
        "text", col("is_target"), buckets = 32)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("sourceDivergence ranks the divergent source highest") {
    val mixed = (0 until 30).map(i =>
      (s"common text about spark and data $i", if (i % 2 == 0) "a" else "b"))
    val weird = (0 until 15).map(i =>
      (s"zzz qqq xxx vvv kkk jjj $i", "c"))
    val df = (mixed ++ weird).toDF("text", "source")
    val kl = Dsir.sourceDivergence(df, "source", "text", buckets = 64)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(kl("c") > kl("a") && kl("c") > kl("b"),
      s"divergent source must dominate: $kl")
    assert(kl.values.forall(_ >= 0.0), s"KL must be non-negative: $kl")
  }

  test("lambda table is broadcast; no vocabulary-sized join") {
    val plan = Dsir.importanceWeights(corpus, "doc_id", "text",
        col("is_target"), buckets = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("plan stays lazy end-to-end: no eager pin serializing the stages") {
    // r16 adjudication of the qt25 bench regression: lazy 2.04 s vs
    // localCheckpoint 3.14 s vs collect-to-driver 3.07 s at sf0.1 ×5,
    // one window. The lazy plan's stats consumers are independent AQE
    // shuffle stages that materialize concurrently; any eager pin
    // (checkpoint RDD scan or a collected LocalTableScan replacing the
    // λ lineage) serializes behind a barrier job. Pin: the λ side is
    // still real lineage under one AdaptiveSparkPlan — no checkpoint
    // scan node — and the λ join is broadcast.
    val df = Dsir.importanceWeights(corpus, "doc_id", "text",
      col("is_target"), buckets = 64)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan ExistingRDD"), s"eager pin leaked in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }

  test("sourceOverlap: exact pairwise gram Jaccard, identical sources at 1") {
    // a and b are the same 2 docs under two names; c shares nothing
    val df = Seq(
      ("a", "one two three four"), ("a", "five six seven eight"),
      ("b", "one two three four"), ("b", "five six seven eight"),
      ("c", "nine ten eleven twelve")
    ).toDF("source", "text")
    val out = Dsir.sourceOverlap(df, "source", "text", n = 3)
      .orderBy("s1", "s2").collect()
    // only (a, b) overlaps; c pairs are absent entirely
    assert(out.length == 1)
    val ab = out.head
    assert(ab.getAs[String]("s1") == "a" && ab.getAs[String]("s2") == "b")
    assert(ab.getAs[Long]("n_common") == 4L) // 2 grams per 4-token doc
    assert(ab.getAs[Double]("jaccard") == 1.0)
  }

  test("sourceOverlap: no window, partial-aggregated counts") {
    val df = Seq(("a", "x y z"), ("b", "x y z")).toDF("source", "text")
    val plan = Dsir.sourceOverlap(df, "source", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"))
    assert(plan.contains("partial_"))
  }
}
