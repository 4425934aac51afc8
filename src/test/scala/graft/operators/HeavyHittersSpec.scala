package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.functions.Aggregators

class HeavyHittersSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // zipf-ish corpus: term i appears ~N/i times, plus a long tail of
  // singletons that would bloat a full groupBy's shuffle
  private lazy val corpus = {
    val head = (1 to 50).flatMap(i => Seq.fill(2000 / i)(s"term$i"))
    val tail = (1 to 5000).map(i => s"rare$i")
    (head ++ tail).grouped(40).map(_.mkString(" ")).toSeq
      .toDF("text")
  }

  test("topK matches the exact full-vocabulary top-k") {
    val got = HeavyHitters.topK(corpus, "text", k = 10, capacity = 256)
      .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
    val want = corpus
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("term"))
      .where(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(10)
      .as[(String, Long)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) === want)
    assert(got.map(_._3) === (1 to 10))
  }

  test("result is partitioning-independent even though the sketch isn't") {
    val a = HeavyHitters.topK(corpus, "text", 5, capacity = 64)
      .as[(String, Long, Int)].collect().toSeq
    val b = HeavyHitters.topK(corpus.repartition(17), "text", 5,
        capacity = 64)
      .as[(String, Long, Int)].collect().toSeq
    assert(a.sortBy(_._3) === b.sortBy(_._3))
  }

  test("MG guarantee: every term with freq > N/(m+1) survives the sketch") {
    val n = 20000
    val stream = (0 until n).map { i =>
      if (i % 3 == 0) "hot1" else if (i % 5 == 1) "hot2"
      else s"noise${i % 997}"
    }
    val m = 50
    val cand = stream.toDF("term")
      .repartition(13)
      .agg(Aggregators.misraGries(m)(col("term")).as("c"))
      .select(explode(col("c")).as("t")).as[String].collect().toSet
    // hot1 ≈ n/3, hot2 ≈ n/5, both ≫ n/(m+1) ≈ 392
    assert(cand.contains("hot1") && cand.contains("hot2"))
    assert(cand.size <= m)
  }

  test("decrement path keeps the buffer at capacity on all-distinct input") {
    val cand = (1 to 10000).map(i => s"u$i").toDF("term")
      .coalesce(1)
      .agg(Aggregators.misraGries(8)(col("term")).as("c"))
      .select(size(col("c"))).as[Int].head()
    assert(cand <= 8)
  }

  test("candidate count is broadcast-joined; no vocabulary-sized shuffle") {
    val plan = HeavyHitters.topK(corpus, "text", 10, capacity = 256)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("capacity below k is rejected") {
    intercept[IllegalArgumentException] {
      HeavyHitters.topK(corpus, "text", k = 50, capacity = 20)
    }
  }
}
