package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class TfIdfSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "apple apple banana common common common"),
    (2L, "banana cherry common common common"),
    (3L, "cherry date common common common")
  ).toDF("doc_id", "text")

  test("ranks rare high-tf terms above ubiquitous ones") {
    val top = TfIdf.topTerms(corpus, "doc_id", "text", k = 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // 'common' appears in every doc (df=3 ⇒ idf=0); the winner must be
    // each doc's distinctive term
    assert(top(1L) === "apple")   // tf=2, df=1: highest score
    assert(top(2L) === "banana")  // ties cherry (tf=1, df=2) → term asc
    assert(top(3L) === "date")    // df=1 beats cherry's df=2
  }

  test("scores follow tf·ln(N/df); ubiquitous terms score zero") {
    val rows = TfIdf.topTerms(corpus, "doc_id", "text", k = 4)
      .where(col("doc_id") === 1)
      .select("term", "tf", "df", "score")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val apple = rows("apple")
    assert(apple._2 == 2 && apple._3 == 1)
    assert(math.abs(apple._4 - 2 * math.log(3.0)) < 1e-12)
    assert(rows("common")._4 === 0.0)
  }

  test("top-k is deterministic under repartition and exactly k rows per doc") {
    val a = TfIdf.topTerms(corpus, "doc_id", "text", k = 2)
      .select("doc_id", "term").as[(Long, String)].collect().sorted.toSeq
    val b = TfIdf.topTerms(corpus.repartition(7), "doc_id", "text", k = 2)
      .select("doc_id", "term").as[(Long, String)].collect().sorted.toSeq
    assert(a == b)
    assert(a.groupBy(_._1).values.forall(_.size == 2))
  }

  test("precomputed-tf path gives identical results (one-tokenize-pass shape)") {
    val tf = TfIdf.termFrequencies(corpus, "doc_id", "text")
    val nDocs = corpus.agg(countDistinct("doc_id").as("n_docs"))
    val a = TfIdf.topTermsFromTf(tf, nDocs, 3)
      .select("doc_id", "term", "score")
      .as[(Long, String, Double)].collect().sorted.toSeq
    val b = TfIdf.topTerms(corpus, "doc_id", "text", 3)
      .select("doc_id", "term", "score")
      .as[(Long, String, Double)].collect().sorted.toSeq
    assert(a == b)
  }

  test("top-k windows are doc-partitioned with group-limit pushdown") {
    val df = TfIdf.topTerms(corpus, "doc_id", "text", k = 3)
    df.collect() // AQE finalizes the plan on execution
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected rank<=k pushed into a WindowGroupLimit:\n$plan")
    assert(!plan.contains("No Partition Defined"),
      "window must never collapse to a single partition")
  }

  test("vocabStats: exact types/tokens/hapax per group") {
    val byGroup = Seq(
      ("s1", 1L, "apple apple banana"),     // s1: tokens=5, types=3
      ("s1", 2L, "apple cherry"),           //   apple×3 banana×1 cherry×1
      ("s2", 3L, "date date date")          // s2: 3 tokens, 1 type, 0 hapax
    ).toDF("source", "doc_id", "text")
    val out = TfIdf.vocabStats(byGroup, "doc_id", "text", "source")
      .orderBy("group").collect()
    val s1 = out(0)
    assert(s1.getAs[Long]("n_docs") == 2L)
    assert(s1.getAs[Long]("n_tokens") == 5L)
    assert(s1.getAs[Long]("n_types") == 3L)
    assert(s1.getAs[Long]("n_hapax") == 2L) // banana, cherry
    assert(s1.getAs[Double]("ttr") == 0.6)  // 3/5 exactly
    val s2 = out(1)
    assert(s2.getAs[Long]("n_types") == 1L)
    assert(s2.getAs[Long]("n_hapax") == 0L)
    assert(s2.getAs[Double]("hapax_ratio") == 0.0)
  }

  test("vocabStats: hot-term count is a partial-aggregated groupBy, not a window") {
    val byGroup = Seq(("s1", 1L, "a b c")).toDF("source", "doc_id", "text")
    val plan = TfIdf.vocabStats(byGroup, "doc_id", "text", "source")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert(plan.contains("partial_"))
  }
}
