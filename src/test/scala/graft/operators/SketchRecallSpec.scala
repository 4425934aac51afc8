package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Recall gates for the sketch candidate generators over the planted
  * corpus (documents/embeddings at sf0.001 + deterministic
  * near-duplicate copies at id + 1,000,000) — the same corpus the
  * oracle-checked queries use at sf0.01. Every pair above the verify
  * threshold MUST be produced by the candidate stage: the driver's
  * hash-match gate fails on a single miss, so these specs are the fast
  * local predictor.
  */
class SketchRecallSpec extends AnyFunSuite with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  private lazy val corpus: DataFrame = {
    val base = graft.Tables.load(spark, dir, "documents")
      .where(col("doc_id") < 2000).select("doc_id", "text")
    val dupes = base.where(col("doc_id") < 100)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" near duplicate tail marker")).as("text"))
    base.unionByName(dupes).cache()
  }

  /** All pairs at exact n-gram Jaccard >= t (brute force, test-sized). */
  private def truthPairs(t: Double): Set[(Long, Long)] = {
    import spark.implicits._
    val ids = corpus.select("doc_id").as[Long].collect().sorted.toSeq
    val all = (for { a <- ids; b <- ids if a < b } yield (a, b))
      .toDF("id_a", "id_b")
    Dedup.exactJaccardFor(all, corpus, "doc_id", "text", 3)
      .where(col("jaccard") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("MinHash-LSH candidates recall every exact-Jaccard >= 0.8 pair") {
    val truth = truthPairs(0.8)
    assert(truth.nonEmpty, "corpus must contain planted pairs")
    val cands = pairsOf(Dedup.minhashLshCandidates(
      corpus, "doc_id", "text", numHashes = 128, bands = 32))
    val missed = truth -- cands
    assert(missed.isEmpty, s"LSH missed ${missed.size} true pairs: $missed")
  }

  test("winnowing candidates recall every exact-Jaccard >= 0.8 pair") {
    val truth = truthPairs(0.8)
    val cands = pairsOf(Dedup.winnowCandidates(
      corpus, "doc_id", "text", k = 8, w = 16, maxDf = 100))
    val missed = truth -- cands
    assert(missed.isEmpty, s"winnowing missed ${missed.size} true pairs: $missed")
  }

  test("simhash hamming<=7 candidates recall every exact-Jaccard >= 0.95 pair") {
    val truth = truthPairs(0.95)
    val cands = pairsOf(Dedup.simhashPairs(
      corpus, "doc_id", "text", maxHamming = 7, blocks = 8))
    val missed = truth -- cands
    assert(missed.isEmpty, s"simhash missed ${missed.size} true pairs: $missed")
  }

  test("ANN LSH returns the planted noisy copy as the >=0.99 neighbor") {
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val noisy = e.where(col("vec_id") < 10)
      .select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * (lit(1.0) + lit(0.01) * ((i % 5) - 2))).as("embedding"))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = e.unionByName(noisy)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val hits = Similarity.annLsh(q, c, k = 5, tables = 8, bits = 8, minSim = 0.99)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("cid"))
    assert(hits.toSet === (0L until 10L).map(i => i -> (i + 1000000)).toSet)
  }

  test("ANN IVF returns the planted noisy copy as the >=0.99 neighbor") {
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val noisy = e.where(col("vec_id") < 10)
      .select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * (lit(1.0) + lit(0.01) * ((i % 5) - 2))).as("embedding"))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = e.unionByName(noisy)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val hits = Similarity.annIvf(q, c, k = 5, nlist = 32, nprobe = 4,
        minSim = 0.99)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("cid"))
    assert(hits.toSet === (0L until 10L).map(i => i -> (i + 1000000)).toSet)
  }

  test("ANN PQ returns the planted noisy copy as the >=0.99 neighbor") {
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val noisy = e.where(col("vec_id") < 10)
      .select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * (lit(1.0) + lit(0.01) * ((i % 5) - 2))).as("embedding"))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = e.unionByName(noisy)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val hits = Similarity.annPq(q, c, k = 5, m = 8, ksub = 16,
        rerank = 64, minSim = 0.99)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("cid"))
    assert(hits.toSet === (0L until 10L).map(i => i -> (i + 1000000)).toSet)
  }

  test("ANN IVF-PQ returns the planted noisy copy; ADC scan touches only probed cells") {
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val noisy = e.where(col("vec_id") < 10)
      .select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * (lit(1.0) + lit(0.01) * ((i % 5) - 2))).as("embedding"))
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = e.unionByName(noisy)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val hits = Similarity.annIvfPq(q, c, k = 5, nlist = 32, nprobe = 4,
        m = 8, ksub = 16, rerank = 64, minSim = 0.99)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("cid"))
    assert(hits.toSet === (0L until 10L).map(i => i -> (i + 1000000)).toSet)

    // cell-restriction proof: the shortlist's ADC scan reaches
    // candidates through an EQUI-join on cell — no cartesian / nested-
    // loop product anywhere in the physical plan, unlike annPq's
    // full-corpus crossJoin (the negative control below)
    val shortPlan = Similarity.ivfPqShortlist(q, c,
      nlist = 32, nprobe = 4, m = 8, ksub = 16, rerank = 64)
      .queryExecution.executedPlan.toString
    assert(!shortPlan.contains("CartesianProduct") &&
      !shortPlan.contains("BroadcastNestedLoopJoin"), shortPlan)
    val pqPlan = Similarity.annPq(q, c, k = 5)
      .queryExecution.executedPlan.toString
    assert(pqPlan.contains("BroadcastNestedLoopJoin") ||
      pqPlan.contains("CartesianProduct"), pqPlan)
  }

  test("bloom decontamination output equals the exact containment join") {
    val bench = graft.Tables.load(spark, dir, "documents")
      .where(col("doc_id") < 50).select("doc_id", "text")
    def key(df: DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 10000) / 10000)).toSet
    val exact = key(Dedup.containmentPairs(
      corpus, bench, "doc_id", "text", n = 4, threshold = 0.7)
      .select("corpus_id", "bench_id", "containment"))
    val bloom = key(Dedup.bloomDecontaminate(
      spark, corpus, bench, "doc_id", "text", n = 4, threshold = 0.7)
      .select("corpus_id", "bench_id", "containment"))
    assert(bloom === exact)
    assert(exact.nonEmpty)
  }

  test("cosine near-dup pairs find exactly the planted copies") {
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val copies = e.where(col("vec_id") < 20)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    val pairs = Similarity.cosineNearDupPairs(
        e.unionByName(copies), "vec_id", "embedding",
        threshold = 0.95, tables = 8, bits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === (0L until 20L).map(i => (i, i + 1000000)).toSet)
  }

  test("decontamination flags every planted near-copy at containment 1.0") {
    val bench = graft.Tables.load(spark, dir, "documents")
      .where(col("doc_id") < 50).select("doc_id", "text")
    val flagged = Dedup.containmentPairs(corpus, bench, "doc_id", "text",
        n = 3, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every planted copy (bench doc + tail marker) contains 100% of its
    // source's grams
    val copies = flagged.filter { case (c, b, _) => c == b + 1000000 }
    assert(copies.length == 50, s"got ${copies.length} of 50 planted")
    assert(copies.forall(_._3 >= 0.999))
  }

  test("bucket cap bounds candidate fan-out on a degenerate cluster") {
    import spark.implicits._
    // 500 identical vectors: uncapped LSH would yield ~125k pairs
    val clone = (1L to 500L).map(i => (i, Array.fill(16)(0.5f))).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(
      clone, "vec_id", "embedding", threshold = 0.9,
      tables = 4, bits = 4, maxBucket = 100)
    assert(pairs.count() === 0, "capped buckets must drop the degenerate cluster")
  }
}
