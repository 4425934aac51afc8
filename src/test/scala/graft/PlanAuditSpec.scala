package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit over the pipeline query surface: at 100 TB a
  * CartesianProduct is a non-starter, so none of the dedup / text /
  * vector queries may plan one — every pairing must reach its
  * counterpart through an equi-join (bucket, digest, cell, term) or an
  * explicitly broadcast small side (which plans as
  * BroadcastNestedLoopJoin with a literal-sized build side — allowed;
  * the three 1-row crossJoins are the accepted pattern).
  *
  * qe01 (brute-force kNN baseline) and qe07 (PQ-without-IVF, the
  * documented negative control) are the two intentional full-scan
  * shapes and are excluded.
  */
class PlanAuditSpec extends AnyFunSuite with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  private val audited = Seq(
    "qt04_dedup_exact", "qt05_dedup_norm", "qt06_fingerprint",
    "qt07_minhash_lsh", "qt08_simhash", "qt09_ngram_jaccard",
    "qt10_stratified_sample", "qt13_decontaminate", "qt14_tfidf",
    "qt16_bloom_decontam", "qt19_passage_dedup", "qt20_unigram_freq",
    "qt21_corpus_shuffle", "qt22_chunking", "qt29_cdc_chunking",
    "qt23_mixture_sample",
    "qt24_heavy_hitters", "qt25_dsir_weights", "qt26_export_manifest",
    "qe02_ann_lsh", "qe03_cosine_neardup",
    "qe05_ann_ivf", "qe08_ann_ivfpq", "qe10_ann_binary",
    "qe11_mips", "qe12_ivf_index")

  for (name <- audited)
    test(s"$name plans no CartesianProduct") {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name planned a cartesian product:\n$plan")
    }
}
