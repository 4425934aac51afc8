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
  * qe01 (brute-force kNN baseline), qe07 (PQ-without-IVF, the
  * documented negative control) and qe13 (brute-force kNN classify —
  * compose majorityVote with an index probe for the corpus-sized
  * direction) are the intentional full-scan shapes and are excluded.
  */
class PlanAuditSpec extends AnyFunSuite with SparkTest {

  private val dir = "/root/testdata/sf0.001"

  private val audited = Seq(
    "qt04_dedup_exact", "qt05_dedup_norm", "qt06_fingerprint",
    "qt07_minhash_lsh", "qt08_simhash", "qt09_ngram_jaccard",
    "qt10_stratified_sample", "qt13_decontaminate", "qt38_contamination",
    "qt14_tfidf",
    "qt16_bloom_decontam", "qt19_passage_dedup", "qt20_unigram_freq",
    "qt21_corpus_shuffle", "qt22_chunking", "qt29_cdc_chunking",
    "qt23_mixture_sample", "qt30_substring_dedup", "qt31_quality_rules",
    "qt34_perplexity", "qt36_ccnet_buckets", "qt37_topic_cells",
    "qt24_heavy_hitters", "qt25_dsir_weights", "qt26_export_manifest",
    "qe02_ann_lsh", "qe03_cosine_neardup",
    "qe05_ann_ivf", "qe08_ann_ivfpq", "qe10_ann_binary",
    "qe11_mips", "qe12_ivf_index", "qe14_kmeans", "qe15_semdedup",
    "qt39_bigram_lm", "qe16_truncated_rerank", "qe17_ood_distance",
    "qt40_nb_quality", "qe18_cluster_sample",
    "qt41_length_buckets", "qt42_vocab_growth", "qt43_source_overlap",
    "qt44_incremental_dedup", "qe19_hard_negatives", "qe20_mmr_diversify",
    "qe21_semantic_filter",
    "qt45_domain_cap", "qt46_curriculum", "qt47_ngram_novelty",
    "qt48_fertility", "qt49_source_epochs", "qe22_truncation_recall",
    "qe23_hybrid_rrf", "qi18_rollup", "qe24_filtered_ann",
    "qe25_maxsim",
    "qt50_token_budget", "qt51_selection_bias", "qt52_canonical_dedup",
    "qe26_cluster_eval", "qe27_silhouette", "qt53_interp_lm",
    "qt54_readability", "qt55_decontam_apply", "qe28_kcenter_diverse",
    "qt56_leakage_split", "q44_burst_detect", "q45_funnel",
    "q46_retention", "qe29_sim_histogram", "qt57_len_quality_corr",
    "q47_transitions", "q48_active_users")

  for (name <- audited)
    test(s"$name plans no CartesianProduct") {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name planned a cartesian product:\n$plan")
    }

  test("qi23 pruned aggregate scans 2 of the 300 wide columns") {
    // the verdict r12 task-5 pin: column pruning must reach the
    // parquet scan through the full collect pipeline — a 300-column
    // table read for a 2-column aggregate reads 2 columns
    SparkEntry.queries("qi23_wide_collect")(spark, dir).collect()
    val plan = graft.queries.IngestQueries.widePruned(spark, dir)
      .queryExecution.executedPlan.toString
    val rs = """ReadSchema: [^\n]*""".r.findFirstIn(plan)
      .getOrElse(fail(s"no ReadSchema in plan:\n${plan.take(2000)}"))
    assert(rs.contains("c007") && rs.contains("c300"), rs)
    assert(!rs.contains("c001") && !rs.contains("c299") &&
      !rs.contains("meta") && !rs.contains("tags"), rs)
  }

  // ---------------------------------------------------------------
  // Bucket-cap plan shape: the "drop oversized buckets" step of every
  // candidate generator must be the ONE-PASS bounded-collect aggregate
  // (BucketCap.cappedBuckets), never a window count — WindowExec has no
  // partial aggregation, so a window-count cap shuffles the entire
  // hottest bucket into one task before dropping it — and never the
  // two-pass count + anti-join + self-join, which plans the upstream
  // (corpus scan, shingling, signature aggregation) FOUR times (the r7
  // bench measured its consumers 1.2–1.6× slower for exactly that).
  // Assertions: no Window node, no anti-join, and the pure candidate
  // generators evaluate the corpus exactly once (one FileScan).
  // ---------------------------------------------------------------

  import org.apache.spark.sql.functions._

  private lazy val docs = spark.read
    .parquet(s"$dir/documents.parquet").limit(200)
  private lazy val embs = spark.read
    .parquet(s"$dir/embeddings.parquet").limit(200)

  private def candidateGenerators = Seq[(String, () => org.apache.spark.sql.DataFrame)](
    "winnowCandidates" -> (() =>
      graft.operators.Dedup.winnowCandidates(docs, "doc_id", "text")),
    "minhashLsh" -> (() =>
      graft.operators.Dedup.minhashLsh(docs, "doc_id", "text")),
    "simhashPairs" -> (() =>
      graft.operators.Dedup.simhashPairs(docs, "doc_id", "text")),
    "ngramJaccardPairs" -> (() =>
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text")))

  for ((name, gen) <- candidateGenerators)
    test(s"$name candidate generation plans no Window node") {
      val plan = gen().queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name caps buckets through a window:\n$plan")
    }

  for ((name, gen) <- candidateGenerators)
    test(s"$name caps buckets one-pass (bounded collect, no anti-join)") {
      val plan = gen().queryExecution.executedPlan.toString
      assert(plan.contains("graft_bounded_collect"),
        s"$name does not cap via the one-pass bounded collect:\n$plan")
      assert(!plan.contains("LeftAnti"),
        s"$name caps buckets through a two-pass anti-join:\n$plan")
    }

  // The pure candidate-set generators touch the corpus exactly once:
  // signatures → capped buckets → exploded pairs is one linear plan.
  // (minhashLsh/simhashPairs re-attach signatures per surviving pair,
  // so their full plans legitimately scan more than once.)
  for ((name, gen) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
    "minhashLshCandidates" -> (() =>
      graft.operators.Dedup.minhashLshCandidates(docs, "doc_id", "text")),
    "winnowCandidates" -> (() =>
      graft.operators.Dedup.winnowCandidates(docs, "doc_id", "text")))) {
    test(s"$name evaluates the corpus exactly once") {
      val plan = gen().queryExecution.executedPlan.toString
      val scans = plan.linesIterator.count(_.contains("FileScan"))
      assert(scans == 1,
        s"$name plans $scans corpus scans (expected 1):\n$plan")
    }
  }

  test("bucketed co-located join plans ZERO exchanges") {
    // the property bucketing exists for: two tables bucketed on the
    // join key, joined and aggregated ON that key, must plan with no
    // ShuffleExchange (and the pinned merge join means no
    // BroadcastExchange either) — scan → sort → SMJ → agg, end to end
    // run the query entry once for the bucketed-table setup, then audit
    // the join+agg WITHOUT the entry's final presentation orderBy — a
    // global sort legitimately plans one rangepartitioning exchange for
    // output ordering; the property bucketing buys is that the join and
    // the same-key aggregate themselves move zero rows
    SparkEntry.queries("qi17_bucketed_join")(spark, dir)
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val o = spark.table(s"graft_bkt_orders_$tag")
    val c = spark.table(s"graft_bkt_customer_$tag")
    val df = o.join(c.hint("merge"), o("o_custkey") === c("c_custkey"))
      .groupBy(org.apache.spark.sql.functions.col("c_custkey"),
        org.apache.spark.sql.functions.col("c_mktsegment"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_orders"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join plans an exchange:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      s"bucketed join did not plan the pinned merge join:\n$plan")
  }

  test("truncatedRerank survivor top-k compiles to WindowGroupLimit") {
    // both cut points (prefix top-m and final top-k) are rank filters
    // over (score desc, id) — they must push per-mapper partial top-k
    // (InferWindowGroupLimit), not sort whole per-query groups
    val q = embs.select(col("vec_id").as("qid"),
      col("embedding").as("qvec"))
    val c = embs.select(col("vec_id").as("cid"),
      col("embedding").as("cvec"))
    val plan = graft.operators.Similarity
      .truncatedRerank(q.limit(5), c, k = 3, prefixDim = 16, m = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"truncatedRerank lost its WindowGroupLimit:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("budgetSelect's running total is the __pid-partitioned two-pass " +
    "prefix sum, never a single-partition window") {
    val df = spark.range(500).select(col("id"),
      (col("id") % 7 + 1).cast("int").as("toks"))
    val sel = graft.operators.Sampling.budgetSelect(
      df, Seq(col("id")), "toks", 900L)
    sel.collect()
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__pid"),
      s"budgetSelect lost the two-pass prefix sum:\n$plan")
  }

  test("canonical-dedup keeper argmax compiles to WindowGroupLimit") {
    // qt52's per-component best-quality pick is a rank-1 filter over
    // (quality desc, id) — it must push per-mapper partial top-1, not
    // sort whole components in one task
    val labeled = spark.range(100).select(col("id"),
      (col("id") % 10).as("component"),
      (col("id") % 13).cast("double").as("quality"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("component")
      .orderBy(col("quality").desc, col("id").asc)
    val keepers = labeled
      .withColumn("__rk", org.apache.spark.sql.functions.row_number().over(w))
      .where(col("__rk") === 1)
    val plan = keepers.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"keeper argmax lost its WindowGroupLimit:\n$plan")
  }

  test("weightedSample grouped top-k compiles to WindowGroupLimit") {
    // the rank<=k filter must push a per-mapper partial top-k below
    // the shuffle (Spark's InferWindowGroupLimit); a plain WindowExec
    // would sort entire strata per task
    val plan = graft.operators.Sampling.weightedSample(
        docs, "doc_id", "n_chars", k = 5, strataCol = Some("source"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"grouped weightedSample lost its WindowGroupLimit:\n$plan")
  }

  test("clusterSample per-cell top-k compiles to WindowGroupLimit") {
    // same property for the cluster-balanced sample: the perCell rank
    // filter must push a per-mapper partial top-k, never sort whole
    // cells in one task
    val plan = graft.operators.KMeans.clusterSample(
        embs, "vec_id", "embedding", k = 4, iters = 1, perCell = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"clusterSample lost its WindowGroupLimit:\n$plan")
  }

  test("substringDedup plans three corpus evaluations, all map-side") {
    // gram postings feed BOTH the duplicated-gram aggregate and the
    // probe join, and the token arrays feed the final rebuild — three
    // evaluations of a cheap codegen'd projection (split + hash), each
    // a streaming map-side pass, traded against persisting the
    // exploded postings (k× the corpus) at 100 TB. Pin the shape so a
    // refactor doesn't silently grow it.
    val plan = graft.operators.Dedup
      .substringDedup(docs, "doc_id", "text", k = 8)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan"))
    assert(scans == 3, s"substringDedup plans $scans scans (expected 3):\n$plan")
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"))
  }

  test("noveltyScore plans two corpus evaluations, both map-side") {
    // postings feed the vocabulary-sized df aggregate AND the probe
    // join — two streaming evaluations of the codegen'd split+hash
    // projection (the substringDedup trade). Pin the shape.
    val plan = graft.operators.Dedup
      .noveltyScore(docs, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan"))
    assert(scans == 2, s"noveltyScore plans $scans scans (expected 2):\n$plan")
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"))
  }

  test("perplexity plans two corpus evaluations after the eager LM scalars") {
    // the LM normalizer (N, V) is computed eagerly at build time; the
    // returned plan evaluates the token projection twice (count-table
    // side and probe side of the token join) — both map-side. Pin it.
    val plan = graft.operators.Perplexity(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan"))
    assert(scans == 2, s"perplexity plans $scans scans (expected 2):\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("hardNegatives pool cut compiles to WindowGroupLimit with the " +
      "label filter inside the broadcast join") {
    val q = embs.limit(5).select(col("vec_id").as("qid"),
      col("embedding").as("qvec"), col("label").as("qlabel"))
    val c = embs.select(col("vec_id").as("cid"),
      col("embedding").as("cvec"), col("label").as("clabel"))
    val plan = graft.operators.Similarity.hardNegatives(q, c, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"hardNegatives lost its WindowGroupLimit:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("mmrDiversify greedy steps never plan a cartesian product and " +
      "keep every window qid-partitioned") {
    val q = embs.limit(3).select(col("vec_id").as("qid"),
      col("embedding").as("qvec"))
    val c = embs.select(col("vec_id").as("cid"),
      col("embedding").as("cvec"))
    val plan = graft.operators.Similarity
      .mmrDiversify(q, c, k = 3, lam = 0.5, pool = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"mmr planned a cartesian product:\n$plan")
    assert(!plan.contains("No Partition Defined"),
      "mmr window must never collapse to a single partition")
  }

  test("qt07 serves the persisted verified-pairs artifact, not the " +
    "sketch chain") {
    // the four chain queries share one LSH→verify computation: after
    // the artifact exists, qt07's own plan must be a parquet read of
    // the pairs store — no minhash aggregation, no shingling — which
    // is what makes qt18/qt52/qt56 load instead of recompute
    val df = SparkEntry.queries("qt07_minhash_lsh")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("verified_pairs_planted"),
      s"qt07 does not read the pairs artifact:\n${plan.take(1500)}")
    assert(!plan.toLowerCase.contains("minhash"),
      "qt07 replanned the sketch chain instead of reading the artifact")
  }

  test("annLsh plans no Window over LSH buckets (rank-only windows)") {
    val q = embs.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .limit(5)
    val c = embs.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val plan = graft.operators.Similarity.annLsh(q, c, 3)
      .queryExecution.executedPlan.toString
    val bucketWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("bucket"))
    assert(bucketWindows.isEmpty,
      s"annLsh caps postings through a window:\n${bucketWindows.mkString("\n")}")
  }
}
