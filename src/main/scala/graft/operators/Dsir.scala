package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Hashed n-gram importance weights — the DSIR recipe (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * public): score each raw document by how much its hashed-ngram
  * feature distribution looks like a TARGET corpus versus the RAW
  * corpus, then keep/resample the high-weight docs. The classic
  * cheap-proxy alternative to classifier-based quality filtering.
  *
  * Features: unigrams + adjacent bigrams of the corpus-wide whitespace
  * tokenizer, hashed into `buckets` bins via the first 8 hex chars of
  * md5 (the same cross-engine-exact hash the samplers use). Per-bucket
  * log-likelihood ratio with add-one smoothing:
  *
  *   λ_b = ln((ct_b+1)/(Tt+B)) − ln((cr_b+1)/(Tr+B))
  *
  * and a document's weight is Σ_b n_db·λ_b over its bucket counts.
  *
  * Exactness: every count (ct, cr, Tt, Tr, n_db) is an integer
  * aggregate, so λ_b is a pure function of identical integers on any
  * engine; the only float accumulation is the final per-doc Σ, emitted
  * rounded to 4dp (same policy as TF-IDF scores).
  *
  * Scale shape for 100 TB: gram explosion is map-side; bucket stats
  * partial-aggregate to ≤ buckets·partitions shuffled rows; λ is a
  * `buckets`-row broadcast; the only corpus-sized shuffles are keyed on
  * (doc, bucket) and doc — no vocabulary-sized state anywhere, which is
  * the point of hashing the n-gram space down to `buckets` bins.
  */
object Dsir {

  /** (doc_id, n_grams, weight) per document; `targetPred` marks the
    * rows whose distribution defines the target (e.g. a trusted
    * high-quality subset).
    */
  def importanceWeights(
      corpus: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val b = lit(buckets.toDouble)
    val grams = corpus
      .select(col(idCol).as("doc_id"), targetPred.as("__tgt"),
        explode(TF.letBind(TF.tokens(col(textCol)),
          toks => concat(toks, TF.bigrams(toks)))).as("g"))
      .select(col("doc_id"), col("__tgt"),
        (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long")
          % buckets).as("bucket"))
    val stats = grams.groupBy("bucket").agg(
      count(lit(1)).as("cr"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"))
    // No eager pin here, deliberately — measured r16 at sf0.1 ×5 in
    // one window: lazy 2.04 s vs localCheckpoint 3.14 s vs
    // collect-to-driver 3.07 s. The lazy plan does re-run the gram
    // explosion per stats consumer, but those are INDEPENDENT AQE
    // query stages (per-doc counts, λ-side stats, tot-side stats) that
    // materialize concurrently across the executor cores; an eager pin
    // serializes everything behind its barrier job and loses more than
    // the saved map pass. Explosion work is map-side and cheap next to
    // the doc-keyed shuffle either way.
    val tot = stats.agg(sum("cr").as("tr"), sum("ct").as("tt"))
    val lam = stats.crossJoin(broadcast(tot))
      .select(col("bucket"),
        (log((col("ct") + lit(1.0)) / (col("tt") + b)) -
          log((col("cr") + lit(1.0)) / (col("tr") + b))).as("lam"))
    grams.groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
      .join(broadcast(lam), "bucket")
      .groupBy("doc_id")
      .agg(sum("n").as("n_grams"),
        round(sum(col("n") * col("lam")), 4).as("weight"))
  }

  /** Per-source distribution drift: KL(Pₛ ‖ P_corpus) over the same
    * hashed-unigram buckets, add-one smoothed — the corpus-profiling
    * counterpart of [[importanceWeights]] (which source's language has
    * shifted away from the corpus mix; the monitoring signal batch
    * pipelines alert on between crawls).
    *
    * The sum runs over the FULL source×bucket grid (zero-count buckets
    * contribute their smoothed mass — dropping them would understate
    * divergence for narrow sources), built by exploding `buckets`
    * literals per source: sources×buckets rows, metadata-sized.
    * After the one corpus-wide (source, bucket) count, everything is
    * arithmetic on that small grid. Output weight is rounded to 4dp
    * (summation-order policy of [[importanceWeights]]).
    */
  def sourceDivergence(
      corpus: DataFrame, sourceCol: String, textCol: String,
      buckets: Int = 128): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val b = lit(buckets.toDouble)
    val counts = corpus
      .select(col(sourceCol).as("source"),
        explode(TF.tokens(col(textCol))).as("g"))
      .select(col("source"),
        (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long")
          % buckets).as("bucket"))
      .groupBy("source", "bucket").agg(count(lit(1)).as("n"))
      // ≤ sources × buckets rows, but its LINEAGE is the whole corpus
      // tokenization — and four downstream references (the source
      // grid's distinct, `full`, and both marginals) would each
      // re-run it. localCheckpoint pins the tiny aggregate so the
      // corpus tokenizes exactly once (the qt51/qi25 lesson applied
      // at the operator, where every caller inherits it).
      .localCheckpoint()
    val grid = counts.select("source").distinct()
      .crossJoin(broadcast(
        corpus.sparkSession.range(buckets).select(col("id").as("bucket"))))
    val full = grid.join(counts, Seq("source", "bucket"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val corpusBucket = full.groupBy("bucket").agg(sum("n").as("nb"))
    val totals = full.groupBy("source").agg(sum("n").as("ts"))
    val grand = corpusBucket.agg(sum("nb").as("t"))
    full.join(broadcast(corpusBucket), "bucket")
      .join(broadcast(totals), "source")
      .crossJoin(broadcast(grand))
      .select(col("source"), col("ts"),
        ((col("n") + lit(1.0)) / (col("ts") + b)).as("p"),
        ((col("nb") + lit(1.0)) / (col("t") + b)).as("q"))
      .groupBy("source")
      .agg(first("ts").as("n_tokens"),
        round(sum(col("p") * log(col("p") / col("q"))), 4).as("kl"))
  }

  /** Pairwise cross-source n-gram overlap matrix — the corpus-health
    * report that answers "which of my sources are the same data":
    * distinct word-n-gram Jaccard for every source pair that shares at
    * least one gram. [[sourceDivergence]] positions each source
    * against the corpus mixture; this positions sources against EACH
    * OTHER, which is what catches a crawl ingested twice under two
    * names before dedup spends a cluster pass proving it.
    * Beyond-reference.
    *
    * Scale shape: one distinct over (source, gram-hash) postings
    * (map-side combine — repeated grams within a source collapse per
    * mapper), then a gram-keyed self-join whose per-key fan-out is
    * bounded by the SOURCE count (a gram pairs at most C(|S|,2) ways —
    * |S| is tens, not corpus-sized), then a (s1, s2)-keyed count with
    * partial aggregation. Grams travel as xxhash64 digests (the
    * [[Dedup.shingleHashes]] contract: 64-bit collisions are noise at
    * any realistic vocabulary; the oracle replays with raw gram
    * strings and has matched every gram operator since qt06).
    *
    * @return (s1, s2, n1, n2, n_common, jaccard) with s1 < s2, only
    *         pairs with n_common > 0
    */
  def sourceOverlap(
      corpus: DataFrame, sourceCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    require(n > 0, s"sourceOverlap: gram size must be positive, got $n")
    val grams = corpus
      .select(col(sourceCol).as("source"),
        explode(graft.operators.Dedup.shingleHashes(col(textCol), n))
          .as("g"))
      .distinct()
    val sizes = grams.groupBy("source").agg(count(lit(1)).as("n1"))
    val inter = grams.select(col("source").as("s1"), col("g"))
      .join(grams.select(col("source").as("s2"), col("g")), "g")
      .where(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("source").as("s1"), col("n1")), "s1")
      .join(sizes.select(col("source").as("s2"), col("n1").as("n2")), "s2")
      .select(col("s1"), col("s2"), col("n1"), col("n2"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("n1") + col("n2") - col("n_common")), 4).as("jaccard"))
  }
}
