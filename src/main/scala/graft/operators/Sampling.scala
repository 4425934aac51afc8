package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (builder brief:
  * large-scale pipeline operations beyond the reference surface).
  *
  * Spark's `sample`/`sampleBy` are seeded-RNG: reproducible only
  * within one engine, partitioning-sensitive, and impossible for an
  * external system to audit. These operators decide membership from
  * the MD5 of the row's id instead — a pure, codegen'd projection:
  *
  *  - no shuffle, no RNG state, stable under repartitioning/retries;
  *  - any engine (DuckDB, Trino, a Python auditor) reproduces the
  *    exact row set from (id, fraction) alone;
  *  - sampling composes with incremental ingest: a row's membership
  *    never changes as the corpus grows — critical when the 100 TB
  *    corpus is collected over months but the train/eval split must
  *    stay frozen.
  *
  * The first 8 hex chars of md5 are compared against fraction·16^8;
  * granularity 1/2^32 ≈ 2.3e-10 of exact, far below sampling noise.
  */
object Sampling {

  /** `[0,1)` uniform value derived from the id column (codegen'd). */
  def hashUnit(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0 // 16^8

  /** Keep ~`fraction` of rows, deterministically by id. */
  def uniform(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.where(hashUnit(col(idCol)) < fraction)
  }

  /** Per-stratum fractions (e.g. lang → rate): rebalance a corpus by
    * downsampling overrepresented strata. Strata absent from the map
    * keep `default`.
    */
  def stratified(
      df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], default: Double = 1.0): DataFrame = {
    val rate = fractions.foldLeft(lit(default)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.where(hashUnit(col(idCol)) < rate)
  }

  /** Frozen train/eval split: every id lands in exactly one side,
    * forever, on every engine. Returns the df with an `is_eval` flag
    * column (filter on it for either side).
    */
  def withSplit(
      df: DataFrame, idCol: String, evalFraction: Double,
      flagCol: String = "is_eval"): DataFrame =
    df.withColumn(flagCol, hashUnit(col(idCol)) < evalFraction)

  /** Stable shard assignment in [0, n) for training export: balanced in
    * expectation, a pure function of the id (a shard's membership never
    * changes as the corpus grows — rows only get ADDED to shards), and
    * reproducible by any engine. Partition the write by this column to
    * get n stable output shards.
    */
  def withShard(
      df: DataFrame, idCol: String, n: Int,
      shardCol: String = "shard"): DataFrame = {
    require(n > 0, "shard count must be positive")
    df.withColumn(shardCol,
      floor(hashUnit(col(idCol)) * n).cast("int"))
  }

  /** Temperature-scaled multinomial source mixing — the "α-sampling"
    * data-mixture step multilingual/multi-source pretraining uses
    * (public recipe: sample source s with probability ∝ nₛ^α, α<1
    * upweights small sources; α=1 is natural frequency). Returns the
    * rows selected when drawing ~`budget` documents from that mixture,
    * decided per-row by the same deterministic md5 unit as the other
    * samplers: rateₛ = min(1, budget·pₛ/nₛ).
    *
    * Exactness by construction: the only order-sensitive float step is
    * the sum of per-source weights, which is computed as an ORDERED
    * window total over the source-cardinality table (sum the sqrt/pow
    * weights in source-lexicographic order), so any engine reproduces
    * the identical double — the oracle mirrors it with
    * `sum(w ORDER BY source)`. The window is over the per-source count
    * relation (dozens of rows, metadata-sized), never the corpus, so
    * the single-partition window rule for corpus-sized data holds.
    *
    * Scale: one partial-aggregated groupBy over the corpus (source
    * cardinality output), a broadcast join of the rate table, and a
    * codegen'd filter — no corpus-sized shuffle at any size.
    */
  def temperatureMixture(
      df: DataFrame, idCol: String, sourceCol: String,
      alpha: Double, budget: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"alpha must be in [0,1], got $alpha")
    require(budget > 0, s"budget must be positive, got $budget")
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", pow(col("__n").cast("double"), alpha))
    // bare global window is safe HERE ONLY: `counts` has one row per
    // SOURCE (domain count, not corpus size), so the single partition
    // WindowExec warns about holds a handful of rows; the ordered frame
    // keeps the weight total a deterministic sum for the oracle
    val total = Window.orderBy(sourceCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rates = counts
      .withColumn("__tw", sum("__w").over(total))
      .withColumn("__rate",
        least(lit(1.0),
          lit(budget.toDouble) * col("__w") /
            (col("__tw") * col("__n").cast("double"))))
      .select(col(sourceCol), col("__rate"))
    df.join(broadcast(rates), sourceCol)
      .where(hashUnit(col(idCol)) < col("__rate"))
      .drop("__rate")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis 2006,
    * algorithm A-ES): each row draws key `u^(1/w)` from its
    * deterministic hash-unit `u` and weight `w`; the k largest keys
    * are an exact weighted sample without replacement. The pipeline
    * use: quality- or length-weighted corpus subsampling where high-
    * weight documents must be favored but the draw must stay
    * reproducible across engines and retries (u comes from md5(id),
    * not a RNG).
    *
    * Scale shape: ungrouped, the plan is TakeOrderedAndProject —
    * k-bounded driver state, no global sort. Grouped (per-stratum),
    * the rank-filter compiles to WindowGroupLimit (Spark 3.5+):
    * partial per-mapper top-k BEFORE the shuffle, so per-task state is
    * k-bounded even when one stratum dominates the corpus — pinned by
    * PlanAuditSpec. Rows with NULL or non-positive weight never
    * qualify (A-ES is undefined there); the id rides as the total-
    * order tiebreaker.
    */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      strataCol: Option[String] = None): DataFrame = {
    require(k >= 1, s"weightedSample: k must be >= 1, got $k")
    val key = pow(hashUnit(col(idCol)),
      lit(1.0) / col(weightCol).cast("double"))
    val base = df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__es", key)
    val sampled = strataCol match {
      case None =>
        base.orderBy(col("__es").desc, col(idCol)).limit(k)
      case Some(s) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(s).orderBy(col("__es").desc, col(idCol))
        base.withColumn("__rk", row_number().over(w))
          .where(col("__rk") <= k).drop("__rk")
    }
    sampled.drop("__es")
  }

  /** Per-group document cap — the RefinedWeb/C4 "host-level cap" step:
    * no single domain (source, site, license bucket, …) may contribute
    * more than `n` documents, keeping the best ones by `order`. This is
    * the anti-monoculture gate web-corpus pipelines run after dedup:
    * without it one boilerplate-heavy host dominates the mixture.
    *
    * Scale shape: `row_number <= n` over a groupKeys-partitioned
    * window compiles to WindowGroupLimit (Spark 3.5+) — per-mapper
    * partial top-n BEFORE the shuffle, so per-task state is n-bounded
    * even when one domain holds billions of rows; the shuffle carries
    * at most n·mappers rows per group, never the full group. Pinned by
    * PlanAuditSpec alongside [[weightedSample]]'s grouped path.
    *
    * Determinism: callers pass a total `order` (score desc + id
    * tiebreak) so the kept set is oracle-reproducible.
    *
    * @param order total order within a group; FIRST rows are kept
    * @return input rows that survive the cap, plus `rankCol` (1..n)
    */
  def groupCap(
      df: DataFrame, groupKeys: Seq[String], order: Seq[Column], n: Int,
      rankCol: String = "cap_rank"): DataFrame = {
    require(n >= 1, s"groupCap: n must be >= 1, got $n")
    require(groupKeys.nonEmpty, "groupCap: need at least one group key")
    val w = Window.partitionBy(groupKeys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w))
      .where(col(rankCol) <= n)
  }

  /** Epoch mixing with fractional repeats — the data-recipe step that
    * realizes per-source epoch counts (public recipes: LLaMA's
    * "Wikipedia 2.45 epochs, CommonCrawl 0.67 epochs" table): each row
    * is replicated `floor(w)` times plus one more with probability
    * `frac(w)`, where `w` comes from `weightCol` (typically a
    * broadcast-joined per-source weight). The fractional coin is the
    * same deterministic md5 unit as the samplers — membership of the
    * extra copy is a pure function of (id), so the realized corpus is
    * reproducible across engines, retries, and incremental growth.
    *
    * Scale shape: a codegen'd projection (copies column) plus
    * `explode(sequence(1, copies))` — per-row fan-out bounded by
    * ceil(w), no shuffle introduced; rows with copies = 0 are filtered
    * before the explode. Downstream shuffling (the corpus shuffle
    * before sharding) treats each copy as an independent row via the
    * `epoch_copy` index.
    *
    * @return one row per realized copy, with `epoch_copy` (1-based)
    */
  def epochMix(
      df: DataFrame, idCol: String, weightCol: String,
      copyCol: String = "epoch_copy"): DataFrame = {
    val w = col(weightCol).cast("double")
    val copies = (floor(w) +
      when(hashUnit(col(idCol)) < (w - floor(w)), 1).otherwise(0))
      .cast("int")
    df.withColumn("__copies", copies)
      .where(col("__copies") > 0)
      .withColumn(copyCol, explode(sequence(lit(1), col("__copies"))))
      .drop("__copies")
  }

  /** Budget-constrained greedy selection — "give me the best documents
    * that fit N training tokens", the knapsack-by-density cut every
    * token-budgeted data recipe ends with (quality-ranked corpus,
    * fixed compute budget). Rows are laid out in `orderKey` order
    * (a TOTAL order, best-first — encode descending value
    * monotonically, e.g. `1.0 - quality`, and ride the id along as
    * tiebreaker) and kept while the running `tokenCol` total fits
    * `budget`.
    *
    * Scale shape: the running total is [[Packing.prefixSum]] — two-pass
    * range-partitioned, never a single-partition window — and the cut
    * is pure column arithmetic after it, so selection costs one extra
    * scan over the scored corpus at any corpus size. Greedy-by-rank is
    * the standard practice (exact knapsack is NP-hard and pointless at
    * 4dp score granularity).
    *
    * @return the kept rows + `cum_tokens` (inclusive running total)
    */
  def budgetSelect(
      df: DataFrame, orderKey: Seq[Column], tokenCol: String,
      budget: Long,
      numPartitions: Int = DistributedRank.SessionDefault): DataFrame = {
    require(budget > 0, s"budgetSelect: budget must be positive, got $budget")
    require(orderKey.nonEmpty, "budgetSelect: orderKey must be non-empty")
    val key = struct(orderKey.zipWithIndex.map {
      case (c, i) => c.as(s"k$i")
    }: _*)
    Packing.prefixSum(df.withColumn("__bk", key), col("__bk"),
        col(tokenCol), numPartitions)
      .withColumn("cum_tokens",
        col("tokens_before") + col(tokenCol).cast("long"))
      .where(col("cum_tokens") <= budget)
      .drop("__bk", "tokens_before")
  }

  /** Deterministic global corpus shuffle — the "randomize training
    * order" step every pretraining pipeline runs before sharding.
    * Each row gets `shuffle_pos`: its 1-based position in the
    * pseudo-random permutation ordered by md5(seed ‖ id).
    *
    * Same auditability contract as the samplers (any engine reproduces
    * the permutation from (seed, id) alone; stable under retries and
    * incremental growth), and the global numbering comes from the
    * two-pass range-partitioned rank ([[DistributedRank]]) — no
    * single-partition window, so the permutation is computed with full
    * parallelism at any corpus size. md5's 128 bits make key
    * collisions practically impossible, but the id itself rides along
    * as an explicit total-order tiebreaker anyway (oracle-exact by
    * construction, not by luck).
    */
  def shuffled(
      df: DataFrame, idCol: String, seed: String = "0",
      numPartitions: Int = 32): DataFrame =
    DistributedRank.withGlobalRowNumber(
        df.withColumn("__skey",
          md5(concat(lit(seed), lit(":"), col(idCol).cast("string")))),
        Seq(col("__skey"), col(idCol)), numPartitions)
      .withColumnRenamed("__rn", "shuffle_pos")
      .drop("__skey")
}
