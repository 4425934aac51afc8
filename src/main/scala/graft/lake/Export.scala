package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sampling}

/** Training-data export: the terminal stage of the pipeline
  * (clean → dedup → mix → shuffle → pack → shard → write). Turns a
  * corpus into `n` balanced parquet shards laid out in a deterministic
  * pseudo-random order, with a per-shard manifest — what a trainer's
  * dataloader consumes (beyond-reference surface; the reference stops
  * at the queryable lake).
  *
  * Determinism contract (same as [[graft.operators.Sampling]]): the
  * permutation is md5(seed‖id), the shard of a row is a pure function
  * of (seed, id, corpus size), and re-running the export reproduces
  * byte-identical shard membership — audit-friendly and retry-safe.
  *
  * Scale shape: the shuffle order comes from the two-pass distributed
  * rank (no single-partition window), shard assignment is column
  * arithmetic on the global position (contiguous equal-width position
  * ranges → shards balanced to ±1 row by construction, unlike modulo-
  * hash sharding which is only balanced in expectation), and the write
  * is one `partitionBy(shard)` job. Nothing corpus-sized ever lands on
  * the driver; the manifest aggregate is shards-sized.
  */
object Export {

  /** shard = (pos−1)·shards DIV N: contiguous equal-width position
    * ranges, balanced to ±1 row exactly. Spark's `/` is double
    * division, whose 53-bit mantissa could misplace boundary rows once
    * pos·shards exceeds ~9e15 — `DIV` keeps the arithmetic integral at
    * any corpus size. Expects `shuffle_pos` and `__n` in scope.
    */
  private def shardOf(shards: Int) =
    expr(s"CAST(((shuffle_pos - 1) * $shards) DIV __n AS INT)")

  /** Output/internal column names the export stages add via
    * withColumn — a user column with one of these names would be
    * silently overwritten (corrupting the exported data), so exports
    * fail loudly instead.
    */
  private def requireNoReserved(df: DataFrame, reserved: Seq[String]): Unit = {
    val clash = df.columns.filter(c => reserved.contains(c.toLowerCase))
    require(clash.isEmpty,
      s"export: input already contains reserved column(s) " +
        s"${clash.mkString(", ")} — rename them before exporting " +
        s"(reserved: ${reserved.mkString(", ")})")
  }

  /** Shuffle `df` by `idCol` with `seed`, assign `shards` contiguous
    * position ranges, write parquet partitioned by `shard` under
    * `outDir`, and return the per-shard manifest
    * (shard, n_docs, first_pos, last_pos[, n_tokens when `tokenCol`
    * is set]).
    */
  def exportShards(
      spark: SparkSession, df: DataFrame, idCol: String,
      outDir: String, shards: Int, seed: String = "0",
      tokenCol: Option[String] = None,
      format: String = "parquet"): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    requireNoReserved(df, Seq("shuffle_pos", "shard", "__n"))
    val ordered = Sampling.shuffled(df, idCol, seed)
    val n = ordered.agg(count(lit(1)).as("__n"))
    val sharded = ordered.crossJoin(broadcast(n))
      .withColumn("shard", shardOf(shards))
      .drop("__n")
    writeOut(sharded, outDir, format)
    val written = readBack(spark, outDir, format)
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      min("shuffle_pos").as("first_pos"),
      max("shuffle_pos").as("last_pos")) ++
      tokenCol.map(c => sum(col(c).cast("long")).as("n_tokens"))
    written.groupBy("shard").agg(aggs.head, aggs.tail: _*)
      .orderBy("shard")
  }

  /** [[exportShards]] + block packing: adds `tokens_before` /
    * `block_id` columns (budget-token blocks in shuffle order) before
    * sharding, so the dataloader can seek to any block without
    * re-scanning. Requires a token-count column.
    */
  def exportPacked(
      spark: SparkSession, df: DataFrame, idCol: String,
      tokenCol: String, outDir: String, shards: Int,
      budget: Long, seed: String = "0",
      format: String = "parquet"): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    requireNoReserved(df, Seq("shuffle_pos", "shard", "__n",
      "tokens_before", "block_id", "n_blocks"))
    val ordered = Sampling.shuffled(df, idCol, seed)
    val packed = Packing.pack(ordered, "shuffle_pos", tokenCol, budget)
    val n = packed.agg(count(lit(1)).as("__n"))
    val sharded = packed.crossJoin(broadcast(n))
      .withColumn("shard", shardOf(shards))
      .drop("__n")
    writeOut(sharded, outDir, format)
    readBack(spark, outDir, format).groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol).cast("long")).as("n_tokens"),
        countDistinct("block_id").as("n_blocks"))
      .orderBy("shard")
  }

  /** Output format dispatch: `parquet` (columnar, the lake default) or
    * `jsonl` (Spark's JSON-Lines writer — what most tokenizer/training
    * loaders ingest directly). Both lay out `shard=N/` partition dirs;
    * the manifest is computed from a read-back of what actually landed
    * on disk, so a lost task cannot leave a silently short shard.
    */
  private def writeOut(df: DataFrame, outDir: String, format: String): Unit =
    format match {
      case "parquet" => df.write.mode(SaveMode.Overwrite)
        .partitionBy("shard").parquet(outDir)
      case "jsonl" => df.write.mode(SaveMode.Overwrite)
        .partitionBy("shard").json(outDir)
      case other => throw new IllegalArgumentException(
        s"export: unknown format '$other' (parquet, jsonl)")
    }

  private def readBack(
      spark: SparkSession, outDir: String, format: String): DataFrame =
    format match {
      case "parquet" => spark.read.parquet(outDir)
      case "jsonl"   => spark.read.json(outDir)
      case other => throw new IllegalArgumentException(
        s"export: unknown format '$other' (parquet, jsonl)")
    }
}
