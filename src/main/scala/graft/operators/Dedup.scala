package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Aggregators

/** Deduplication operators for training-data pipelines, each designed
  * shuffle-minimal for the 100 TB case:
  *
  *  - exact / normalized: ONE hash-shuffle on a 128-bit digest (never on
  *    the full text — the shuffle payload is the digest + id).
  *  - MinHash + LSH banding: linear scan → fixed-size signatures →
  *    band-bucket self-join. Only bucket-colliding pairs are compared;
  *    degenerate buckets (boilerplate) are capped.
  *  - SimHash: 64-bit signature, Hamming-ball candidate generation by
  *    the pigeonhole block trick (d ≤ 3 ⇒ one of 4 16-bit blocks equal).
  *  - n-gram Jaccard: inverted-index self-join with document-frequency
  *    capping (stop-shingle removal) to bound the join fan-out.
  */
object Dedup {

  /** Exact duplicate groups keyed on md5 of the given column. Returns
    * one row per distinct value: the representative (min id) and the
    * group size.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Case/whitespace-insensitive exact dedup (lower + trim + collapse
    * runs of whitespace before hashing).
    */
  def normalized(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exact(
      df.withColumn(textCol,
        regexp_replace(trim(lower(col(textCol))), "\\s+", " ")),
      idCol, textCol)

  /** Word n-gram shingle hashes (xxhash64) of a text column, as an
    * array column — the input unit for MinHash.
    */
  def shingleHashes(text: Column, n: Int): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** MinHash signatures: (id, sig Array[Long](numHashes)). One scan,
    * one partial-aggregated shuffle of fixed-size buffers.
    */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, shingle: Int = 3): DataFrame = {
    val mh = Aggregators.minhash(numHashes)
    df.select(col(idCol).as("id"),
        explode(shingleHashes(col(textCol), shingle)).as("sh"))
      .groupBy("id").agg(mh(col("sh")).as("sig"))
  }

  /** MinHash + LSH banding near-duplicate pairs.
    *
    * @param bands       number of LSH bands (numHashes % bands == 0)
    * @param threshold   estimated-Jaccard cutoff (fraction of equal
    *                    signature slots)
    * @param maxBucket   drop degenerate buckets larger than this (stop
    *                    boilerplate; bounds worst-case pair fan-out)
    * @return (id_a, id_b, est_jaccard) with id_a < id_b
    */
  def minhashLsh(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingle: Int = 3,
      threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val sigs = minhashSignatures(df, idCol, textCol, numHashes, shingle)

    val banded = sigs.select(col("id"), col("sig"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(lit(b), slice(col("sig"), b * r + 1, r))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")

    val bucketed = banded.withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy("band", "bh")))
      .where(col("bucket_n") <= maxBucket)

    val a = bucketed.select(col("band"), col("bh"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = bucketed.select(col("band"), col("bh"),
      col("id").as("id_b"), col("sig").as("sig_b"))

    a.join(b, Seq("band", "bh")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b))
          .cast("double") / numHashes).as("est_jaccard"))
      .groupBy("id_a", "id_b").agg(max("est_jaccard").as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** SimHash signatures: (id, sig: 64-bit Long). */
  def simhashSignatures(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = Aggregators.simhash
    val toks = split(trim(lower(col(textCol))), "\\s+")
    df.select(col(idCol).as("id"), explode(toks).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("th"))
      .groupBy("id").agg(sh(col("th")).as("sig"))
  }

  /** SimHash near-duplicate pairs with Hamming distance <= maxHamming
    * (must be <= blocks-1 = 3 for the pigeonhole candidate generation
    * to be exhaustive). Returns (id_a, id_b, hamming).
    */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "block trick covers hamming <= 3 with 4 blocks")
    val sigs = simhashSignatures(df, idCol, textCol)
    val blocked = sigs.select(col("id"), col("sig"),
        posexplode(array((0 until 4).map(b =>
          shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "blk").withColumnRenamed("col", "bv")
    val a = blocked.select(col("blk"), col("bv"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = blocked.select(col("blk"), col("bv"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("blk", "bv")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for candidate pairs sharing at
    * least one (non-stop) shingle — inverted-index self-join.
    *
    * @param maxDf drop shingles occurring in more than maxDf docs
    *              (stop-shingles: they only add join fan-out)
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDf: Int = 100): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
        explode(shingleHashes(col(textCol), n)).as("g"))
      .distinct()
    val sizes = grams.groupBy("id").agg(count(lit(1)).as("sz"))
    val filtered = grams.withColumn("df",
        count(lit(1)).over(Window.partitionBy("g")))
      .where(col("df") <= maxDf).drop("df")

    val inter = filtered.select(col("g"), col("id").as("id_a"))
      .join(filtered.select(col("g"), col("id").as("id_b")), Seq("g"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))

    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
