package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed byte-pair-encoding merge training (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the tokenizer-training primitive a pre-training pipeline
  * runs over its own corpus. Beyond-reference.
  *
  * Scale shape, the same as every production BPE trainer:
  *  - ONE corpus pass builds the word-frequency vocabulary (map-side
  *    combined word count). Everything after operates on the
  *    vocabulary — millions of rows at web scale, never the corpus.
  *  - Each merge round is two vocabulary-sized jobs: a pair-count
  *    aggregate (explode adjacent symbol pairs × word freq) and a
  *    one-row argmax collect; the winning pair is applied to every
  *    vocabulary entry as a literal string replace. R rounds = R small
  *    jobs against a persisted, re-persisted vocabulary.
  *
  * Symbol sequences are kept as DOUBLE-separator-joined strings
  * (`␁␁a␁␁b␁␁`) so that applying a merge is a single literal
  * `replace(seq, "␁a␁␁b␁", "␁ab␁")`: the half-consumed outer
  * separators make the replace simultaneously boundary-safe (symbol
  * "bx" can never match pair (a,b)) and correct for runs (leftmost
  * non-overlapping, exactly the greedy fold BPE specifies) — and
  * `replace` has identical semantics in every SQL engine, which is
  * what makes the operator oracle-checkable.
  *
  * Ties on pair count break lexicographically (left, then right) so
  * the merge table is deterministic.
  *
  * @return one row per learned merge: (merge_rank, lhs, rhs, freq)
  */
object BpeMerges {

  /** Separator; must not occur in the corpus text. */
  private val S = "\u0001"
  private val SS = S + S
  /** End-of-word symbol (the paper's `</w>`). */
  val Eow = "</w>"

  def apply(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val t = train(df, textCol, rounds)
    val merges = t.merges
    t.release()
    merges
  }

  /** Merge table plus the trained word vocabulary (`w`,
    * separator-joined `seq` after all merges, corpus `freq`) — what
    * [[BpeEncode]] joins the corpus against. Vocabulary-sized, like
    * the merges; `vocab` is persisted, call [[Trained.release]] when
    * done with it.
    */
  final case class Trained(merges: DataFrame, vocab: DataFrame) {
    def release(): Unit = { vocab.unpersist(); () }
  }

  def train(df: DataFrame, textCol: String, rounds: Int): Trained = {
    require(rounds >= 1, s"bpeMerges: rounds must be >= 1, got $rounds")
    val spark = df.sparkSession
    // corpus pass: word frequencies, then char symbols + </w>
    var vocab = df
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), concat(lit(SS),
        concat_ws(SS, concat(split(col("w"), ""), array(lit(Eow)))),
        lit(SS)).as("seq"), col("freq"))
      .persist()
    vocab.count() // materialize before the loop

    val merges = Seq.newBuilder[Row]
    var done = false
    for (rank <- 1 to rounds if !done) {
      val syms = filter(split(col("seq"), SS), x => x =!= "")
      val pairs = vocab
        .select(col("freq"), explode(zip_with(
          slice(syms, lit(1), size(syms) - 1),
          slice(syms, lit(2), size(syms) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("n"))
      val top = pairs.orderBy(desc("n"), col("l"), col("r")).limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, n) = (top(0).getAs[String]("l"),
          top(0).getAs[String]("r"), top(0).getAs[Long]("n"))
        merges += Row(rank, l, r, n)
        val next = vocab.withColumn("seq",
          org.apache.spark.sql.functions.replace(col("seq"),
            lit(S + l + SS + r + S), lit(S + l + r + S)))
          .persist()
        next.count()
        vocab.unpersist()
        vocab = next
      }
    }
    // the final vocab stays persisted — Trained.vocab is what encode
    // joins against; callers done with it unpersist via its .unpersist()
    val mergesDf = spark.createDataFrame(
      spark.sparkContext.parallelize(merges.result(), 1),
      StructType(Seq(
        StructField("merge_rank", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("freq", LongType, nullable = false))))
    Trained(mergesDf, vocab)
  }

  /** Symbols of a trained `seq` as an array column (separator split,
    * empties dropped) — the token sequence of that word.
    */
  def symbols(seq: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(seq, SS), x => x =!= "")

  /** Persist a trained tokenizer as a lake artifact: `merges` and the
    * fully-merged word vocabulary as parquet under `path`. Both tables
    * are vocabulary-sized; encoding a corpus against a saved tokenizer
    * ([[load]] + [[BpeEncode]]) is then a lookup join with ZERO
    * training work — the `index build`/`index query` split applied to
    * tokenizers, so profiling queries stop retraining per call.
    */
  def save(t: Trained, path: String): Unit = {
    t.merges.coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    t.vocab.write.mode("overwrite").parquet(s"$path/vocab")
  }

  /** Load a tokenizer saved by [[save]]. The vocab reads straight from
    * parquet (already materialized — no persist to release; `release()`
    * on the result is a harmless no-op).
    */
  def load(spark: SparkSession, path: String): Trained =
    Trained(
      spark.read.parquet(s"$path/merges"),
      spark.read.parquet(s"$path/vocab"))

  /** Build-if-stale wrapper: train on `df` and [[save]] under `path`
    * unless a fresh artifact (same rounds + corpus row count) already
    * exists. Returns the loaded tokenizer either way — callers like
    * qt35/qt48 share one training per corpus instead of one per query.
    *
    * CONTRACT (r19 ADVICE-low): a non-empty `sourceFp` must pin the
    * EXACT DataFrame contents (`df` = the untransformed full corpus of
    * the fingerprinted source) — with sourceFp set, the row count is
    * not part of the staleness key, so a filtered/transformed frame
    * under the same sourceFp would silently reuse a mismatched
    * tokenizer. Use sourceFp = "" for derived corpora.
    */
  def ensureTrained(
      df: DataFrame, textCol: String, rounds: Int,
      path: String, sourceFp: String = ""): Trained = {
    // r19: skip the per-call corpus count when the source fingerprint
    // already pins corpus identity (same rationale as ensureLm)
    val fp =
      if (sourceFp.nonEmpty) s"bpe;rounds=$rounds;col=$textCol;src=$sourceFp"
      else s"bpe;rounds=$rounds;col=$textCol;n=${df.count()};src="
    graft.lake.Artifacts.ensure(path, fp) {
      val t = train(df, textCol, rounds)
      save(t, path)
      t.release()
    }
    load(df.sparkSession, path)
  }
}
