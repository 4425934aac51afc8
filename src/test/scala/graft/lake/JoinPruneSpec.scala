package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.config.PartitionSpec

/** [[Lake.readJoinPruned]]: join-key file skipping — the runtime-filter
  * move at the FILE level. Dim-side keys are collected (capped) and
  * fact files whose zone range provably contains none of them are
  * skipped before the scan. Pins: the cut fires on a banded layout,
  * conservativeness (pruned join ≡ unpruned join), the sparse-key-set
  * case a band test cannot prune, the past-the-cap band fallback,
  * string keys, empty keys, and NaN disabling pruning. The qi32 oracle
  * gates the same conservativeness against DuckDB.
  */
class JoinPruneSpec extends AnyFunSuite with SparkTest {

  /** Four appends with disjoint key bands: [0,100), [100,200),
    * [200,300), [300,400) — one file each (single partition dir).
    */
  private def bandedLake(): (Lake, String, Int) = {
    val lake = Lake(Files.createTempDirectory("graft_joinprune").toString)
    val spec = PartitionSpec("jp", "p0", tpIndexColumn = Some("idx"))
    def batch(lo: Int, n: Int) = {
      val raw = spark.range(lo, lo + n).select(
        col("id").as("k"),
        expr("timestamp '2024-03-05 00:00:00' + " +
          "make_interval(0,0,0,0,0,0, id*1000)").as("tp_timestamp"),
        lit("0").as("idx"),
        (col("id") * 2).cast("double").as("v"),
        concat(lit("key-"), lpad(col("id").cast("string"), 5, "0"))
          .as("ks"))
      TpSchema.enrich(raw, spec)
    }
    for (lo <- Seq(0, 100, 200, 300))
      lake.append(spark, "jp", batch(lo, 100))
    lake.enableColumnStats(spark, "jp", Seq("k", "ks"))
    val total = lake.dataFiles(spark, "jp").size
    assert(total === 4, s"fixture wants 4 banded files, got $total")
    (lake, "jp", total)
  }

  private def keysDf(vals: Seq[Long]): DataFrame = {
    import spark.implicits._
    vals.toDF("key")
  }

  test("keys confined to one band isolate that band's file") {
    val (lake, t, total) = bandedLake()
    val keys = keysDf(Seq(120L, 150L, 180L))
    val pruned = lake.readJoinPruned(spark, t, "k", keys)
    assert(pruned.inputFiles.length === 1,
      s"expected 1 of $total files, got ${pruned.inputFiles.length}")
    // conservativeness: the pruned join equals the unpruned join
    val full = lake.read(spark, t).join(keys,
      col("k") === col("key")).select("k", "v")
    val cut = pruned.join(keys, col("k") === col("key")).select("k", "v")
    assert(cut.collect().sortBy(_.getLong(0)).toSeq ===
      full.collect().sortBy(_.getLong(0)).toSeq)
    assert(cut.count() === 3L)
  }

  test("a sparse key set prunes files a min/max band test would keep") {
    val (lake, t, _) = bandedLake()
    // keys straddle bands 1 and 4 but MISS 2 and 3 entirely: the band
    // [50, 350] keeps everything; the set test keeps exactly two files
    val keys = keysDf(Seq(50L, 350L))
    val pruned = lake.readJoinPruned(spark, t, "k", keys)
    assert(pruned.inputFiles.length === 2,
      s"set-based pruning should keep 2 files, got " +
        s"${pruned.inputFiles.length}")
    // the band FALLBACK (cap exceeded) keeps all four — measured here
    // to pin the degradation shape, not to prefer it
    val banded = lake.readJoinPruned(spark, t, "k", keys, maxKeys = 1)
    assert(banded.inputFiles.length === 4)
    assert(banded.join(keys, col("k") === col("key")).count() === 2L)
  }

  test("string keys prune by lexicographic zones") {
    val (lake, t, _) = bandedLake()
    import spark.implicits._
    val keys = Seq("key-00210", "key-00260").toDF("key")
    val pruned = lake.readJoinPruned(spark, t, "ks", keys)
    assert(pruned.inputFiles.length === 1)
    assert(pruned.join(keys, col("ks") === col("key")).count() === 2L)
  }

  test("empty key set reads nothing and keeps the schema") {
    val (lake, t, _) = bandedLake()
    val keys = keysDf(Seq.empty)
    val pruned = lake.readJoinPruned(spark, t, "k", keys)
    assert(pruned.count() === 0L)
    assert(pruned.schema.fieldNames.contains("k"))
    assert(pruned.schema.fieldNames.contains("tp_partition"))
  }

  test("null keys are dropped; NaN keys disable pruning") {
    val (lake, t, total) = bandedLake()
    import spark.implicits._
    // nulls never match an equi-join: only the non-null key prunes
    val withNull = Seq(Some(150L), None).toDF("key")
    val pruned = lake.readJoinPruned(spark, t, "k", withNull)
    assert(pruned.inputFiles.length === 1)
    // NaN: Spark joins treat NaN = NaN as a match — zone ranges can't
    // answer that soundly, so pruning turns off
    val nan = Seq(Double.NaN).toDF("key")
    val kept = lake.readJoinPruned(spark, t, "k", nan)
    assert(kept.inputFiles.length === total)
  }

  test("NaN keys past the cap disable pruning (not prune everything)") {
    val (lake, t, total) = bandedLake()
    import spark.implicits._
    // 3 distinct keys with maxKeys = 1 takes the over-cap band branch,
    // where Spark's max over a NaN-bearing key set returns NaN (NaN
    // orders greatest) — without the valve the [lo, NaN] band matches
    // NO file and every matching row silently vanishes (r16
    // ADVICE-medium: the guard existed only under the cap)
    val keys = Seq(120.0, 150.0, Double.NaN).toDF("key")
    val kept = lake.readJoinPruned(spark, t, "k", keys, maxKeys = 1)
    assert(kept.inputFiles.length === total,
      "over-cap NaN must disable pruning entirely")
    val joined = kept.join(keys, col("k").cast("double") === col("key"))
    assert(joined.count() === 2L)
  }

  test("no sidecar: every file kept, join intact") {
    val lake = Lake(Files.createTempDirectory("graft_joinprune_ns").toString)
    val spec = PartitionSpec("ns", "p0", tpIndexColumn = Some("idx"))
    val raw = spark.range(0, 100).select(
      col("id").as("k"),
      expr("timestamp '2024-03-05 00:00:00'").as("tp_timestamp"),
      lit("0").as("idx"))
    lake.append(spark, "ns", TpSchema.enrich(raw, spec))
    val keys = keysDf(Seq(10L, 20L))
    val pruned = lake.readJoinPruned(spark, "ns", "k", keys)
    assert(pruned.join(keys, col("k") === col("key")).count() === 2L)
  }
}
