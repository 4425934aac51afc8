package graft.lake

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** r19 optimization round: the driver-side metadata-plane parquet I/O
  * (ManifestIO) replaced Spark jobs for per-file stats, manifest
  * appends and manifest planning reads. These pins are the
  * equivalence contract: footer-served stats equal scan-computed
  * stats on every null shape, direct-written manifests round-trip
  * through Spark byte-compatibly (and mix with Spark-written parts),
  * and the INT96 vintage falls back instead of guessing.
  */
class ManifestIOSpec extends AnyFunSuite with SparkTest {

  private def conf = spark.sessionState.newHadoopConf()

  private def writeParquet(
      dir: String, rows: Seq[(Long, Option[String])]): String = {
    // (id, optional ts-string) — null ts stays null after cast
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    try rows.toDF("event_id", "ts_s")
      .select(col("event_id"),
        col("ts_s").cast("timestamp").as(TpSchema.Timestamp))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    finally prev.fold(
      spark.conf.unset("spark.sql.parquet.outputTimestampType"))(
      spark.conf.set("spark.sql.parquet.outputTimestampType", _))
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head.getAbsolutePath
  }

  private def scanStats(file: String): (Long, Timestamp, Timestamp) = {
    val r = spark.read.parquet(file)
      .agg(count(lit(1)), min(TpSchema.Timestamp), max(TpSchema.Timestamp))
      .head()
    (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))
  }

  test("footerStats == scan stats: plain, null-mixed, all-null, " +
      "and 0-row-file/groupBy parity") {
    val base = Files.createTempDirectory("graft_mio").toString
    val plain = writeParquet(s"$base/a", Seq(
      1L -> Some("2024-03-01 10:00:00"), 2L -> Some("2024-03-02 11:30:00"),
      3L -> Some("2024-02-28 23:59:59")))
    val mixed = writeParquet(s"$base/b", Seq(
      1L -> Some("2024-03-05 00:00:01"), 2L -> None,
      3L -> Some("2024-03-04 12:00:00"), 4L -> None))
    val allNull = writeParquet(s"$base/c",
      Seq(1L -> None, 2L -> None))
    val got = ManifestIO.footerStats(
      conf, Seq(plain, mixed, allNull), TpSchema.Timestamp)
    assert(got.isDefined, "micros-annotated files must serve from footers")
    val byFile = got.get.map(r => r._1 -> r).toMap
    for (f <- Seq(plain, mixed)) {
      val (n, lo, hi) = scanStats(f)
      val (_, gn, glo, ghi) = byFile(f)
      assert(gn === n, s"rows $f")
      assert(glo === Some(lo) && ghi === Some(hi), s"range $f")
    }
    // all-null file: count includes null rows, range is absent —
    // exactly what the scan's min/max would produce (null)
    val (_, an, alo, ahi) = byFile(allNull)
    assert(an === 2L && alo.isEmpty && ahi.isEmpty)
  }

  test("INT96-vintage file (no timestamp stats) falls back to None") {
    val base = Files.createTempDirectory("graft_mio96").toString
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try Seq((1L, "2024-03-01 10:00:00"))
      .toDF("event_id", "ts_s")
      .select(col("event_id"),
        col("ts_s").cast("timestamp").as(TpSchema.Timestamp))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/d")
    finally prev.fold(
      spark.conf.unset("spark.sql.parquet.outputTimestampType"))(
      spark.conf.set("spark.sql.parquet.outputTimestampType", _))
    val f = new java.io.File(s"$base/d").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    assert(ManifestIO.footerStats(conf, Seq(f), TpSchema.Timestamp).isEmpty,
      "INT96 carries no stats; the footer path must decline, not guess")
  }

  test("writeManifest round-trips through BOTH readers and mixes with " +
      "Spark-written parts; maxSeq from footers; _SUCCESS maintained") {
    val dir = Files.createTempDirectory("graft_miow").toString + "/m"
    val t1 = Timestamp.valueOf("2024-03-01 10:00:00")
    val t2 = Timestamp.valueOf("2024-03-02 11:00:00")
    ManifestIO.writeManifest(conf, dir, Seq(
      ManifestIO.MRow("/x/f1.parquet", 10L, Some(t1), Some(t2), 1L),
      ManifestIO.MRow("/x/f2.parquet", -1L, None, None, 1L)))
    // a Spark-written part in the same dir (the INT96 vintage shape)
    import spark.implicits._
    Seq(("/x/f3.parquet", 5L, t1, t2, 2L))
      .toDF("file", "rows", "min_ts", "max_ts", "seq")
      .coalesce(1).write.mode("append").parquet(dir)
    // Spark reader sees all three rows with identical values
    val viaSpark = spark.read.parquet(dir)
      .orderBy("file").collect().toSeq
    assert(viaSpark.size === 3)
    val f1 = viaSpark.find(_.getString(0) == "/x/f1.parquet").get
    assert(f1.getLong(1) === 10L && f1.getTimestamp(2) === t1 &&
      f1.getTimestamp(3) === t2 && f1.getLong(4) === 1L)
    // direct reader sees the same rows (both timestamp vintages)
    val viaDirect = ManifestIO.readManifest(conf, dir)
      .sortBy(_.file)
    assert(viaDirect.map(_.file) ===
      Seq("/x/f1.parquet", "/x/f2.parquet", "/x/f3.parquet"))
    assert(viaDirect.head.minTs === Some(t1) &&
      viaDirect.head.maxTs === Some(t2))
    assert(viaDirect(1).rows === -1L && viaDirect(1).minTs.isEmpty)
    assert(viaDirect(2).rows === 5L && viaDirect(2).minTs === Some(t1))
    // maxSeq needs only footers
    assert(ManifestIO.maxSeq(conf, dir) === Some(2L))
    // heal's complete-dir discriminator is maintained
    assert(new java.io.File(dir, "_SUCCESS").isFile,
      "direct-written manifest dirs must carry _SUCCESS (heal contract)")
  }
}
