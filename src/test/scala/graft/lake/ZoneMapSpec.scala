package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.config.PartitionSpec
import graft.query.{ScanAudit, Views}

/** Zone-map pruning through the QUERY path (r16 verdict task 1): a
  * plain `WHERE value BETWEEN ...` on a registered view must skip
  * files via the colstats sidecar, compose with partition pruning,
  * and never change results (conservativeness — the qi29 oracle gates
  * the same property against DuckDB).
  */
class ZoneMapSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def attr(name: String, dt: DataType): AttributeReference =
    AttributeReference(name, dt)()

  // ---- band extraction unit pins ----

  test("extractBands: closed numeric band from >= and <= conjuncts") {
    val a = attr("v", DoubleType)
    val bands = ZoneMapFileIndex.extractBands(Seq(
      GreaterThanOrEqual(a, Literal(45.0)),
      LessThanOrEqual(a, Literal(70.0))))
    val b = bands("v")
    assert(b.loD <= 45.0 && b.loD > 44.999)
    assert(b.hiD >= 70.0 && b.hiD < 70.001)
  }

  test("extractBands: reversed operands, equality, and And nesting") {
    val a = attr("v", LongType)
    val bands = ZoneMapFileIndex.extractBands(Seq(
      And(LessThan(Literal(10L), a), GreaterThan(Literal(99L), a))))
    assert(bands("v").loD <= 10.0 && bands("v").hiD >= 99.0)
    val eq = ZoneMapFileIndex.extractBands(Seq(
      EqualTo(attr("k", IntegerType), Literal(7))))
    assert(eq("k").loD <= 7.0 && eq("k").hiD >= 7.0 &&
      eq("k").hiD < 7.001 && eq("k").loD > 6.999)
  }

  test("extractBands: string equality and prefix; OR and cast contribute nothing") {
    val s = attr("src", StringType)
    val eq = ZoneMapFileIndex.extractBands(Seq(
      EqualTo(s, Literal(UTF8String.fromString("web"), StringType))))
    assert(eq("src").loS.isDefined && eq("src").hiS.isDefined)
    val pre = ZoneMapFileIndex.extractBands(Seq(
      StartsWith(s, Literal(UTF8String.fromString("s3://a/"), StringType))))
    val hi = pre("src").hiS.get
    assert(ZoneMapFileIndex.byteCompare(
      UTF8String.fromString("s3://a/zzz").getBytes, hi) < 0,
      "every prefixed string must sit below the upper bound")
    // OR'd conjunct: no band (pruning would be unsound)
    val or = ZoneMapFileIndex.extractBands(Seq(
      Or(GreaterThan(attr("v", LongType), Literal(5L)),
        LessThan(attr("v", LongType), Literal(1L)))))
    assert(or.isEmpty)
    // cast-wrapped attribute: no band
    val cast = ZoneMapFileIndex.extractBands(Seq(
      GreaterThan(Cast(attr("v", LongType), DoubleType), Literal(5.0))))
    assert(cast.isEmpty)
  }

  test("prefixUpperBound bounds all continuations; byteCompare is UTF8 order") {
    val p = UTF8String.fromString("ab").getBytes
    val up = ZoneMapFileIndex.prefixUpperBound(p)
    for (s <- Seq("ab", "ab￿", "ab😀" /* astral */ )) {
      val bytes = UTF8String.fromString(s).getBytes
      assert(ZoneMapFileIndex.byteCompare(bytes, p) >= 0)
      assert(ZoneMapFileIndex.byteCompare(bytes, up) < 0, s"astral: $s")
    }
    // UTF8 byte order puts astral chars ABOVE  (Java order differs)
    assert(ZoneMapFileIndex.byteCompare(
      UTF8String.fromString("😀").getBytes,
      UTF8String.fromString("").getBytes) > 0)
  }

  // ---- end-to-end through the lake + view + SQL ----

  /** Three value-banded appends on one partition, plus one append on a
    * second partition: 4+ files with disjoint `v` zones.
    */
  private def bandedLake(): (Lake, Int) = {
    val lake = Lake(Files.createTempDirectory("graft_zonemap").toString)
    val spec = PartitionSpec("tz", "p0", tpIndexColumn = Some("idx"))
    def batch(part: String, lo: Int, n: Int) = {
      val raw = spark.range(lo, lo + n).select(
        col("id").as("event_id"),
        expr("timestamp '2024-03-05 00:00:00' + make_interval(0,0,0,0,0,0, id*1000)")
          .as("tp_timestamp"),
        lit("0").as("idx"),
        col("id").cast("double").as("v"),
        concat(lit(part), lit("-"), col("id")).as("src"))
      TpSchema.enrich(raw, PartitionSpec("tz", part,
        tpIndexColumn = Some("idx")))
    }
    lake.append(spark, "tz", batch("p0", 0, 100))
    lake.append(spark, "tz", batch("p0", 100, 100))
    lake.append(spark, "tz", batch("p0", 200, 100))
    lake.append(spark, "tz", batch("p1", 300, 100))
    lake.enableColumnStats(spark, "tz", Seq("v", "src"))
    val total = lake.dataFiles(spark, "tz").size
    assert(total >= 4, s"fixture must have >=4 files, got $total")
    (lake, total)
  }

  test("plain SQL band predicate through the view prunes files and keeps results exact") {
    val (lake, total) = bandedLake()
    Views.register(spark, lake, Views.Filters())
    val q = spark.sql(
      "SELECT count(*) AS n, sum(v) AS sv FROM tz WHERE v >= 120 AND v <= 180")
    val files = ScanAudit.filesReadAfterRun(q)
    assert(files === 1, s"zone maps should isolate 1 of $total files, read $files")
    val r = q.head()
    assert(r.getLong(0) === 61)
    assert(r.getDouble(1) === (120 to 180).map(_.toDouble).sum)
  }

  test("zone-map and partition pruning compose") {
    val (lake, total) = bandedLake()
    Views.register(spark, lake, Views.Filters())
    // partition filter keeps p0's 3 files; band keeps 1 of those
    val q = spark.sql(
      "SELECT count(*) AS n FROM tz WHERE tp_partition = 'p0' AND v >= 210 AND v <= 220")
    val files = ScanAudit.filesReadAfterRun(q)
    assert(files === 1,
      s"expected partition+zone composition to isolate 1 file, got $files of $total")
    assert(q.head().getLong(0) === 11)
  }

  test("string prefix and equality predicates prune by lexicographic zones") {
    val (lake, total) = bandedLake()
    Views.register(spark, lake, Views.Filters())
    val q = spark.sql(
      "SELECT count(*) AS n FROM tz WHERE src LIKE 'p1-3%'")
    val files = ScanAudit.filesReadAfterRun(q)
    assert(files === 1, s"string zones should isolate 1 of $total files, read $files")
    assert(q.head().getLong(0) === 100) // p1-300..p1-399 all match 'p1-3%'
  }

  test("band missing every file reads zero files, empty result, full schema") {
    val (lake, _) = bandedLake()
    Views.register(spark, lake, Views.Filters())
    val q = spark.sql("SELECT event_id, v FROM tz WHERE v > 5000")
    val files = ScanAudit.filesReadAfterRun(q)
    assert(files === 0, s"expected all files pruned, read $files")
    assert(q.count() === 0)
    assert(q.columns.toSeq === Seq("event_id", "v"))
  }

  test("conservativeness: results identical with and without zone maps on every band") {
    val (lake, _) = bandedLake()
    val zoned = lake.read(spark, "tz")
    // the stock reader, bypassing the zone index entirely
    val plain = spark.read.option("basePath", lake.tableDir("tz"))
      .parquet(lake.tableDir("tz"))
    for ((lo, hi) <- Seq((0, 99), (95, 105), (250, 400), (399, 399))) {
      val a = zoned.where(col("v") >= lo && col("v") <= hi)
        .agg(count(lit(1)), sum("v")).head()
      val b = plain.where(col("v") >= lo && col("v") <= hi)
        .agg(count(lit(1)), sum("v")).head()
      assert(a === b, s"band [$lo,$hi]")
    }
  }

  test("'+' in a partition value keys colstats rows correctly " +
      "(no form-decode mismatch) and zone maps still prune") {
    // r16 ADVICE: normalizedFileCol's url_decode form-decoded '+' as
    // a space while statsFor/dataFiles preserve it (URI.getPath) —
    // sidecar rows then keyed a path that never matched, silently
    // dropping the file from merged stats and zone pruning forever
    val lake = Lake(Files.createTempDirectory("graft_zonemap_plus").toString)
    def batch(idx: String, lo: Int, n: Int) = {
      val raw = spark.range(lo, lo + n).select(
        col("id").as("event_id"),
        expr("timestamp '2024-03-05 00:00:00' + make_interval(0,0,0,0,0,0, id*1000)")
          .as("tp_timestamp"),
        lit(idx).as("idx"), col("id").cast("double").as("v"))
      TpSchema.enrich(raw, PartitionSpec("tp", "p0",
        tpIndexColumn = Some("idx")))
    }
    lake.append(spark, "tp", batch("a+b", 0, 50))
    lake.append(spark, "tp", batch("a+b", 100, 50))
    lake.enableColumnStats(spark, "tp", Seq("v"))
    // merged CBO stats must see BOTH files' rows (the semi-join keeps
    // them only when sidecar keys match the manifest's path form)
    val synced = lake.syncCatalogColumnStats(spark, "tp")
    assert(synced.isDefined && synced.get.contains("v"), synced)
    val (ndv, nulls) = synced.get("v")
    assert(ndv >= 90 && nulls === 0,
      s"stats must cover all 100 rows across the '+' paths: $synced")
    // and the zone maps prune: band inside the second file only
    val q = lake.read(spark, "tp").where(col("v") >= 110 && col("v") <= 140)
    assert(ScanAudit.filesReadAfterRun(
      q.agg(count(lit(1)).as("n"))) === 1)
    assert(q.count() === 31)
  }

  test("no sidecar: read falls back to the stock plan and full scans still work") {
    val lake = Lake(Files.createTempDirectory("graft_zonemap_plain").toString)
    val raw = spark.range(50).select(
      col("id").as("event_id"),
      expr("timestamp '2024-03-05 00:00:00' + make_interval(0,0,0,0,0,0, id*1000)")
        .as("tp_timestamp"),
      lit("0").as("idx"), col("id").cast("double").as("v"))
    lake.append(spark, "t0",
      TpSchema.enrich(raw, PartitionSpec("t0", "p0", tpIndexColumn = Some("idx"))))
    val df = lake.read(spark, "t0").where(col("v") >= 10)
    assert(df.count() === 40)
  }
}
