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

  // ---- three-valued evaluation unit pins ----

  private val zone100 = // a file holding v in [100, 199], no nulls
    Map("v" -> ColumnZone(Some(100.0), Some(199.0), None, None,
      Some(0L), Some(100L)))
  private val zoneNull = // an all-null file for v
    Map("v" -> ColumnZone(None, None, None, None, Some(50L), Some(50L)))

  test("mayMatch: closed numeric bands, reversed operands, equality") {
    val a = attr("v", DoubleType)
    def may(e: Expression, z: Map[String, ColumnZone]) =
      ZoneMapFileIndex.mayMatch(e, z)
    assert(may(And(GreaterThanOrEqual(a, Literal(150.0)),
      LessThanOrEqual(a, Literal(180.0))), zone100))
    assert(!may(GreaterThanOrEqual(a, Literal(250.0)), zone100))
    assert(!may(LessThan(Literal(250.0), a), zone100)) // reversed operand
    assert(!may(EqualTo(a, Literal(99.0)), zone100))
    assert(may(EqualTo(a, Literal(100.0)), zone100)) // inclusive bound
    // uncovered column: always may-match
    assert(may(EqualTo(attr("other", DoubleType), Literal(1.0)), zone100))
  }

  test("mayMatch: OR prunes only when BOTH branches provably miss") {
    val a = attr("v", DoubleType)
    val orMiss = Or(LessThan(a, Literal(10.0)),
      GreaterThan(a, Literal(5000.0)))
    assert(!ZoneMapFileIndex.mayMatch(orMiss, zone100))
    val orHit = Or(LessThan(a, Literal(150.0)),
      GreaterThan(a, Literal(5000.0)))
    assert(ZoneMapFileIndex.mayMatch(orHit, zone100))
    // OR with a non-prunable branch: always keep
    val orUnknown = Or(GreaterThan(a, Literal(5000.0)),
      GreaterThan(Cast(a, StringType), Literal(UTF8String.fromString("x"),
        StringType)))
    assert(ZoneMapFileIndex.mayMatch(orUnknown, zone100))
    assert(!ZoneMapFileIndex.isPrunable(orUnknown))
  }

  test("mayMatch: IN list and InSet prune when every value misses the zone") {
    val a = attr("v", DoubleType)
    val inMiss = In(a, Seq(Literal(5.0), Literal(250.0), Literal(999.0)))
    assert(!ZoneMapFileIndex.mayMatch(inMiss, zone100))
    val inHit = In(a, Seq(Literal(5.0), Literal(150.0)))
    assert(ZoneMapFileIndex.mayMatch(inHit, zone100))
    assert(!ZoneMapFileIndex.mayMatch(
      InSet(a, Set[Any](5.0, 250.0)), zone100))
    assert(ZoneMapFileIndex.mayMatch(
      InSet(a, Set[Any](5.0, 150.0)), zone100))
  }

  test("mayMatch: null tests use the sidecar null counts; all-null file " +
      "fails every comparison") {
    val a = attr("v", DoubleType)
    assert(!ZoneMapFileIndex.mayMatch(IsNull(a), zone100)) // 0 nulls
    assert(ZoneMapFileIndex.mayMatch(IsNull(a), zoneNull))
    assert(ZoneMapFileIndex.mayMatch(IsNotNull(a), zone100))
    assert(!ZoneMapFileIndex.mayMatch(IsNotNull(a), zoneNull))
    // comparisons and IN on an all-null file match no row
    assert(!ZoneMapFileIndex.mayMatch(EqualTo(a, Literal(1.0)), zoneNull))
    assert(!ZoneMapFileIndex.mayMatch(
      In(a, Seq(Literal(1.0), Literal(2.0))), zoneNull))
    // null-safe equality against null = IS NULL semantics
    assert(!ZoneMapFileIndex.mayMatch(
      EqualNullSafe(a, Literal(null, DoubleType)), zone100))
    assert(ZoneMapFileIndex.mayMatch(
      EqualNullSafe(a, Literal(null, DoubleType)), zoneNull))
  }

  test("mayMatch: string equality and prefix; cast stays conservative") {
    val s = attr("src", StringType)
    def sz(lo: String, hi: String) = Map("src" -> ColumnZone(None, None,
      Some(UTF8String.fromString(lo).getBytes),
      Some(UTF8String.fromString(hi).getBytes), Some(0L), Some(10L)))
    assert(ZoneMapFileIndex.mayMatch(
      EqualTo(s, Literal(UTF8String.fromString("web"), StringType)),
      sz("app", "zzz")))
    assert(!ZoneMapFileIndex.mayMatch(
      EqualTo(s, Literal(UTF8String.fromString("web"), StringType)),
      sz("a", "m")))
    val pre = StartsWith(s,
      Literal(UTF8String.fromString("s3://a/"), StringType))
    assert(ZoneMapFileIndex.mayMatch(pre, sz("s3://a/x", "s3://a/z")))
    assert(!ZoneMapFileIndex.mayMatch(pre, sz("s3://b/", "s4://")))
    // cast-wrapped attribute: no pruning
    val cast = GreaterThan(Cast(attr("v", LongType), DoubleType),
      Literal(5.0))
    assert(ZoneMapFileIndex.mayMatch(cast,
      Map("v" -> ColumnZone(Some(0.0), Some(1.0), None, None,
        Some(0L), Some(5L)))))
    assert(!ZoneMapFileIndex.isPrunable(cast))
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
    // a fifth file whose v is ALL NULL: null-count pruning fodder
    def nullBatch(lo: Int, n: Int) = {
      val raw = spark.range(lo, lo + n).select(
        col("id").as("event_id"),
        expr("timestamp '2024-03-05 00:00:00' + make_interval(0,0,0,0,0,0, id*1000)")
          .as("tp_timestamp"),
        lit("0").as("idx"),
        lit(null).cast("double").as("v"),
        concat(lit("p0-null-"), col("id")).as("src"))
      TpSchema.enrich(raw, PartitionSpec("tz", "p0",
        tpIndexColumn = Some("idx")))
    }
    lake.append(spark, "tz", batch("p0", 0, 100))
    lake.append(spark, "tz", batch("p0", 100, 100))
    lake.append(spark, "tz", batch("p0", 200, 100))
    lake.append(spark, "tz", batch("p1", 300, 100))
    lake.append(spark, "tz", nullBatch(1000, 50))
    lake.enableColumnStats(spark, "tz", Seq("v", "src"))
    val total = lake.dataFiles(spark, "tz").size
    assert(total >= 5, s"fixture must have >=5 files, got $total")
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

  test("IN-list predicates prune to the files holding the listed values") {
    val (lake, total) = bandedLake()
    Views.register(spark, lake, Views.Filters())
    // two values, two files (the all-null file fails any comparison)
    val q = spark.sql("SELECT count(*) AS n FROM tz WHERE v IN (10, 205)")
    val files = ScanAudit.filesReadAfterRun(q)
    assert(files === 2, s"IN should isolate 2 of $total files, read $files")
    assert(q.head().getLong(0) === 2)
    // a list long enough for OptimizeIn to rewrite into InSet
    val many = (5 to 18).mkString(", ") // 14 values, all in file 1
    val q2 = spark.sql(s"SELECT count(*) AS n FROM tz WHERE v IN ($many)")
    val files2 = ScanAudit.filesReadAfterRun(q2)
    assert(files2 === 1, s"InSet should isolate 1 of $total files, read $files2")
    assert(q2.head().getLong(0) === 14)
  }

  test("OR'd bands prune the files both branches miss") {
    val (lake, total) = bandedLake()
    Views.register(spark, lake, Views.Filters())
    // misses file [100,199] and the all-null file; keeps 3
    val q = spark.sql(
      "SELECT count(*) AS n FROM tz WHERE v < 50 OR v > 250")
    val files = ScanAudit.filesReadAfterRun(q)
    assert(files === 3, s"OR bands should isolate 3 of $total files, read $files")
    assert(q.head().getLong(0) === 50 + 49 + 100)
  }

  test("IS NULL / IS NOT NULL prune via the sidecar null counts") {
    val (lake, total) = bandedLake()
    Views.register(spark, lake, Views.Filters())
    val qNull = spark.sql("SELECT count(*) AS n FROM tz WHERE v IS NULL")
    val filesNull = ScanAudit.filesReadAfterRun(qNull)
    assert(filesNull === 1,
      s"IS NULL should isolate the all-null file, read $filesNull of $total")
    assert(qNull.head().getLong(0) === 50)
    val qNotNull = spark.sql(
      "SELECT count(*) AS n FROM tz WHERE v IS NOT NULL")
    val filesNotNull = ScanAudit.filesReadAfterRun(qNotNull)
    assert(filesNotNull === total - 1,
      s"IS NOT NULL should skip the all-null file: $filesNotNull of $total")
    assert(qNotNull.head().getLong(0) === 400)
  }

  test("SQL time band prunes via manifest-derived tp_timestamp zones") {
    val (lake, total) = bandedLake()
    Views.register(spark, lake, Views.Filters())
    // ts = base + id*1000 SECONDS, so file 2 (ids 100..199) spans
    // [2024-03-06 03:46:40, 2024-03-07 07:16:40]; this band sits
    // strictly inside it → ids 101..172 = 72 rows, 1 file
    val q = spark.sql("""
      SELECT count(*) AS n FROM tz
      WHERE tp_timestamp >= timestamp'2024-03-06 04:00:00'
        AND tp_timestamp < timestamp'2024-03-07 00:00:00'""")
    val files = ScanAudit.filesReadAfterRun(q)
    assert(files === 1,
      s"time zones should isolate 1 of $total files, read $files")
    assert(q.head().getLong(0) === 72)
  }

  test("tp_date equality prunes via the ±1-day-widened manifest day range") {
    val (lake, total) = bandedLake()
    Views.register(spark, lake, Views.Filters())
    // a date far outside every file's range: all files pruned
    val qMiss = spark.sql(
      "SELECT count(*) AS n FROM tz WHERE tp_date = date'2030-01-01'")
    assert(ScanAudit.filesReadAfterRun(qMiss) === 0)
    assert(qMiss.head().getLong(0) === 0)
    // the fixture's first day: Mar 5 rows are ids 0..86 (86400 s cut)
    val qHit = spark.sql(
      "SELECT count(*) AS n FROM tz WHERE tp_date = date'2024-03-05'")
    assert(qHit.head().getLong(0) === 87)
    // one day past the p1 file's widened range: files read only where
    // widening keeps them (conservative) but row filtering yields zero
    val qEdge = spark.sql(
      "SELECT count(*) AS n FROM tz WHERE tp_date = date'2024-03-10'")
    assert(qEdge.head().getLong(0) === 0)
  }

  test("time zones prune tables with NO colstats sidecar (manifest only)") {
    val lake = Lake(Files.createTempDirectory("graft_zonemap_ts").toString)
    def batch(lo: Int, n: Int) = {
      val raw = spark.range(lo, lo + n).select(
        col("id").as("event_id"),
        expr("timestamp '2024-03-05 00:00:00' + make_interval(0,0,0,0,0,0, id*1000)")
          .as("tp_timestamp"),
        lit("0").as("idx"), col("id").cast("double").as("v"))
      TpSchema.enrich(raw, PartitionSpec("tt", "p0",
        tpIndexColumn = Some("idx")))
    }
    lake.append(spark, "tt", batch(0, 100))
    lake.append(spark, "tt", batch(100, 100))
    // deliberately NO enableColumnStats
    val total = lake.dataFiles(spark, "tt").size
    assert(total >= 2)
    // file 2 starts at id 100 → 100000 s → 2024-03-06 03:46:40; a
    // cut at 04:00 keeps ids 101..199 = 99 rows, all in file 2
    val cut = lit("2024-03-06 04:00:00").cast("timestamp")
    val q = lake.read(spark, "tt")
      .where(col("tp_timestamp") >= cut)
      .agg(count(lit(1)).as("n"))
    val files = ScanAudit.filesReadAfterRun(q)
    assert(files === 1,
      s"manifest time zones should isolate 1 of $total files, read $files")
    assert(lake.read(spark, "tt")
      .where(col("tp_timestamp") >= cut).count() === 99)
  }

  test("time zones and value zones compose in one predicate") {
    val (lake, total) = bandedLake()
    Views.register(spark, lake, Views.Filters())
    // the time band alone keeps files 1-2 (ids 0..172); the value band
    // alone keeps file 2 (v 100..199) and within it rows 150..199; the
    // intersection must read exactly 1 file and return ids 150..172
    val q = spark.sql("""
      SELECT count(*) AS n, min(event_id) AS lo, max(event_id) AS hi
      FROM tz
      WHERE tp_timestamp < timestamp'2024-03-07 00:00:00'
        AND v >= 150""")
    val files = ScanAudit.filesReadAfterRun(q)
    assert(files === 1,
      s"time+value zones should isolate 1 of $total files, read $files")
    val r = q.head()
    assert(r.getLong(0) === 23 && r.getLong(1) === 150 && r.getLong(2) === 172)
  }

  test("conservativeness holds for time bands: zoned vs plain identical") {
    val (lake, _) = bandedLake()
    val zoned = lake.read(spark, "tz")
    val plain = spark.read.option("basePath", lake.tableDir("tz"))
      .parquet(lake.tableDir("tz"))
    for ((lo, hi) <- Seq(
        ("2024-03-05 00:00:00", "2024-03-06 04:00:00"), // spans files 1-2
        ("2024-03-07 00:00:00", "2024-03-08 12:00:00"), // spans files 3-4
        ("2024-03-16 00:00:00", "2024-03-18 00:00:00"), // the null-v file
        ("2024-03-04 00:00:00", "2024-03-20 00:00:00"))) { // everything
      def f(df: org.apache.spark.sql.DataFrame) = df
        .where(col("tp_timestamp") >= lit(lo).cast("timestamp") &&
          col("tp_timestamp") <= lit(hi).cast("timestamp"))
        .agg(count(lit(1)), sum("event_id")).head()
      assert(f(zoned) === f(plain), s"time band [$lo,$hi]")
    }
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

  test("a long-lived view stays fresh across appends: scanned path " +
      "sees new files and new zones (no stale pruning)") {
    val (lake, _) = bandedLake()
    Views.register(spark, lake, Views.Filters())
    val sql = "SELECT count(*) AS n FROM tz WHERE v >= 120 AND v <= 600"
    val before = spark.sql(sql).head().getLong(0)
    assert(before === 280L) // v = id for ids 120..399
    // append a NEW file inside the band WITHOUT re-registering: the
    // registration-time InMemoryFileIndex snapshot would miss it, and
    // r16's lazy-once zones could prune on stale ranges — the owner
    // token probe must re-list and re-derive (r16 verdict task 4 +
    // ADVICE-low freshness divergence)
    val more = spark.range(500, 520).select(
      col("id").as("event_id"),
      expr("timestamp '2024-03-05 00:00:00'").as("tp_timestamp"),
      lit("0").as("idx"),
      col("id").cast("double").as("v"),
      concat(lit("p0-"), col("id")).as("src"))
    lake.append(spark, "tz",
      TpSchema.enrich(more, PartitionSpec("tz", "p0",
        tpIndexColumn = Some("idx"))))
    val after = spark.sql(sql).head().getLong(0)
    assert(after === before + 20L,
      "the scanned path must see rows appended after registration")
    // and the REWRITTEN path agrees with the scanned path — the r16
    // fresh-vs-stale divergence is gone in the fresh direction
    val counted = spark.sql("SELECT count(*) AS n FROM tz")
    assert(ScanAudit.filesReadAfterRun(counted) === 0)
    assert(counted.head().getLong(0) === 470L)
    val scanned = spark.sql(
      "SELECT count(*) AS n FROM tz WHERE v IS NOT NULL OR v IS NULL")
    assert(scanned.head().getLong(0) === 470L)
  }

  test("explicit refresh() clears the freshness token and re-lists") {
    val (lake, _) = bandedLake()
    val df = lake.read(spark, "tz")
    val idx = df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if lr.relation.isInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation] =>
        lr.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location
    }.collect { case z: ZoneMapFileIndex => z }
    assert(idx.isDefined, "lake reads must go through ZoneMapFileIndex")
    idx.get.refresh() // must not throw; next listFiles re-lists
    assert(df.count() === 450L)
  }

  test("freshness probes run against the OWNING session: listFiles " +
      "re-lists after an append even with no active session") {
    // r17 verdict nit 1: ensureFresh used SparkSession.active, so in a
    // multi-session JVM (Spark Connect-style serving) the token probe
    // ran with whatever session the CALLING thread had active — a
    // different tenant's conf, or none at all (then `active` throws).
    // The index now pins the session that built it.
    val (lake, _) = bandedLake()
    val df = lake.read(spark, "tz")
    val idx = df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if lr.relation.isInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation] =>
        lr.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location
    }.collect { case z: ZoneMapFileIndex => z }
    assert(idx.isDefined, "lake reads must go through ZoneMapFileIndex")
    val before = idx.get.listFiles(Nil, Nil).map(_.files.size).sum
    val more = spark.range(900, 920).select(
      col("id").as("event_id"),
      expr("timestamp '2024-03-05 00:00:00'").as("tp_timestamp"),
      lit("0").as("idx"),
      col("id").cast("double").as("v"),
      concat(lit("p0-"), col("id")).as("src"))
    lake.append(spark, "tz",
      TpSchema.enrich(more, PartitionSpec("tz", "p0",
        tpIndexColumn = Some("idx"))))
    // a thread with NO active/default session — the serving shape the
    // nit describes; SparkSession.active would throw here
    import org.apache.spark.sql.SparkSession
    val active = SparkSession.getActiveSession
    val default = SparkSession.getDefaultSession
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val after = idx.get.listFiles(Nil, Nil).map(_.files.size).sum
      assert(after > before,
        "the owner-session probe must detect the append and re-list")
    } finally {
      active.foreach(SparkSession.setActiveSession)
      default.foreach(SparkSession.setDefaultSession)
    }
  }

  test("no sidecar: value predicates read everything, results intact") {
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
