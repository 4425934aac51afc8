package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.config.{PartitionSpec, RollupAggSpec, RollupSpec}

class RollupOpSpec extends AnyFunSuite with SparkTest {

  private def batch(startDay: String, n: Int) = {
    val raw = spark.range(n).select(
      col("id").as("event_id"),
      expr(s"timestamp '$startDay 00:00:00' + " +
        "make_interval(0,0,0,0,0,0, id * 3600)").as("tp_timestamp"),
      lit("a").as("idx"),
      (col("id") * 2).as("v"))
    TpSchema.enrich(raw, PartitionSpec("t", "p0",
      tpIndexColumn = Some("idx")))
  }

  private val rspec = RollupSpec("t", "daily",
    groupBy = Seq("tp_date"),
    aggs = Seq(RollupAggSpec("n", "count", None),
      RollupAggSpec("vsum", "sum", Some("v"))))

  private def rollupFiles(lake: Lake): Map[String, Long] = {
    def rec(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(rec) else Seq(f)
    rec(new java.io.File(Rollup.dir(lake, rspec)))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  test("refreshTouched recomputes only the touched months; " +
    "final rows equal a full rebuild") {
    val lake = Lake(Files.createTempDirectory("graft_rollup_op").toString)
    // January + February data
    val t1 = lake.append(spark, "t",
      batch("2024-01-10", 48).unionByName(batch("2024-02-10", 24)))
    assert(Rollup.refreshTouched(spark, lake, rspec, t1) == -1L) // bootstrap
    val febBefore = rollupFiles(lake).filter(_._1.contains("tp_month=2"))
    assert(febBefore.nonEmpty)

    // a second collect touches ONLY January
    val t2 = lake.append(spark, "t", batch("2024-01-11", 24))
    assert(Rollup.refreshTouched(spark, lake, rspec, t2) == 1L)

    // February rollup files are byte-for-byte the same ones on disk —
    // the refresh never rewrote the untouched month
    val febAfter = rollupFiles(lake).filter(_._1.contains("tp_month=2"))
    assert(febAfter == febBefore, s"$febBefore vs $febAfter")

    // January reflects both appends: the first batch's 48 hourly rows
    // cover Jan 10-11; the second adds 24 more on Jan 11
    val rows = Rollup.read(spark, lake, rspec)
      .select(col("tp_date").cast("string"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("2024-01-10") == 24L)
    assert(rows("2024-01-11") == 24L + 24L)
    assert(rows("2024-02-10") == 24L)

    // and the incremental result equals a from-scratch rebuild
    val incremental = Rollup.read(spark, lake, rspec)
      .collect().map(_.toString).sorted.toSeq
    Rollup.refresh(spark, lake, rspec)
    val full = Rollup.read(spark, lake, rspec)
      .collect().map(_.toString).sorted.toSeq
    assert(incremental == full)
  }

  test("refreshTouched with no touched dirs is a no-op") {
    val lake = Lake(Files.createTempDirectory("graft_rollup_op2").toString)
    lake.append(spark, "t", batch("2024-01-10", 5))
    Rollup.refresh(spark, lake, rspec)
    assert(Rollup.refreshTouched(spark, lake, rspec, Seq.empty) == 0L)
  }

  test("ndv aggregate: per-month sketch estimates are exact at small " +
    "cardinality and union across months without a raw scan") {
    val lake = Lake(Files.createTempDirectory("graft_rollup_ndv").toString)
    val nspec = RollupSpec("t", "users",
      groupBy = Seq("tp_date"),
      aggs = Seq(RollupAggSpec("uniq", "ndv", Some("event_id")),
        RollupAggSpec("n", "count", None)))
    // Jan: event_ids 0..47 over 2 days; Feb: 0..23 (overlapping ids)
    val t1 = lake.append(spark, "t",
      batch("2024-01-10", 48).unionByName(batch("2024-02-10", 24)))
    Rollup.refreshTouched(spark, lake, nspec, t1)

    val r = Rollup.read(spark, lake, nspec)
    // read() surfaces both the estimate and the raw sketch
    assert(r.columns.contains("uniq") && r.columns.contains("uniq_sketch"))
    // DataSketches HLL is exact at these cardinalities: each hourly
    // batch day holds 24 distinct event_ids
    val perDay = r.select(col("tp_date").cast("string"), col("uniq"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(perDay.values.forall(_ == 24L), perDay)

    // cross-month distinct via sketch union over ROLLUP rows only:
    // Jan ids 0..47 ∪ Feb ids 0..23 = 48 distinct
    val total = r.agg(
      hll_sketch_estimate(hll_union_agg(col("uniq_sketch"))).as("u"))
      .head().getLong(0)
    assert(total == 48L, total)

    // incremental month-scoped refresh maintains the sketches too
    val t2 = lake.append(spark, "t", batch("2024-03-05", 10))
    assert(Rollup.refreshTouched(spark, lake, nspec, t2) == 1L)
    val total2 = Rollup.read(spark, lake, nspec).agg(
      hll_sketch_estimate(hll_union_agg(col("uniq_sketch"))).as("u"))
      .head().getLong(0)
    assert(total2 == 48L) // ids 0..9 already counted
  }

  test("median aggregate: per-row KLL sketch is exact at small n and " +
    "MERGES across rollup rows for range medians without a raw scan") {
    val lake = Lake(Files.createTempDirectory("graft_rollup_med").toString)
    val mspec = RollupSpec("t", "vmed",
      groupBy = Seq("tp_date"),
      aggs = Seq(RollupAggSpec("vmed", "median", Some("v")),
        RollupAggSpec("n", "count", None)))
    // two days: v = id*2 over 0..23 per day (k=200 KLL stores all of
    // them exactly — the estimate IS the discrete median)
    val t1 = lake.append(spark, "t",
      batch("2024-01-10", 48).unionByName(batch("2024-02-10", 24)))
    Rollup.refreshTouched(spark, lake, mspec, t1)
    val r = Rollup.read(spark, lake, mspec)
    assert(r.columns.contains("vmed") && r.columns.contains("vmed_sketch"))
    // per-day medians, EXACT (k=200 retains all 24 values): the 48-row
    // hourly batch spans two days (ids 0..23 then 24..47, v = 2*id) —
    // inclusive p50 is the 12th smallest of each day
    val perDay = r.select(col("tp_date").cast("string"), col("vmed"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(perDay === Map("2024-01-10" -> 22.0, "2024-01-11" -> 70.0,
      "2024-02-10" -> 22.0), perDay)
    // cross-range median via sketch MERGE over ROLLUP rows only —
    // exact here (all values retained): Jan v ∈ {0..94 even} ∪ Feb
    // v ∈ {0..46 even}: 72 values, inclusive p50 = 36th smallest
    graft.functions.KllFns.register(spark)
    val merged = r.agg(
      expr("graft_kll_quantile(graft_kll_merge(vmed_sketch), 0.5d)")
        .as("m")).head().getDouble(0)
    val exact = lake.read(spark, "t")
      .agg(expr("percentile(v, 0.5)")).head().getDouble(0)
    assert(math.abs(merged - exact) <= 4.0,
      s"merged median $merged vs exact $exact")
    // incremental refresh maintains sketches
    val t2 = lake.append(spark, "t", batch("2024-03-05", 10))
    assert(Rollup.refreshTouched(spark, lake, mspec, t2) == 1L)
    assert(Rollup.read(spark, lake, mspec).count() >= perDay.size + 1)
  }

  test("avg aggregate: per-row quotient is exact and the sum+count " +
    "pair MERGES across rollup rows — cross-range avg without a scan") {
    val lake = Lake(Files.createTempDirectory("graft_rollup_avg").toString)
    val aspec = RollupSpec("t", "vavg",
      groupBy = Seq("tp_date"),
      aggs = Seq(RollupAggSpec("vavg", "avg", Some("v")),
        RollupAggSpec("n", "count", None)))
    // UNEVEN slice sizes make the trap visible: the day-averages are
    // 23.0 and 71.0 (24 rows each) and 11.0 (12 rows) — their naive
    // mean is 35, the true global avg 39.8; only the sum+count merge
    // gets it right
    val t1 = lake.append(spark, "t",
      batch("2024-01-10", 48).unionByName(batch("2024-02-10", 12)))
    Rollup.refreshTouched(spark, lake, aspec, t1)
    val r = Rollup.read(spark, lake, aspec)
    assert(r.columns.contains("vavg") &&
      r.columns.contains("vavg_sum") && r.columns.contains("vavg_n"))
    // per-day quotients, exact: v = 2*id, day 1 ids 0..23 → avg 23,
    // day 2 ids 24..47 → avg 71, Feb ids 0..11 → avg 11
    val perDay = r.select(col("tp_date").cast("string"), col("vavg"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(perDay === Map("2024-01-10" -> 23.0, "2024-01-11" -> 71.0,
      "2024-02-10" -> 11.0), perDay)
    // cross-range avg from ROLLUP rows only = Σsum/Σn, EXACT — equals
    // the raw-table recompute bit-for-bit (integral sums, one division)
    val merged = r.agg((sum(col("vavg_sum")).cast("double") /
      sum(col("vavg_n"))).as("a")).head().getDouble(0)
    val exact = lake.read(spark, "t")
      .agg(avg(col("v"))).head().getDouble(0)
    assert(merged === exact, s"merged avg $merged vs exact $exact")
    // and it differs from the naive avg-of-averages, pinning WHY the
    // pair is stored
    val naive = r.agg(avg(col("vavg"))).head().getDouble(0)
    assert(naive !== exact, "fixture must make avg-of-averages wrong")
    // incremental refresh maintains the pair; a re-read still merges
    val t2 = lake.append(spark, "t", batch("2024-03-05", 10))
    assert(Rollup.refreshTouched(spark, lake, aspec, t2) == 1L)
    val r2 = Rollup.read(spark, lake, aspec)
    val merged2 = r2.agg((sum(col("vavg_sum")).cast("double") /
      sum(col("vavg_n"))).as("a")).head().getDouble(0)
    val exact2 = lake.read(spark, "t")
      .agg(avg(col("v"))).head().getDouble(0)
    assert(merged2 === exact2)
  }

  test("an avg rollup dir in the PRE-pair layout triggers a full " +
    "rebuild on the next incremental refresh (layout migration)") {
    val lake = Lake(Files.createTempDirectory("graft_rollup_mig").toString)
    val aspec = RollupSpec("t", "vavg",
      groupBy = Seq("tp_date"),
      aggs = Seq(RollupAggSpec("vavg", "avg", Some("v"))))
    val t1 = lake.append(spark, "t",
      batch("2024-01-10", 24).unionByName(batch("2024-02-10", 12)))
    // simulate a rollup written BEFORE the mergeable sum/count layout:
    // a single `vavg` column per month row, no vavg_sum/vavg_n
    lake.read(spark, "t")
      .groupBy(col(TpSchema.Year), col(TpSchema.Month), col("tp_date"))
      .agg(avg(col("v")).as("vavg"))
      .write.partitionBy(TpSchema.Year, TpSchema.Month)
      .parquet(Rollup.dir(lake, aspec))
    // a touched-month refresh on the old layout must NOT dynamic-
    // overwrite only January (which would leave February's files in
    // the old schema): it detects the layout and rebuilds fully
    val t2 = lake.append(spark, "t", batch("2024-01-11", 12))
    assert(Rollup.refreshTouched(spark, lake, aspec, t2) == -1L,
      "old-layout rollup must fall back to a full refresh")
    val r = Rollup.read(spark, lake, aspec)
    assert(r.columns.contains("vavg_sum") && r.columns.contains("vavg_n"))
    // EVERY month is in the new layout (February included) and the
    // cross-range merge equals the raw recompute
    val merged = r.agg((sum(col("vavg_sum")).cast("double") /
      sum(col("vavg_n"))).as("a")).head().getDouble(0)
    val exact = lake.read(spark, "t")
      .agg(avg(col("v"))).head().getDouble(0)
    assert(merged === exact)
    // subsequent refreshes are incremental again
    val t3 = lake.append(spark, "t", batch("2024-01-12", 6))
    assert(Rollup.refreshTouched(spark, lake, aspec, t3) == 1L)
  }
}
