package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.config.PartitionSpec
import graft.query.{ScanAudit, Views}

/** [[Lake.metaSnapshot]] memoization (r17 verdict task 3): the
  * optimize-time metadata probe used to re-read the manifest + sidecar
  * per candidate query — N consecutive metadata-served queries paid
  * the manifest read N times, and once files aren't scanned the probe
  * latency IS the query latency. Now the collected snapshot caches per
  * (root, table) keyed by a metadata-dir change token, so repeats cost
  * one cheap dir listing; any mutation (new manifest/sidecar part
  * files, dir swaps) moves the token and rebuilds exactly once.
  */
class MetaCacheSpec extends AnyFunSuite with SparkTest {

  private def build(): (Lake, String) = {
    val lake = Lake(Files.createTempDirectory("graft_metacache").toString)
    val spec = PartitionSpec("mc", "p0", tpIndexColumn = Some("idx"))
    def batch(lo: Int) = {
      val raw = spark.range(lo, lo + 100).select(
        col("id").as("event_id"),
        expr("timestamp '2024-03-05 00:00:00' + " +
          "make_interval(0,0,0,0,0,0, id*1000)").as("tp_timestamp"),
        lit("0").as("idx"),
        col("id").cast("double").as("v"))
      TpSchema.enrich(raw, spec)
    }
    for (lo <- Seq(0, 100, 200)) lake.append(spark, "mc", batch(lo))
    lake.enableColumnStats(spark, "mc", Seq("v", "tp_timestamp"))
    Views.register(spark, lake, Views.Filters())
    (lake, "mc")
  }

  test("N consecutive metadata-served queries build the snapshot once") {
    val (lake, t) = build()
    val (_, m0) = Lake.metaCacheStats(lake.root, t)
    val sqls = Seq(
      s"SELECT count(*) AS n FROM $t",
      s"SELECT min(v) AS mn, max(v) AS mx FROM $t",
      s"SELECT count(v) AS nv, max(v) AS mx FROM $t",
      s"SELECT count(*) AS n, min(v) AS mn FROM $t")
    sqls.foreach { q =>
      val df = spark.sql(q)
      assert(ScanAudit.filesReadAfterRun(df) === 0, s"not scan-free: $q")
    }
    val (h1, m1) = Lake.metaCacheStats(lake.root, t)
    assert(m1 - m0 <= 1,
      s"expected at most ONE snapshot build across ${sqls.size} " +
        s"metadata-served queries, got ${m1 - m0} misses")
    assert(h1 >= sqls.size - 1, "later probes must be cache hits")
  }

  test("a mutation moves the token and rebuilds exactly once") {
    val (lake, t) = build()
    assert(spark.sql(s"SELECT count(*) AS n FROM $t").head().getLong(0)
      === 300L)
    val (_, m0) = Lake.metaCacheStats(lake.root, t)
    val more = spark.range(1000, 1010).select(
      col("id").as("event_id"),
      expr("timestamp '2024-06-01 00:00:00'").as("tp_timestamp"),
      lit("0").as("idx"), col("id").cast("double").as("v"))
    lake.append(spark, t, TpSchema.enrich(more,
      PartitionSpec(t, "p0", tpIndexColumn = Some("idx"))))
    // fresh answer through the rewrite, exactly one rebuild
    val q = spark.sql(s"SELECT count(*) AS n, max(v) AS mx FROM $t")
    assert(ScanAudit.filesReadAfterRun(q) === 0)
    val r = q.head()
    assert(r.getLong(0) === 310L)
    assert(r.getDouble(1) === 1009.0)
    spark.sql(s"SELECT min(v) AS mn FROM $t").collect()
    val (_, m1) = Lake.metaCacheStats(lake.root, t)
    assert(m1 - m0 === 1,
      s"append must invalidate once and only once, got ${m1 - m0}")
  }

  test("the snapshot cache is bounded: LRU eviction past the cap, " +
    "evicted tables rebuild on re-access") {
    // a real table first, so eviction-then-rebuild is pinned end to end
    val (lake, t) = build()
    val q0 = spark.sql(s"SELECT count(*) AS n FROM $t")
    assert(graft.query.ScanAudit.filesReadAfterRun(q0) === 0)
    assert(q0.head().getLong(0) === 300L)
    val realKey = s"${lake.root}#$t"
    assert(Lake.cachedSnapshotKeys.contains(realKey))
    // flood the JVM-wide cache well past the cap (the fake entries
    // stand in for months of ephemeral tables; building 70 real lakes
    // would pin the same thing in minutes instead of milliseconds)
    val fakes = (0 until Lake.MetaSnapshotCacheMax + 8)
      .map(i => s"/graft_fake_root_$i#t")
    fakes.foreach(k => Lake.storeSnapshot(k,
      Lake.MetaSnapshot(s"tok_$k", Map.empty, Map.empty)))
    assert(Lake.cachedSnapshotKeys.size <= Lake.MetaSnapshotCacheMax,
      s"cache must stay bounded at ${Lake.MetaSnapshotCacheMax}, " +
        s"got ${Lake.cachedSnapshotKeys.size}")
    assert(Lake.cachedSnapshot(fakes.head).isEmpty,
      "the eldest entry past the cap must be evicted")
    assert(Lake.cachedSnapshot(fakes.last).isDefined,
      "the newest entry must survive")
    assert(Lake.cachedSnapshot(realKey).isEmpty,
      "the real table (oldest of all) must have been evicted")
    // re-access: the evicted table rebuilds exactly once and serves
    // the same scan-free answer
    val (_, m0) = Lake.metaCacheStats(lake.root, t)
    val q1 = spark.sql(s"SELECT count(*) AS n, max(v) AS mx FROM $t")
    assert(graft.query.ScanAudit.filesReadAfterRun(q1) === 0)
    assert(q1.head().getLong(0) === 300L)
    spark.sql(s"SELECT min(v) AS mn FROM $t").collect()
    val (_, m1) = Lake.metaCacheStats(lake.root, t)
    assert(m1 - m0 === 1,
      s"evicted snapshot must rebuild exactly once, got ${m1 - m0}")
  }
}
