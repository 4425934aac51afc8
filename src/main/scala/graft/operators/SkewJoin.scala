package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for pathologically skewed keys (SURVEY §4 /
  * builder brief "salting for skew").
  *
  * AQE's skew-join split handles most skew at runtime, but it only
  * splits PARTITIONS — a single hot key larger than executor memory
  * still lands one task. Salting splits the KEY: the skewed (left)
  * side spreads each key over `factor` sub-keys by a deterministic
  * per-row hash; the build (right) side is replicated `factor` times.
  * Join output is row-identical to the unsalted join; cost trades
  * |R|×factor replication for |L| parallelism on hot keys — the right
  * trade when R is the dimension side.
  *
  * Determinism: the salt is a hash of ALL left columns (no `rand()`),
  * so retried tasks salt identically — required for exactly-once
  * job-commit semantics under failure.
  *
  * When to reach for this (measured, PERF.md "skew-join regimes"):
  * for BATCH skew prefer AQE's skew split with
  * `skewedPartitionThresholdInBytes` sized to the executor — it
  * matches salting on wall-clock (1.08 vs 1.10 s at 10M rows, 50% on
  * one key) and shuffles 3× fewer bytes, because salting replicates
  * the dim ×factor. Salting is the lever where AQE can't reach:
  * stateful streaming joins (AQE is off in stateful plans) and
  * shuffled-hash joins (AQE splits only sort-merge partitions).
  */
object SkewJoin {

  /** Inner or left-outer salted equi-join on `leftKey === rightKey`.
    *
    * @param rightCols right-side columns to carry (must not collide
    *                  with left column names)
    * @param factor    salt fan-out; size so |hottest key| / factor
    *                  fits a task comfortably
    */
  def salted(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      rightCols: Seq[String], factor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"salted join supports inner/left, got $joinType")
    val leftCols = left.columns.toSeq
    // salt on a per-ROW id, not a hash of the row's columns: column
    // hashing breaks on unhashable types (MapType analysis error) and
    // sends fully-identical duplicate rows — the most common hot key
    // in a crawl corpus — to ONE salt, keeping the hot task hot.
    // monotonically_increasing_id is partition-local arithmetic (no
    // shuffle); its nondeterminism across retries is harmless here
    // because the salt only routes rows, never changes the join result.
    val saltOf: Column =
      pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int")
    val l = left.withColumn("__salt", saltOf)
    val r = right
      .select(col(rightKey) +: rightCols.map(col): _*)
      .withColumn("__salt",
        explode(sequence(lit(0), lit(factor - 1)).cast("array<int>")))
    l.join(r,
        l(leftKey) === r(rightKey) && l("__salt") === r("__salt"),
        joinType)
      .select(leftCols.map(l(_)) ++ rightCols.map(r(_)): _*)
  }
}
