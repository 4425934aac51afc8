package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — Spark's co-located join machinery.
  *
  * A table written with `bucketBy(n, key)` records its hash layout in
  * the catalog; every later join or aggregation keyed on `key` reads
  * the buckets as pre-shuffled input and plans with NO exchange on
  * that side. This is the 100 TB answer to "we join/group on this key
  * every day": pay the shuffle once at write time, then every
  * downstream join of two same-bucketed tables is exchange-free, and
  * a groupBy on the bucket key needs no shuffle at all (Spark SQL
  * bucketing, SPARK-12394 lineage; the same physical idea as Hive
  * bucketed tables).
  *
  * Beyond-reference: the reference engine plans single-node queries
  * and has no notion of a persistent partitioning contract
  * (tailpipe's layout is time/index partition dirs only —
  * `internal/parquet/` writes no clustering metadata).
  *
  * qi17 drives this end to end and PlanAuditSpec pins the property
  * that makes it scale: the bucketed join + same-key aggregate plan
  * contains ZERO ShuffleExchange nodes.
  */
object Bucketing {

  /** Write `df` as an external bucketed parquet table (hash layout on
    * `key`, `buckets` buckets, bucket-sorted files) registered under
    * `table` in the session catalog. Overwrites any prior layout: the
    * catalog entry is dropped first so a bucket-count or schema change
    * cannot silently collide with stale metadata.
    */
  def writeBucketed(
      spark: SparkSession, df: DataFrame, table: String,
      key: String, buckets: Int, path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }
}
