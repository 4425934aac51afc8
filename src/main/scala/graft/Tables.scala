package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided shared tables (TESTDATA.md).
  *
  * Registers each parquet table as a temp view so queries can mix the
  * DataFrame API and `spark.sql`. Reads are plain parquet scans —
  * Catalyst pushes filters/projections into the scan, which is the
  * behavior we want at 100 TB (columnar pruning + row-group skipping).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader
    // rejects ([PARQUET_TYPE_ILLEGAL]); read nanos as long and floor-divide
    // to micros — identical to DuckDB's `cast(ts AS timestamp)` (ns → µs).
    // The nanosAsLong conf is necessarily SESSION-wide (the reader
    // consults it per scan), so a nanos column in any other table reads
    // as a raw Long — but the ns→µs CONVERSION below is scoped to
    // events.ts only, so a genuine long `ts` elsewhere passes through
    // untouched (ADVICE r1).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(dir, name))
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if name == "events" &&
          f.dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case _ => df
    }
  }

  /** Register all tables as temp views (idempotent, cheap — schema read
    * only; no data scan happens until an action).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { t => load(spark, dir, t).createOrReplaceTempView(t) }
}
