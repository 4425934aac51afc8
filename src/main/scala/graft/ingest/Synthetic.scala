package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic data generator — the engine's perf/load harness, matching
  * the reference's `synthetic_<N>cols_<M>rows_<C>chunk_<I>ms`
  * partitions (/root/reference/internal/collector/
  * collector_synthetic.go:26-120,386-445; arg parsing
  * cmd/collect.go:265-340).
  *
  * Spark-first: where the reference generates JSONL rows in goroutines
  * and feeds them back through its own ingest, we declare the dataset
  * as `spark.range(rows)` + per-column generator expressions — fully
  * distributed, codegen'd, zero driver-side row data, and scalable to
  * any row count the cluster can hold. Values are DETERMINISTIC
  * functions of the row index (the reference cycles `rowIndex%100000`
  * the same way), so runs are reproducible and oracle-friendly.
  */
object Synthetic {

  /** Parsed `synthetic_<N>cols_<M>rows_<C>chunk_<I>ms` spec
    * (cmd/collect.go:288-340). `chunkSize` maps to generation
    * partition sizing; `intervalMs` (a pacing concern for the
    * reference's streaming delivery) is parsed and carried but batch
    * generation does not sleep.
    */
  final case class Spec(cols: Int, rows: Long, chunkSize: Int, intervalMs: Int)

  private val SpecRe = """synthetic_(\d+)cols_(\d+)rows_(\d+)chunk_(\d+)ms""".r

  def parseSpec(arg: String): Option[Spec] = arg match {
    case SpecRe(c, r, ch, i) =>
      val s = Spec(c.toInt, r.toLong, ch.toInt, i.toInt)
      if (s.cols > 0 && s.rows > 0 && s.chunkSize > 0 && s.intervalMs > 0)
        Some(s)
      else None
    case _ => None
  }

  /** The 11-type template cycle (collector_synthetic.go:86-120). */
  val columnTemplates: Seq[String] = Seq(
    "string_col", "int_col", "float_col", "bool_col", "json_col",
    "timestamp_col", "array_col", "nested_json_col", "uuid_col",
    "simple_struct_col", "nested_struct_col")

  /** Generator expression for template index `i` over the row-index
    * column (value formulas mirror generateSyntheticValue,
    * collector_synthetic.go:570-640, with the generation window start
    * standing in for the reference's wall-clock `now`).
    */
  private def gen(name: String, template: String, idx: Column,
      from: Timestamp): Column = {
    val k = idx % 100000
    // from - (idx%30) days, computed in exact micros
    def back: Column = timestamp_micros(
      unix_micros(lit(from)) - (idx % 30) * 86400000000L)
    template match {
      case "string_col" => concat(lit(s"${name}_val"), k)
      case "int_col"    => (k + 1).cast("int")
      case "float_col"  => k.cast("double") * 0.1
      case "bool_col"   => idx % 2 === 0
      case "json_col" => to_json(struct(
        k.cast("int").as("field1"),
        concat(lit("field_"), k).as("field2"),
        (idx % 2 === 0).as("field3")))
      case "timestamp_col" =>
        date_format(back, "yyyy-MM-dd HH:mm:ss")
      case "array_col" => to_json(array(
        concat(lit("item_"), k), k.cast("string"), (idx % 2 === 0).cast("string")))
      case "nested_json_col" => to_json(struct(
        date_format(back, "yyyy-MM-dd").as("created_at"),
        concat(lit("v"), idx % 10, lit("."), idx % 5).as("version")))
      case "uuid_col" =>
        // deterministic uuid-shaped value from the row index
        val h = md5(concat(lit(name), idx.cast("string")))
        concat_ws("-",
          substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
          substring(h, 17, 4), substring(h, 21, 12))
      case "simple_struct_col" => struct(
        k.cast("int").as("id"),
        concat(lit("name_"), k).as("name"),
        (idx % 2 === 0).as("active"))
      case "nested_struct_col" => struct(struct(
        date_format(back, "yyyy-MM-dd").as("created_at"),
        concat(lit("v"), idx % 10, lit("."), idx % 5).as("version"))
        .as("metadata"))
    }
  }

  /** The synthetic batch: `spec.rows` rows × (5 tp_ fields +
    * `spec.cols` cycled columns). `tp_timestamp` is distributed evenly
    * across `[from, to]` by row index (collectSynthetic's
    * timestampInterval). Partitioned so each generation task emits
    * ~chunkSize rows (the reference's chunking knob).
    */
  def dataFrame(
      spark: SparkSession, spec: Spec,
      partition: String, table: String,
      from: Timestamp, to: Timestamp): DataFrame = {
    val nParts = math.max(1,
      math.min(spec.rows / math.max(spec.chunkSize, 1),
        10000L).toInt)
    val stepMicros =
      if (spec.rows <= 1) 0L
      else (to.getTime - from.getTime) * 1000L / (spec.rows - 1)
    val idx = col("id")
    val ts = timestamp_micros(unix_micros(lit(from)) + idx * stepMicros)
    val tpCols = Seq(
      ts.as("tp_timestamp"),
      lit(partition).as("tp_partition"),
      lit(table).as("tp_table"))
    val synth = (0 until spec.cols).map { i =>
      val template = columnTemplates(i % columnTemplates.size)
      gen(s"${template}_$i", template, idx, from).as(s"${template}_$i")
    }
    spark.range(0, spec.rows, 1, nParts)
      .select(tpCols ++ synth: _*)
  }
}
