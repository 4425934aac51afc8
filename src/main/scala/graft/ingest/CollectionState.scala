package graft.ingest

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.lake.Lake

/** Per-partition collection state — the engine's counterpart of the
  * reference's `collection_state.json` high-water mark (one JSON file
  * per partition next to the collection dir,
  * internal/plugin/plugin_manager.go:90-111,260-274): successive
  * `collect` runs with no `--from` resume from where the last one
  * stopped instead of re-reading the whole source.
  *
  * State lives at `<lake-root>/_graft_state/<table>.<partition>.json`
  * (underscore-prefixed → invisible to Spark table scans). `resumeFrom`
  * is the next collection's default window start:
  *  - an explicit `--to` bound becomes `resumeFrom` exactly (the window
  *    is `[from, to)`, so resuming AT `to` is gap-free and dup-free);
  *  - an unbounded collect stores max ingested `tp_timestamp` + 1µs
  *    (one past the last row at Spark's timestamp precision).
  */
object CollectionState {

  final case class State(resumeFrom: Timestamp, rowsCollected: Long)

  def path(lake: Lake, table: String, partition: String): Path =
    new Path(s"${lake.root}/_graft_state/$table.$partition.json")

  def read(
      spark: SparkSession, lake: Lake, table: String,
      partition: String): Option[State] = {
    val p = path(lake, table, partition)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text =
      try org.apache.commons.io.IOUtils.toString(in, StandardCharsets.UTF_8)
      finally in.close()
    val Re = """(?s).*"resume_from"\s*:\s*"([^"]+)".*"rows_collected"\s*:\s*(\d+).*""".r
    text match {
      case Re(ts, n) => Some(State(Timestamp.valueOf(ts), n.toLong))
      case _ => None
    }
  }

  /** Overwrite the state file (atomic enough: a torn write loses only
    * resume position, never data — the next collect just re-filters).
    */
  def write(
      spark: SparkSession, lake: Lake, table: String, partition: String,
      state: State): Unit = {
    val p = path(lake, table, partition)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      s"""{"resume_from": "${state.resumeFrom}", "rows_collected": ${state.rowsCollected}}"""
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Roll state forward after a successful collect. */
  def advance(
      spark: SparkSession, lake: Lake, table: String, partition: String,
      to: Option[Timestamp], result: Ingest.IngestResult): Unit = {
    val prev = read(spark, lake, table, partition)
    val next = to.orElse(result.maxTimestamp.map(plusOneMicro))
    next.foreach { n =>
      val resume = prev.map(_.resumeFrom).filter(_.after(n)).getOrElse(n)
      write(spark, lake, table, partition,
        State(resume, prev.map(_.rowsCollected).getOrElse(0L) +
          result.rowsIngested))
    }
  }

  private def plusOneMicro(t: Timestamp): Timestamp = {
    val out = new Timestamp(t.getTime)
    val nanos = t.getNanos + 1000
    if (nanos >= 1000000000) {
      out.setTime(t.getTime + 1000); out.setNanos(nanos - 1000000000)
    } else out.setNanos(nanos)
    out
  }
}
