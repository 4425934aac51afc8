package graft.ingest

import java.io.{BufferedReader, BufferedWriter, File, FileWriter, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.{FormatSpec, SourceSpec}

/** The `process` source: run `command` as a CHILD process and stream
  * its stdout JSONL into staged chunk files of `chunk_rows` rows — the
  * engine's out-of-process plugin boundary, after the reference's
  * plugin manager + SDK chunking contract
  * (/root/reference/internal/plugin/plugin_manager.go:74-166: every
  * plugin is a separate process; internal/collector/collector.go:427-441:
  * rows arrive as chunk files the converter then ingests).
  *
  * Crash isolation is the point of the boundary: a child that dies
  * mid-stream must not take the CLI down or poison the lake. The CHUNK
  * is the atomic unit, exactly as in the reference SDK — on a non-zero
  * exit (or a broken pipe) the in-flight partial chunk is discarded
  * (its final line may be truncated mid-JSON) and the completed chunks
  * are surfaced via [[ProcessSource.PartialStream]] so the collect path
  * can ingest them and report a clean error. On clean exit the trailing
  * partial chunk is real data and becomes the final chunk.
  *
  * The child runs on the DRIVER, like the reference's plugin processes
  * run beside the CLI: a process source is an acquisition boundary
  * (API pager, exporter binary), not a parallel compute step — the
  * staged chunks are then converted by the normal distributed pipeline.
  */
object ProcessSource extends SourceAdapter {
  val kind = "process"
  val version = "1.0.0"
  val description = "Collect from a child process streaming JSONL on stdout"

  /** Child died mid-stream: `chunks` are the COMPLETED staged chunk
    * files (possibly empty), safe to ingest; `cause` is the clean error
    * for the user (exit code + stderr tail).
    */
  final case class PartialStream(
      chunks: Seq[String], rowsStaged: Long, cause: String)
    extends RuntimeException(cause)

  /** Max bytes of child stderr retained for the error message. */
  private val StderrTailBytes = 4096

  def read(
      spark: SparkSession, source: SourceSpec, format: Option[FormatSpec],
      from: Option[Timestamp], to: Option[Timestamp],
      progress: String => Unit): DataFrame = {
    val chunks = stage(source, progress)
    require(chunks.nonEmpty,
      s"process source produced no rows: ${source.command.getOrElse("")}")
    spark.read.json(chunks: _*)
  }

  /** Run the child to completion, staging stdout JSONL into chunk
    * files. Returns the staged chunk paths; throws [[PartialStream]]
    * on child failure.
    */
  def stage(source: SourceSpec, progress: String => Unit): Seq[String] = {
    val command = source.command.getOrElse(throw new IllegalArgumentException(
      "source \"process\" requires command = \"<shell command>\""))
    val chunkRows = source.chunkRows
    require(chunkRows > 0, s"chunk_rows must be positive, got $chunkRows")

    val stageDir = Files.createTempDirectory("graft_process_chunks_").toFile
    val proc = new ProcessBuilder("/bin/sh", "-c", command).start()

    // drain stderr concurrently — a child blocked on a full stderr pipe
    // would deadlock the stdout read loop; keep a bounded tail for the
    // error message
    val stderrTail = new StringBuilder
    val stderrDrain = new Thread(() => {
      val r = new BufferedReader(new InputStreamReader(
        proc.getErrorStream, StandardCharsets.UTF_8))
      try {
        var line = r.readLine()
        while (line != null) {
          stderrTail.synchronized {
            stderrTail.append(line).append('\n')
            if (stderrTail.length > StderrTailBytes)
              stderrTail.delete(0, stderrTail.length - StderrTailBytes)
          }
          line = r.readLine()
        }
      } catch { case _: java.io.IOException => () } finally r.close()
    }, "graft-process-stderr")
    stderrDrain.setDaemon(true)
    stderrDrain.start()

    val completed = ArrayBuffer.empty[String]
    var chunkIdx = 0
    var rowsInChunk = 0
    var rowsTotal = 0L
    var chunkFile: File = null
    var writer: BufferedWriter = null

    def closeChunk(): Unit = if (writer != null) {
      writer.close(); writer = null
      completed += chunkFile.getPath
      progress(s"  chunk $chunkIdx: $rowsInChunk rows staged")
      chunkIdx += 1; rowsInChunk = 0; chunkFile = null
    }
    def discardPartial(): Unit = if (writer != null) {
      writer.close(); writer = null
      chunkFile.delete(); chunkFile = null
    }

    var streamError: Option[String] = None
    val stdout = new BufferedReader(new InputStreamReader(
      proc.getInputStream, StandardCharsets.UTF_8))
    try {
      var line = stdout.readLine()
      while (line != null) {
        if (line.trim.nonEmpty) {
          if (writer == null) {
            chunkFile = new File(stageDir, f"chunk_$chunkIdx%06d.jsonl")
            writer = new BufferedWriter(new FileWriter(chunkFile))
          }
          writer.write(line); writer.newLine()
          rowsInChunk += 1; rowsTotal += 1
          if (rowsInChunk >= chunkRows) closeChunk()
        }
        line = stdout.readLine()
      }
    } catch {
      case e: java.io.IOException => streamError = Some(e.getMessage)
    } finally stdout.close()

    val exitCode = proc.waitFor()
    stderrDrain.join(2000)
    val errTail = stderrTail.synchronized(stderrTail.toString.trim)

    if (exitCode != 0 || streamError.isDefined) {
      val staged = rowsTotal - rowsInChunk // drop the in-flight partial
      discardPartial()
      val why = streamError.map(e => s"stream error: $e").getOrElse(
        s"exited with code $exitCode")
      throw PartialStream(completed.toSeq, staged,
        s"process source '$command' $why after ${completed.size} complete " +
          s"chunk(s)" + (if (errTail.nonEmpty) s"; stderr: $errTail" else ""))
    }
    closeChunk() // clean exit: the trailing partial chunk is real data
    completed.toSeq
  }
}
