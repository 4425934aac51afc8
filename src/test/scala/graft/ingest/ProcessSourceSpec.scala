package graft.ingest

import java.io.File
import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.config.SourceSpec

/** Staging mechanics of the `process` source: chunk boundaries, blank
  * lines, partial-chunk atomicity on crash, stderr capture, and the
  * stderr-pipe deadlock guard.
  */
class ProcessSourceSpec extends AnyFunSuite with SparkTest {

  private def spec(cmd: String, chunkRows: Int = 3) =
    SourceSpec("process", command = Some(cmd), chunkRows = chunkRows)

  private def lines(f: String): Seq[String] = {
    val src = scala.io.Source.fromFile(f)
    try src.getLines().toList finally src.close()
  }

  test("stage chunks stdout at chunk_rows; trailing partial kept on clean exit") {
    val progress = ArrayBuffer.empty[String]
    val chunks = ProcessSource.stage(
      spec("seq 1 7 | sed 's/.*/{\"n\": &}/'", chunkRows = 3), progress += _)
    assert(chunks.size == 3)
    assert(chunks.map(c => lines(c).size) == Seq(3, 3, 1))
    assert(lines(chunks.head).head == "{\"n\": 1}")
    assert(progress.toSeq == Seq(
      "  chunk 0: 3 rows staged",
      "  chunk 1: 3 rows staged",
      "  chunk 2: 1 rows staged"))
  }

  test("blank lines are skipped, not staged") {
    val chunks = ProcessSource.stage(
      spec("printf '{\"n\": 1}\\n\\n  \\n{\"n\": 2}\\n'", chunkRows = 10),
      _ => ())
    assert(chunks.map(c => lines(c).size) == Seq(2))
  }

  test("crash discards the in-flight partial chunk, keeps completed ones") {
    val e = intercept[ProcessSource.PartialStream] {
      ProcessSource.stage(
        spec("seq 1 5 | sed 's/.*/{\"n\": &}/'; echo oops >&2; exit 9",
          chunkRows = 2), _ => ())
    }
    assert(e.chunks.size == 2)          // rows 1-2, 3-4 complete
    assert(e.rowsStaged == 4)           // row 5 (in-flight) discarded
    assert(e.cause.contains("exited with code 9"), e.cause)
    assert(e.cause.contains("stderr: oops"), e.cause)
    e.chunks.foreach(c => assert(lines(c).size == 2))
  }

  test("crash before any complete chunk surfaces zero chunks") {
    val e = intercept[ProcessSource.PartialStream] {
      ProcessSource.stage(spec("echo '{\"n\": 1}'; exit 1", chunkRows = 5),
        _ => ())
    }
    assert(e.chunks.isEmpty)
    assert(e.rowsStaged == 0)
  }

  test("noisy stderr does not deadlock the stdout loop") {
    // 1 MiB of stderr would fill the pipe and block an undrained child
    val chunks = ProcessSource.stage(
      spec("i=0; while [ $i -lt 8192 ]; do echo xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx >&2; i=$((i+1)); done; echo '{\"n\": 1}'",
        chunkRows = 5), _ => ())
    assert(chunks.size == 1)
  }

  test("read returns a DataFrame over the staged chunks") {
    val df = ProcessSource.read(spark,
      spec("seq 1 4 | sed 's/.*/{\"n\": &}/'", chunkRows = 2),
      None, None, None, _ => ())
    assert(df.count() == 4)
    assert(df.columns.toSeq == Seq("n"))
  }

  test("missing command is a clean config error") {
    val e = intercept[IllegalArgumentException] {
      ProcessSource.stage(SourceSpec("process"), _ => ())
    }
    assert(e.getMessage.contains("requires command"))
  }
}
