package graft.config

import java.nio.file.{ClosedWatchServiceException, Files, Path,
  StandardWatchEventKinds => K, WatchService}
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

/** Load + merge every `*.tpc` or `*.hcl` file in a config directory
  * (the reference loads `*.tpc` files under `~/.tailpipe/config`,
  * internal/parse/load_config.go). Files merge in name order; later
  * files win on key collisions.
  */
object ConfigLoader {

  def isConfigFile(name: String): Boolean =
    name.endsWith(".tpc") || name.endsWith(".hcl")

  def loadDir(dir: String): Hcl.Config = {
    val d = new java.io.File(dir)
    val files =
      if (!d.isDirectory) Seq.empty
      else d.listFiles().toSeq
        .filter(f => isConfigFile(f.getName))
        .sortBy(_.getName)
    files.map(f => Hcl.decode(
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")))
      .foldLeft(Hcl.Config(Map.empty, Map.empty, Map.empty)) { (a, b) =>
        Hcl.Config(a.formats ++ b.formats, a.tables ++ b.tables,
          a.partitions ++ b.partitions, a.connections ++ b.connections,
          a.rollups ++ b.rollups)
      }
  }
}

/** Live config reload during an interactive session (reference
  * internal/file_watcher/connection_watcher.go:1-62): a daemon thread
  * watches the config dir and re-decodes the full merged config when a
  * `*.tpc`/`*.hcl` file is created, modified, or deleted. A file that
  * fails to parse keeps the previous config and reports a warning —
  * never tears down the session (connection_watcher.go:40-43 logs and
  * continues).
  *
  * Driver-side only by design: config is metadata, executors never see
  * this path.
  */
final class ConfigWatcher(
    dir: Path,
    onReload: Hcl.Config => Unit,
    onError: String => Unit = _ => ()) extends AutoCloseable {

  @volatile private var open = true

  private val service: Option[WatchService] =
    if (!Files.isDirectory(dir)) None
    else {
      val ws = dir.getFileSystem.newWatchService()
      dir.register(ws, K.ENTRY_CREATE, K.ENTRY_MODIFY, K.ENTRY_DELETE)
      Some(ws)
    }

  private val thread = service.map { ws =>
    val t = new Thread(() => run(ws), "graft-config-watcher")
    t.setDaemon(true)
    t.start()
    t
  }

  private def run(ws: WatchService): Unit =
    while (open) try {
      val key = ws.poll(200, TimeUnit.MILLISECONDS)
      if (key != null) {
        val relevant = key.pollEvents().asScala.exists { e =>
          e.context() match {
            case p: Path => ConfigLoader.isConfigFile(p.getFileName.toString)
            case _       => true // OVERFLOW → conservatively reload
          }
        }
        key.reset()
        if (relevant) {
          // debounce: editors fire create+modify bursts; settle, then
          // drain whatever else queued so one burst = one reload
          Thread.sleep(50)
          var k2 = ws.poll()
          while (k2 != null) { k2.pollEvents(); k2.reset(); k2 = ws.poll() }
          reload()
        }
      }
    } catch {
      case _: InterruptedException          => ()
      case _: ClosedWatchServiceException   => return
      case e: Exception                     => onError(errMsg(e))
    }

  private def reload(): Unit =
    try onReload(ConfigLoader.loadDir(dir.toString))
    catch {
      case e: Exception => onError(s"failed to reload config: ${errMsg(e)}")
    }

  private def errMsg(e: Exception): String =
    Option(e.getMessage).getOrElse(e.toString)

  override def close(): Unit = {
    open = false
    service.foreach(_.close())
    thread.foreach(_.join(2000))
  }
}
