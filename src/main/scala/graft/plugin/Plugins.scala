package graft.plugin

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.security.MessageDigest

import graft.ingest.{SourceAdapter, SourceRegistry}

/** Plugin lifecycle — the engine's counterpart of the reference's
  * `plugin install/update/uninstall/list/show` surface
  * (reference cmd/plugin.go:76-238) backed by its OCI artifact
  * installer (reference internal/ociinstaller/: resolve a version
  * constraint against a registry, download, digest-verify, unpack into
  * the plugin dir, record the installed version + its constraint so
  * `update` re-resolves the SAME stream).
  *
  * Zero-egress Spark-native equivalent: the registry is a DIRECTORY of
  * versioned artifacts —
  *
  * {{{
  *   <registry>/<org>/<name>/<version>/plugin.json   descriptor
  *   <registry>/<org>/<name>/<version>/plugin.bin    payload
  * }}}
  *
  * and installing `org/name@constraint` resolves the best matching
  * version, verifies the payload's sha256 against the descriptor,
  * copies both files to `<configDir>/plugins/<org>/<name>/`, and
  * appends to `<configDir>/plugins/versions.json` (reference
  * plugin-versions file semantics: one installed version per plugin,
  * constraint remembered for update).
  *
  * A descriptor may name an `adapter_class` implementing
  * [[graft.ingest.SourceAdapter]]; [[registerInstalled]] instantiates
  * and registers it at session start, which is the in-process analogue
  * of the reference handing collection to the plugin binary — on a
  * Spark cluster the executors are the distribution mechanism, so the
  * adapter runs in the driver JVM and its reads parallelize like any
  * other source (SURVEY §7.3).
  */
object Plugins {

  /** `[registry/]org/name[@constraint]` — defaults org `graft`,
    * constraint `latest` (reference cmd/plugin.go:79-81: default
    * registry hub.tailpipe.io, default org turbot, default version
    * latest; the local-registry stand-in takes the registry from the
    * CLI/env, so a leading registry segment is accepted and ignored).
    */
  final case class Ref(org: String, name: String, constraint: String) {
    def slug: String = s"$org/$name"
  }

  def parseRef(s: String): Ref = {
    val (path, constraint) = s.indexOf('@') match {
      case -1 => (s, "latest")
      case i  => (s.take(i), s.drop(i + 1))
    }
    path.split('/').filter(_.nonEmpty).toSeq match {
      case Seq(name)         => Ref("graft", name, constraint)
      case Seq(org, name)    => Ref(org, name, constraint)
      case Seq(_, org, name) => Ref(org, name, constraint)
      case _ => throw new IllegalArgumentException(
        s"bad plugin ref '$s' (expected [registry/][org/]name[@version])")
    }
  }

  final case class Descriptor(
      org: String, name: String, version: String, description: String,
      sha256: String, tables: Seq[String], adapterClass: Option[String])

  /** Installed-plugin record: version file row. */
  final case class Installed(
      org: String, name: String, version: String, constraint: String)

  // ---- descriptor / version file IO (same small-state-file idiom as
  // ingest/CollectionState.scala: regex field extraction, no parser) --

  private def field(json: String, key: String): Option[String] = {
    val m = ("\"" + key + "\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(json)
    m.map(_.group(1))
  }

  private def arrayField(json: String, key: String): Seq[String] = {
    val m = ("\"" + key + "\"\\s*:\\s*\\[([^\\]]*)\\]").r.findFirstMatchIn(json)
    m.map(_.group(1).split(',').map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
  }

  def readDescriptor(dir: File): Descriptor = {
    val f = new File(dir, "plugin.json")
    require(f.isFile, s"no plugin.json in $dir")
    val json = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
    Descriptor(
      org = field(json, "org").getOrElse("graft"),
      name = field(json, "name").getOrElse(
        throw new IllegalArgumentException(s"plugin.json in $dir has no name")),
      version = field(json, "version").getOrElse(
        throw new IllegalArgumentException(s"plugin.json in $dir has no version")),
      description = field(json, "description").getOrElse(""),
      sha256 = field(json, "sha256").getOrElse(
        throw new IllegalArgumentException(s"plugin.json in $dir has no sha256")),
      tables = arrayField(json, "tables"),
      adapterClass = field(json, "adapter_class"))
  }

  def pluginsDir(configDir: String): File = new File(configDir, "plugins")

  private def versionsFile(configDir: String): File =
    new File(pluginsDir(configDir), "versions.json")

  def installedList(configDir: String): Seq[Installed] = {
    val f = versionsFile(configDir)
    if (!f.isFile) return Seq.empty
    val json = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
    val Row = """\{"plugin":\s*"([^/"]+)/([^@"]+)",\s*"version":\s*"([^"]+)",\s*"constraint":\s*"([^"]+)"\}""".r
    Row.findAllMatchIn(json)
      .map(m => Installed(m.group(1), m.group(2), m.group(3), m.group(4)))
      .toSeq.sortBy(i => (i.org, i.name))
  }

  private def writeInstalledList(configDir: String, rows: Seq[Installed]): Unit = {
    pluginsDir(configDir).mkdirs()
    val body = rows.sortBy(i => (i.org, i.name))
      .map(i => s"""  {"plugin": "${i.org}/${i.name}", "version": "${i.version}", "constraint": "${i.constraint}"}""")
      .mkString("[\n", ",\n", "\n]")
    Files.write(versionsFile(configDir).toPath,
      body.getBytes(StandardCharsets.UTF_8))
  }

  // ---- version constraint resolution --------------------------------

  /** Numeric-first semver ordering (1.10.0 > 1.9.9; non-numeric
    * segments compare lexically after numerics).
    */
  private[graft] def versionOrdering: Ordering[String] =
    Ordering.by { v: String =>
      val parts = v.split('.').map(p =>
        p.takeWhile(_.isDigit) match {
          case "" => (0L, p)
          case d  => (d.toLong, p.dropWhile(_.isDigit))
        })
      (parts.lift(0).getOrElse((0L, "")), parts.lift(1).getOrElse((0L, "")),
        parts.lift(2).getOrElse((0L, "")))
    }

  /** `latest` → max; `1` / `1.2` (optionally `^`-prefixed) → max with
    * that major(.minor); exact `1.2.3` → itself (reference constraint
    * streams: plugin_manager.go:637-639 resolves org/name/constraint
    * to the latest version satisfying it).
    */
  private[graft] def resolve(
      versions: Seq[String], constraint: String): Option[String] = {
    val c = constraint.stripPrefix("^").stripPrefix("v")
    val candidates =
      if (c == "latest" || c.isEmpty) versions
      else if (c.count(_ == '.') >= 2) versions.filter(_ == c)
      else versions.filter(v => v == c || v.startsWith(c + "."))
    candidates.sorted(versionOrdering).lastOption
  }

  def availableVersions(registryDir: String, ref: Ref): Seq[String] = {
    val dir = new File(new File(registryDir, ref.org), ref.name)
    Option(dir.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && new File(f, "plugin.json").isFile)
      .map(_.getName).toSeq.sorted(versionOrdering)
  }

  // ---- install / update / uninstall ---------------------------------

  def sha256Hex(f: File): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(Files.readAllBytes(f.toPath))
      .map(b => f"$b%02x").mkString
  }

  /** Unregister the live adapter of the CURRENTLY-installed version of
    * `slug`, if any — must run before its descriptor is replaced or
    * deleted, else a version that drops `adapter_class` strands the old
    * adapter in [[SourceRegistry]] for the JVM lifetime.
    */
  private def unregisterAdapterOf(configDir: String, slug: String): Unit =
    installedDescriptor(configDir, slug).flatMap(_.adapterClass).foreach {
      cls =>
        try SourceRegistry.unregister(loadAdapter(cls).kind)
        catch { case _: Exception => () }
    }

  /** Resolve, digest-verify, copy, record. Returns the installed row.
    * Installing an already-installed plugin replaces it (the reference
    * keeps one version per plugin; uninstall takes no version for the
    * same reason, cmd/plugin.go:204-212).
    */
  def install(configDir: String, registryDir: String, ref: Ref): Installed = {
    val versions = availableVersions(registryDir, ref)
    require(versions.nonEmpty,
      s"plugin ${ref.slug} not found in registry $registryDir")
    val version = resolve(versions, ref.constraint).getOrElse(
      throw new IllegalArgumentException(
        s"no version of ${ref.slug} satisfies '${ref.constraint}' " +
          s"(available: ${versions.mkString(", ")})"))
    val src = Paths.get(registryDir, ref.org, ref.name, version)
    val desc = readDescriptor(src.toFile)
    val payload = src.resolve("plugin.bin").toFile
    require(payload.isFile, s"plugin ${ref.slug}@$version has no payload")
    val digest = sha256Hex(payload)
    require(digest == desc.sha256,
      s"checksum mismatch for ${ref.slug}@$version: " +
        s"expected ${desc.sha256}, got $digest")

    // replacing an installed version: retire its live adapter first,
    // while its descriptor (and thus its adapter_class) is still on disk
    unregisterAdapterOf(configDir, ref.slug)

    val dst = new File(new File(pluginsDir(configDir), ref.org), ref.name)
    dst.mkdirs()
    Files.copy(src.resolve("plugin.json"), dst.toPath.resolve("plugin.json"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.copy(payload.toPath, dst.toPath.resolve("plugin.bin"),
      StandardCopyOption.REPLACE_EXISTING)

    val row = Installed(ref.org, ref.name, version, ref.constraint)
    writeInstalledList(configDir,
      installedList(configDir).filterNot(_.slug == row.slug) :+ row)
    row
  }

  /** Outcome of [[update]]. */
  sealed trait UpdateResult { def version: String }
  final case class UpToDate(version: String) extends UpdateResult
  final case class Updated(was: String, version: String) extends UpdateResult

  /** Re-resolve the RECORDED constraint; reinstall if a newer version
    * satisfies it.
    */
  def update(
      configDir: String, registryDir: String, slug: String): UpdateResult = {
    val row = installedList(configDir).find(_.slug == slug).getOrElse(
      throw new IllegalArgumentException(s"plugin $slug is not installed"))
    val target = resolve(
      availableVersions(registryDir, Ref(row.org, row.name, row.constraint)),
      row.constraint).getOrElse(row.version)
    if (versionOrdering.compare(target, row.version) > 0) {
      install(configDir, registryDir, Ref(row.org, row.name, row.constraint))
      Updated(row.version, target)
    } else UpToDate(row.version)
  }

  /** Instantiate a [[SourceAdapter]] implementation: a Scala `object`
    * (module class `<name>$` with its MODULE$ singleton) or a plain
    * class with a no-arg constructor.
    */
  private def loadAdapter(cls: String): SourceAdapter =
    try {
      val module = Class.forName(cls + "$")
      module.getField("MODULE$").get(null).asInstanceOf[SourceAdapter]
    } catch {
      case _: ClassNotFoundException | _: NoSuchFieldException =>
        Class.forName(cls).getDeclaredConstructor().newInstance()
          .asInstanceOf[SourceAdapter]
    }

  def uninstall(configDir: String, slug: String): Installed = {
    val row = installedList(configDir).find(_.slug == slug).getOrElse(
      throw new IllegalArgumentException(s"plugin $slug is not installed"))
    val dir = new File(new File(pluginsDir(configDir), row.org), row.name)
    // a dynamically-registered adapter leaves the live registry with
    // its artifact (the reference kills the plugin binary on uninstall)
    unregisterAdapterOf(configDir, slug)
    Option(dir.listFiles()).foreach(_.foreach(_.delete()))
    dir.delete()
    writeInstalledList(configDir,
      installedList(configDir).filterNot(_.slug == slug))
    row
  }

  def installedDescriptor(configDir: String, slug: String): Option[Descriptor] =
    installedList(configDir).find(_.slug == slug).map { row =>
      readDescriptor(new File(new File(pluginsDir(configDir), row.org), row.name))
    }

  /** Register every installed plugin that declares an `adapter_class`
    * into the live [[SourceRegistry]] — called once per CLI invocation.
    * A missing or incompatible class is a per-plugin warning, never a
    * session failure (the reference likewise starts with a broken
    * plugin degraded, not down).
    */
  def registerInstalled(
      configDir: String, warn: String => Unit = _ => ()): Unit =
    installedList(configDir).foreach { row =>
      installedDescriptor(configDir, row.slug).foreach { d =>
        d.adapterClass.foreach { cls =>
          try SourceRegistry.register(loadAdapter(cls))
          catch {
            case e: Exception =>
              warn(s"plugin ${row.slug}: cannot load adapter $cls: ${e.getMessage}")
          }
        }
      }
    }

  implicit private class InstalledOps(private val i: Installed) extends AnyVal {
    def slug: String = s"${i.org}/${i.name}"
  }
}
