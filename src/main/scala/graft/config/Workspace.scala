package graft.config

/** Workspace profiles + config precedence — the reference's
  * `workspace "name" { … }` blocks in `workspaces.tpc` and the
  * flag/env/profile resolution order its acceptance suite pins down
  * (/root/reference/tests/acceptance/test_data/source_files/
  * config_tests/workspaces.tpc + workspace_tests.json, wired in
  * internal/cmdconfig/cmd_hooks.go:160-199).
  *
  * Precedence, exactly as the fixtures specify:
  *
  *   1. a profile selected EXPLICITLY (`--workspace` flag, or the
  *      `GRAFT_WORKSPACE` env var — flag beats env for the selection
  *      itself) supplies the highest-precedence defaults: its settings
  *      override individual env vars (`workspace_tests.json` case
  *      "All env variables set and command line argument set");
  *   2. otherwise individual env vars (`GRAFT_LOG_LEVEL`, …) override
  *      the implicit `default` profile;
  *   3. the `default` profile (when defined and none selected);
  *   4. application defaults.
  *
  * Settings are the reference profile's own five (pipe-fittings
  * `TailpipeWorkspaceProfile`): log_level, update_check,
  * memory_max_mb, plugin_memory_max_mb, temp_dir_max_mb. Profiles
  * may inherit with `base = workspace.other` (dotted-reference
  * attribute, chain-resolved).
  */
object Workspace {

  /** One `workspace "name" { … }` block, fields optional so that
    * resolution can tell "set by this profile" from "inherited".
    */
  final case class Profile(
      name: String,
      logLevel: Option[String] = None,
      updateCheck: Option[Boolean] = None,
      memoryMaxMb: Option[Long] = None,
      pluginMemoryMaxMb: Option[Long] = None,
      tempDirMaxMb: Option[Long] = None,
      base: Option[String] = None) {

    /** This profile with `base` chains flattened (nearest wins). */
    def resolved(all: Map[String, Profile], seen: Set[String] = Set.empty): Profile =
      base match {
        case None => this
        case Some(b) =>
          require(!seen.contains(b), s"workspace '$name': base cycle via '$b'")
          val parent = all.getOrElse(b, throw new IllegalArgumentException(
            s"workspace '$name': unknown base profile '$b'"))
            .resolved(all, seen + name)
          Profile(name,
            logLevel = logLevel.orElse(parent.logLevel),
            updateCheck = updateCheck.orElse(parent.updateCheck),
            memoryMaxMb = memoryMaxMb.orElse(parent.memoryMaxMb),
            pluginMemoryMaxMb = pluginMemoryMaxMb.orElse(parent.pluginMemoryMaxMb),
            tempDirMaxMb = tempDirMaxMb.orElse(parent.tempDirMaxMb))
      }
  }

  /** Fully resolved settings — the keys the reference's config dump
    * exposes for the precedence suite (`workspace_tests.json`
    * "expected" objects; dump shape diagnostics.go:16-70).
    */
  final case class Settings(
      workspace: String,
      logLevel: Option[String],
      updateCheck: Boolean,
      memoryMaxMb: Option[Long],
      pluginMemoryMaxMb: Option[Long],
      tempDirMaxMb: Option[Long]) {

    /** `config` dump rendering (sorted `key: value` lines under a
      * banner — diagnostics.go:41-58), driven by `GRAFT_CONFIG_DUMP`
      * the way the reference drives `TAILPIPE_CONFIG_DUMP`.
      */
    def dump: String = {
      val entries = Seq(
        "log-level" -> logLevel.getOrElse(""),
        "memory-max-mb" -> memoryMaxMb.map(_.toString).getOrElse(""),
        "memory-max-mb-plugin" -> pluginMemoryMaxMb.map(_.toString).getOrElse(""),
        "temp-dir-max-mb" -> tempDirMaxMb.map(_.toString).getOrElse(""),
        "update-check" -> updateCheck.toString,
        "workspace" -> workspace)
      val w = entries.map(_._1.length).max
      entries.map { case (k, v) => s"%-${w}s: %s".format(k, v) }
        .mkString("\n================\nGraft Config\n================\n\n",
          "\n", "")
    }
  }

  /** Parse every `workspace` block out of HCL-subset text. */
  def parse(src: String): Map[String, Profile] =
    Hcl.parse(src).filter(_.kind == "workspace").map { b =>
      require(b.labels.length == 1,
        "'workspace' block requires 1 label, 'name'")
      def num(attr: String): Option[Long] = b.attrs.get(attr).map {
        case Hcl.HNumber(n) => n.toLong
        case other => throw new IllegalArgumentException(
          s"workspace: '$attr' is not a number: $other")
      }
      val p = Profile(
        name = b.labels.head,
        logLevel = b.str("log_level"),
        updateCheck = b.bool("update_check"),
        memoryMaxMb = num("memory_max_mb"),
        pluginMemoryMaxMb = num("plugin_memory_max_mb"),
        tempDirMaxMb = num("temp_dir_max_mb"),
        base = b.str("base").map(_.stripPrefix("workspace.")))
      p.name -> p
    }.toMap

  /** Env-var key prefix (the reference sets `TAILPIPE_` via
    * `SetAppSpecificEnvVarKeys`, app_specific.go:30).
    */
  val EnvPrefix = "GRAFT_"

  /** Resolve final settings from flag + env + profiles, following the
    * fixture-pinned order documented on the object. `env` is passed
    * explicitly so specs can drive every precedence case hermetically.
    * Both plugin-memory env spellings are honored
    * (`…_PLUGIN_MEMORY_MAX_MB` and `…_MEMORY_MAX_MB_PLUGIN` — the
    * reference's own fixtures use both).
    */
  def resolve(
      flagWorkspace: Option[String],
      env: Map[String, String],
      profiles: Map[String, Profile]): Settings = {

    def envVal(key: String): Option[String] = env.get(EnvPrefix + key)

    val selected = flagWorkspace.orElse(envVal("WORKSPACE"))
    val explicit = selected.map { name =>
      profiles.getOrElse(name, throw new IllegalArgumentException(
        s"unknown workspace profile '$name'")).resolved(profiles)
    }
    val default = profiles.get("default").map(_.resolved(profiles))

    def envLong(key: String): Option[Long] = envVal(key).map(_.toLong)
    def pick[T](fromProfile: Profile => Option[T], fromEnv: => Option[T]): Option[T] =
      explicit.flatMap(fromProfile)
        .orElse(fromEnv)
        .orElse(default.flatMap(fromProfile))

    Settings(
      workspace = selected.getOrElse("default"),
      logLevel = pick(_.logLevel, envVal("LOG_LEVEL")),
      updateCheck = pick(_.updateCheck,
        envVal("UPDATE_CHECK").map(_.toBoolean)).getOrElse(true),
      memoryMaxMb = pick(_.memoryMaxMb, envLong("MEMORY_MAX_MB")),
      pluginMemoryMaxMb = pick(_.pluginMemoryMaxMb,
        envLong("PLUGIN_MEMORY_MAX_MB")
          .orElse(envLong("MEMORY_MAX_MB_PLUGIN"))),
      tempDirMaxMb = pick(_.tempDirMaxMb, envLong("TEMP_DIR_MAX_MB")))
  }

  /** Load profiles from `<configDir>/workspaces.tpc` (the reference
    * loads workspace profiles from the config dir of the install dir,
    * cmd_hooks.go:174-175) and resolve against the process env.
    */
  def load(configDir: String, flagWorkspace: Option[String],
      env: Map[String, String] = sys.env): Settings = {
    val f = new java.io.File(configDir, "workspaces.tpc")
    val profiles =
      if (!f.isFile) Map.empty[String, Profile]
      else parse(new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    resolve(flagWorkspace, env, profiles)
  }
}
