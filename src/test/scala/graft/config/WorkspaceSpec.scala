package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** Replays the reference's workspace-profile precedence suite
  * (tests/acceptance/test_data/source_files/config_tests/
  * workspace_tests.json over workspaces.tpc, driven through
  * config_precedence.bats) against [[Workspace.resolve]].
  */
class WorkspaceSpec extends AnyFunSuite {

  // same shape as the reference's workspaces.tpc fixture
  val fixture: String =
    """workspace "workspace_profiles" {
      |  log_level     = "trace"
      |  update_check  = false
      |  memory_max_mb = 1024
      |  plugin_memory_max_mb = 512
      |  temp_dir_max_mb = 1024
      |}
      |
      |workspace "development" {
      |  log_level     = "warn"
      |  update_check  = false
      |  memory_max_mb = 512
      |  plugin_memory_max_mb = 206
      |  temp_dir_max_mb = 512
      |}""".stripMargin

  val profiles: Map[String, Workspace.Profile] = Workspace.parse(fixture)

  test("parses both profiles with all five settings") {
    assert(profiles.keySet === Set("workspace_profiles", "development"))
    val p = profiles("workspace_profiles")
    assert(p.logLevel === Some("trace"))
    assert(p.updateCheck === Some(false))
    assert(p.memoryMaxMb === Some(1024L))
    assert(p.pluginMemoryMaxMb === Some(512L))
    assert(p.tempDirMaxMb === Some(1024L))
  }

  // workspace_tests.json case 1: env vars set, nothing selected → env wins
  test("env vars apply when no workspace is selected") {
    val s = Workspace.resolve(None, Map(
      "GRAFT_UPDATE_CHECK" -> "false",
      "GRAFT_MEMORY_MAX_MB" -> "16384",
      "GRAFT_PLUGIN_MEMORY_MAX_MB" -> "2048",
      "GRAFT_TEMP_DIR_MAX_MB" -> "8192"), profiles)
    assert(!s.updateCheck)
    assert(s.memoryMaxMb === Some(16384L))
    assert(s.pluginMemoryMaxMb === Some(2048L))
    assert(s.tempDirMaxMb === Some(8192L))
    assert(s.workspace === "default")
  }

  // case 2: only --workspace flag → profile values
  test("flag-selected profile supplies settings") {
    val s = Workspace.resolve(Some("workspace_profiles"), Map.empty, profiles)
    assert(s.workspace === "workspace_profiles")
    assert(s.logLevel === Some("trace"))
    assert(!s.updateCheck)
    assert(s.memoryMaxMb === Some(1024L))
    assert(s.pluginMemoryMaxMb === Some(512L))
    assert(s.tempDirMaxMb === Some(1024L))
  }

  // case 3: workspace selected via env var only
  test("env-selected profile supplies settings") {
    val s = Workspace.resolve(None,
      Map("GRAFT_WORKSPACE" -> "workspace_profiles"), profiles)
    assert(s.workspace === "workspace_profiles")
    assert(s.logLevel === Some("trace"))
    assert(s.memoryMaxMb === Some(1024L))
  }

  // case 4: ALL env vars set AND --workspace flag → the explicitly
  // selected profile overrides every individual env var
  test("explicit profile overrides individual env vars") {
    val s = Workspace.resolve(Some("workspace_profiles"), Map(
      "GRAFT_WORKSPACE" -> "development",
      "GRAFT_LOG_LEVEL" -> "debug",
      "GRAFT_UPDATE_CHECK" -> "false",
      "GRAFT_MEMORY_MAX_MB" -> "16384",
      "GRAFT_MEMORY_MAX_MB_PLUGIN" -> "2048",
      "GRAFT_TEMP_DIR_MAX_MB" -> "8192"), profiles)
    assert(s.workspace === "workspace_profiles") // flag beats env selection
    assert(s.logLevel === Some("trace"))
    assert(s.memoryMaxMb === Some(1024L))
    assert(s.pluginMemoryMaxMb === Some(512L))
    assert(s.tempDirMaxMb === Some(1024L))
  }

  // case 6: profile selected via env var + other env vars set → the
  // env-selected profile STILL overrides the individual env vars
  test("env-selected profile overrides individual env vars") {
    val s = Workspace.resolve(None, Map(
      "GRAFT_WORKSPACE" -> "development",
      "GRAFT_LOG_LEVEL" -> "debug",
      "GRAFT_UPDATE_CHECK" -> "false",
      "GRAFT_MEMORY_MAX_MB" -> "16384",
      "GRAFT_MEMORY_MAX_MB_PLUGIN" -> "2048",
      "GRAFT_TEMP_DIR_MAX_MB" -> "8192"), profiles)
    assert(s.workspace === "development")
    assert(s.logLevel === Some("warn"))
    assert(s.memoryMaxMb === Some(512L))
    assert(s.pluginMemoryMaxMb === Some(206L))
    assert(s.tempDirMaxMb === Some(512L))
  }

  test("default profile fills settings when none selected; env still wins") {
    val withDefault = profiles +
      ("default" -> Workspace.Profile("default",
        logLevel = Some("info"), memoryMaxMb = Some(64L)))
    val s = Workspace.resolve(None,
      Map("GRAFT_MEMORY_MAX_MB" -> "999"), withDefault)
    assert(s.workspace === "default")
    assert(s.logLevel === Some("info"))      // default profile
    assert(s.memoryMaxMb === Some(999L))     // env beats default profile
  }

  test("app defaults apply last (update_check=true, rest unset)") {
    val s = Workspace.resolve(None, Map.empty, Map.empty)
    assert(s.updateCheck)
    assert(s.logLevel === None)
    assert(s.memoryMaxMb === None)
  }

  test("base inheritance: child overrides, parent fills the rest") {
    val src =
      """workspace "parent" {
        |  log_level = "error"
        |  memory_max_mb = 2048
        |}
        |workspace "child" {
        |  base = workspace.parent
        |  memory_max_mb = 4096
        |}""".stripMargin
    val s = Workspace.resolve(Some("child"), Map.empty, Workspace.parse(src))
    assert(s.logLevel === Some("error"))   // inherited
    assert(s.memoryMaxMb === Some(4096L))  // overridden
  }

  test("base cycle and unknown profile are construction-time errors") {
    val cyclic = Workspace.parse(
      """workspace "a" { base = workspace.b }
        |workspace "b" { base = workspace.a }""".stripMargin)
    assertThrows[IllegalArgumentException] {
      Workspace.resolve(Some("a"), Map.empty, cyclic)
    }
    assertThrows[IllegalArgumentException] {
      Workspace.resolve(Some("nope"), Map.empty, profiles)
    }
  }

  test("load() reads workspaces.tpc from the config dir") {
    val dir = java.nio.file.Files.createTempDirectory("wsspec").toFile
    val f = new java.io.File(dir, "workspaces.tpc")
    java.nio.file.Files.write(f.toPath, fixture.getBytes("UTF-8"))
    val s = Workspace.load(dir.getPath, Some("development"), Map.empty)
    assert(s.memoryMaxMb === Some(512L))
    // missing file → app defaults, no error
    val s2 = Workspace.load(dir.getPath + "/missing", None, Map.empty)
    assert(s2.updateCheck && s2.workspace === "default")
  }

  test("config dump renders sorted key: value lines under a banner") {
    val s = Workspace.resolve(Some("development"), Map.empty, profiles)
    val d = s.dump
    assert(d.contains("Graft Config"))
    assert(d.contains("log-level"))
    assert(d.contains("warn"))
    assert(d.contains("memory-max-mb-plugin: 206"))
    assert(d.contains("workspace"))
  }
}
