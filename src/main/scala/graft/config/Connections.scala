package graft.config

import org.apache.hadoop.conf.Configuration

/** Connection blocks → Hadoop configuration (the engine's counterpart
  * of the reference's per-source credential plumbing: a
  * `connection "<type>" "<name>"` block's HCL is shipped to the plugin
  * process, connection.go:27-67 + ToProto; here the "plugin" is the
  * Hadoop filesystem layer every Spark scan and write goes through).
  *
  * `s3` connections speak a typed vocabulary mapped onto `fs.s3a.*`;
  * with `bucket` set the keys scope to that bucket only
  * (`fs.s3a.bucket.<bucket>.*` — Hadoop's per-bucket override), so two
  * sources can collect from two accounts in one session. Every
  * connection type additionally passes `hadoop.<key> = <value>` through
  * verbatim — the escape hatch for endpoints Spark supports but this
  * vocabulary doesn't name (gs, abfs, custom schemes). Unknown
  * properties are load-time errors: a typo'd `secret_ky` must not
  * silently fall back to the instance role.
  */
object Connections {

  private val S3Keys: Map[String, String] = Map(
    "access_key"    -> "access.key",
    "secret_key"    -> "secret.key",
    "session_token" -> "session.token",
    "endpoint"      -> "endpoint",
    "region"        -> "endpoint.region",
    "path_style"    -> "path.style.access",
    "anonymous"     -> "") // handled specially below

  /** The Hadoop conf entries a connection resolves to (pure — the
    * testable core; [[apply]] mutates a live Configuration).
    */
  def hadoopEntries(conn: ConnectionSpec): Seq[(String, String)] = {
    val (hadoopProps, typed) = conn.props.partition(_._1.startsWith("hadoop."))
    val passthrough = hadoopProps.toSeq.map { case (k, v) =>
      k.stripPrefix("hadoop.") -> v }
    val mapped = conn.kind match {
      case "s3" =>
        val bucket = typed.get("bucket")
        val prefix = bucket match {
          case Some(b) => s"fs.s3a.bucket.$b."
          case None    => "fs.s3a."
        }
        (typed - "bucket").toSeq.map {
          case ("anonymous", "true") =>
            s"${prefix}aws.credentials.provider" ->
              "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
          case ("anonymous", v) => throw new IllegalArgumentException(
            s"connection '${conn.id}': anonymous must be true, got '$v'")
          case (k, v) if S3Keys.contains(k) => s"$prefix${S3Keys(k)}" -> v
          case (k, _) => throw new IllegalArgumentException(
            s"connection '${conn.id}': unknown s3 property '$k' " +
              s"(expected one of ${(S3Keys.keys.toSeq :+ "bucket").sorted.mkString(", ")}, " +
              "or hadoop.<key> passthrough)")
        }
      case _ =>
        typed.keys.headOption.foreach { k =>
          throw new IllegalArgumentException(
            s"connection '${conn.id}': type '${conn.kind}' has no typed " +
              s"vocabulary — use hadoop.<key> passthrough (got '$k')")
        }
        Seq.empty
    }
    mapped ++ passthrough
  }

  /** Apply a connection to the live session Hadoop conf. Returns the
    * applied entries (for `Using connection …` progress output).
    */
  def apply(conn: ConnectionSpec, hadoopConf: Configuration): Seq[(String, String)] = {
    val entries = hadoopEntries(conn)
    entries.foreach { case (k, v) => hadoopConf.set(k, v) }
    entries
  }

  /** Resolve a `connection.<type>.<name>` (or `<type>.<name>`)
    * reference against the parsed config.
    */
  def resolve(
      config: Hcl.Config, ref: String): ConnectionSpec = {
    val key = ref.stripPrefix("connection.")
    config.connections.getOrElse(key, throw new IllegalArgumentException(
      s"unknown connection '$key' (defined: " +
        s"${config.connections.keys.toSeq.sorted.mkString(", ")})"))
  }
}
