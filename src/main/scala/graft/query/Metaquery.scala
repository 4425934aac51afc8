package graft.query

import org.apache.spark.sql.SparkSession

import graft.config.{Hcl, Types}
import graft.lake.{Lake, TpSchema}

/** Dot-command metaqueries of the interactive/batch query surface
  * (reference /root/reference/internal/metaquery/definitions.go:25-130,
  * `.inspect` handler handler_inspect.go:17-76) plus the DESCRIBE
  * surface (internal/query/execute.go:79-123).
  *
  * The handler is pure: it mutates only the passed [[QueryState]] and
  * returns the text to print, so the same dispatch serves the REPL,
  * batch mode, and tests.
  */
object Metaquery {

  /** Mutable per-session output/display options (the reference keeps
    * these in viper config; cmd/query.go flags seed them).
    */
  final case class QueryState(
      var output: String = "table", // table | csv | json | line
      var header: Boolean = true,
      var separator: String = ",",
      var multi: Boolean = false,
      var autoComplete: Boolean = true,
      var done: Boolean = false)

  def isMetaquery(line: String): Boolean = line.trim.startsWith(".")

  private val NoConfig = Hcl.Config(Map.empty, Map.empty, Map.empty)

  /** Execute one dot-command; returns the text to display. `config`
    * feeds `.inspect` the workspace's configured partitions (live-
    * reloaded mid-session by the REPL's [[graft.config.ConfigWatcher]]).
    */
  def handle(
      spark: SparkSession, lake: Lake, state: QueryState,
      line: String, config: Hcl.Config = NoConfig): String = {
    val parts = line.trim.split("\\s+").toSeq
    val cmd = parts.head
    val args = parts.tail
    cmd match {
      case ".help" => help
      case ".exit" | ".quit" => state.done = true; ""
      case ".clear" => "[2J[H"
      case ".output" =>
        requireArgs(args, 1, ".output")
        require(Seq("table", "csv", "json", "line").contains(args.head),
          s"invalid output format '${args.head}' (csv, json, table, line)")
        state.output = args.head; ""
      case ".separator" =>
        requireArgs(args, 1, ".separator")
        state.separator = args.head; ""
      case ".header" | ".headers" =>
        state.header = onOff(args, cmd); ""
      case ".multi" =>
        state.multi = onOff(args, cmd); ""
      case ".autocomplete" =>
        state.autoComplete = onOff(args, cmd); ""
      case ".inspect" =>
        require(args.length <= 1, ".inspect takes at most one argument")
        if (args.isEmpty) inspectTables(spark, lake, config)
        else inspectSchema(spark, lake, args.head)
      case ".explain" =>
        val sql = line.trim.stripPrefix(".explain").trim
        require(sql.nonEmpty, ".explain requires a SQL statement")
        explain(spark, sql)
      case other =>
        throw new IllegalArgumentException(s"unknown command '$other'")
    }
  }

  private def requireArgs(args: Seq[String], n: Int, cmd: String): Unit =
    require(args.length == n, s"$cmd requires exactly $n argument(s)")

  private def onOff(args: Seq[String], cmd: String): Boolean = {
    requireArgs(args, 1, cmd)
    args.head match {
      case "on"  => true
      case "off" => false
      case other => throw new IllegalArgumentException(
        s"$cmd expects on/off, got '$other'")
    }
  }

  /** `.inspect` — table list (handler_inspect.go:36-51; the Plugin
    * column holds the source adapter, 'core' for lake-native tables).
    * Config-declared partitions appear even before their first collect
    * (their Plugin column is the partition's source kind), so a
    * partition added to a workspace file mid-session is visible here
    * as soon as the watcher reloads.
    */
  def inspectTables(
      spark: SparkSession, lake: Lake,
      config: Hcl.Config = NoConfig): String = {
    val sourceOf = config.partitions.values
      .map(p => p.table -> p.source.map(_.kind).getOrElse("config")).toMap
    val collected = lake.listTables(spark)
    val tables = (collected ++ sourceOf.keys).distinct.sorted
    val rows = Seq("Table", "Plugin") +:
      tables.map(t => Seq(t, sourceOf.getOrElse(t, "core")))
    Render.renderTable(rows, headerRow = true)
  }

  /** `.inspect <table>` — column/type listing, engine type vocabulary,
    * sorted alphabetically with `tp_` fields LAST
    * (handler_inspect.go:66-68; SDK SortColumnsAlphabetically).
    */
  def inspectSchema(
      spark: SparkSession, lake: Lake, table: String): String = {
    require(lake.tableExists(spark, table),
      s"could not find a view named '$table'")
    val cols = lake.schemaOf(spark, table).fields
      .map(f => f.name -> Types.name(f.dataType))
    val (tp, plain) = cols.partition(_._1.startsWith("tp_"))
    val ordered = plain.sortBy(_._1) ++ tp.sortBy(_._1)
    Render.renderTable(
      Seq("Column", "Type") +: ordered.toSeq.map(c => Seq(c._1, c._2)),
      headerRow = true)
  }

  /** DESCRIBE of an arbitrary query (execute.go:79-123): Spark ANALYSIS
    * ONLY — `spark.sql(q).schema` resolves the plan without running a
    * job; column types come back in engine vocabulary.
    */
  /** `.explain <sql>` — the physical plan plus scale-antipattern
    * warnings. The warnings encode the plan-audit rules this engine
    * holds its own operators to (PlanAuditSpec): the same analysis a
    * user needs before pointing an ad-hoc query at a 100 TB table.
    * Beyond-reference (the reference delegates EXPLAIN to DuckDB
    * verbatim; here the plan is Spark's, and the audit is the point).
    */
  def explain(spark: SparkSession, query: String): String = {
    val qe = spark.sql(query.trim.stripSuffix(";")).queryExecution
    val plan = qe.executedPlan.toString.stripLineEnd
    val warnings = planWarnings(plan,
      spark.conf.getOption("spark.sql.shuffle.partitions")
        .flatMap(v => scala.util.Try(v.toInt).toOption)) ++
      // a count/min/max the metadata-aggregate rewrite COULD have
      // served but declined (missing stats coverage / manifest drift):
      // tell the user the one command that makes it scan-free
      scala.util.Try(graft.lake.MetadataAggregateRule(spark)
        .missedCandidate(qe.optimizedPlan)).toOption.flatten.map { cols =>
        if (cols.isEmpty)
          "this count(*) could be answered from the table manifest " +
            "with ZERO data reads — run vacuum to re-sync the manifest " +
            "and the metadata-aggregate rewrite will serve it"
        else
          "this aggregate could be answered from lake metadata with " +
            "ZERO data reads — enable per-column stats " +
            s"(stats_columns or `table analyze --columns " +
            s"${cols.mkString(",")}`) and the metadata-aggregate " +
            "rewrite will serve it"
      }
    if (warnings.isEmpty) plan
    else plan + "\n" + warnings.map("WARNING: " + _).mkString("\n")
  }

  /** Scale-antipattern scan of a physical-plan string. Each rule names
    * the operator, why it dies at scale, and the rewrite. Pass the
    * session's shuffle-partition setting to also catch the
    * default-partitioned streaming-state trap (r12's measured qi22
    * lesson) — stringly-typed because `.explain` output is what a REPL
    * user has in hand.
    */
  def planWarnings(plan: String): Seq[String] = planWarnings(plan, None)

  def planWarnings(
      plan: String, sessionShufflePartitions: Option[Int]): Seq[String] = {
    val w = Seq.newBuilder[String]
    if (plan.contains("CartesianProduct"))
      w += ("CartesianProduct joins every row pair — quadratic work " +
        "and no pruning; add an equality predicate (equi-join) or " +
        "broadcast() a provably small side")
    if (plan.contains("Window") && plan.contains("Exchange SinglePartition"))
      w += ("window without PARTITION BY shuffles ALL rows into one " +
        "task; partition the window, or use a two-pass global rank " +
        "for whole-table numbering")
    if (plan.contains("BroadcastNestedLoopJoin"))
      w += ("BroadcastNestedLoopJoin evaluates a non-equi predicate " +
        "per row pair — acceptable only when the broadcast side is " +
        "tiny; consider bucketing the predicate into an equi-join key")
    // r13: stream-stream join state partitioned at the session default
    // (the qi22 trap — the count freezes into the checkpoint's state
    // layout at first start; 200 near-empty stores each pay a commit
    // per micro-batch forever)
    if (plan.contains("StreamingSymmetricHashJoin"))
      sessionShufflePartitions.foreach { d =>
        val parts = ("""hashpartitioning\([^()]*,\s*(\d+)\)""".r
          .findAllMatchIn(plan).map(_.group(1).toInt) ++
          """numPartitions\s*=\s*(\d+)""".r
            .findAllMatchIn(plan).map(_.group(1).toInt)).toSeq
        if (parts.contains(d))
          w += (s"stream-stream join state uses the session default of " +
            s"$d shuffle partitions — the count is frozen into the " +
            "checkpoint state layout at first start, and each " +
            "partition carries 4 state stores paying a commit every " +
            "micro-batch; size it to key cardinality before start() " +
            "(StreamIngest.autoState)")
      }
    // r13: partitioned file write with no upstream repartition/REBALANCE
    // on the partition columns — every task writes a file into every
    // partition dir it holds rows for, so output fragments as
    // tasks × live dirs (the IVF fragment-file explosion, measured 45 s
    // vs 7 s at 200k vectors)
    // r14: a heavyweight expression used directly as a RANGE-PARTITION
    // key is evaluated outside whole-stage codegen in the exchange's
    // key extraction (sampling + partition-id + sort key) — measured
    // on the z-order rewrite: a 126-term when-chain as a raw sort key
    // cost 57.6 s where the same key pre-materialized as a column cost
    // 8.8 s (PERF.md round-14 zorder). Flag when-chains of ≥16 terms
    // inside rangepartitioning(...): compute the key once with
    // withColumn and range-partition by the column reference instead.
    // ALL occurrences, not just the first: a plan whose first range
    // exchange is benign (an ORDER BY) must not mask a later exchange
    // keyed by a fat CASE chain (r14 advice)
    val fatCase = "rangepartitioning\\(".r.findAllMatchIn(plan)
      .map { mm =>
        val window = plan.substring(mm.start,
          math.min(plan.length, mm.start + 4000))
          .takeWhile(_ != '\n')
        "CASE WHEN".r.findAllIn(window).size
      }.foldLeft(0)(math.max)
    if (fatCase >= 16)
      w += (s"range partitioning keyed by a $fatCase-branch CASE " +
        "expression — the exchange evaluates the raw key " +
        "expression outside whole-stage codegen (sampling, " +
        "partition-id and sort-key extraction each re-run it " +
        "interpreted); materialize it once with withColumn and " +
        "range-partition by the column reference (measured 6.5× " +
        "on the z-order rewrite)")
    """InsertIntoHadoopFsRelationCommand [^,]+, [^,]+, \[(\w[^\]]*)\]""".r
      .findFirstMatchIn(plan).foreach { m =>
        val partCols = m.group(1).split(",").toSeq
          .map(_.trim.takeWhile(_ != '#')).filter(_.nonEmpty)
        // a hash exchange counts only when it shuffles ON the write's
        // partition columns — matching `hashpartitioning(` anywhere
        // let any unrelated exchange (the aggregate feeding the write
        // is the common one) suppress the warning, a systematic false
        // negative for the agg-then-write shape (r13 ADVICE)
        val hashOnPartCols = """hashpartitioning\(([^()]*)\)""".r
          .findAllMatchIn(plan).exists(h =>
            h.group(1).split(",").map(_.trim).exists(arg =>
              partCols.exists(c => arg.startsWith(c + "#"))))
        val shuffled = plan.contains("REBALANCE_PARTITIONS_BY_COL") ||
          plan.contains("REBALANCE_PARTITIONS_BY_NONE") || hashOnPartCols
        if (!shuffled)
          w += ("partitioned write with no upstream repartition/" +
            "REBALANCE on the partition columns — every task writes a " +
            "file into every partition dir it holds rows for (tasks × " +
            "dirs fragments); repartition(partitionCols) or hint " +
            "REBALANCE before the write")
      }
    w.result()
  }

  def describe(spark: SparkSession, query: String): Seq[(String, String)] = {
    val clean = query.trim.stripSuffix(";")
    spark.sql(clean).schema.fields.toSeq
      .map(f => f.name -> Types.name(f.dataType))
  }

  val help: String =
    """Available commands:
      |  .autocomplete   Enable or disable auto-completion: on, off
      |  .clear          Clear the console
      |  .exit           Exit from the terminal
      |  .explain        Show the physical plan + scale warnings for a query
      |  .header         Enable or disable column headers: on, off
      |  .help           Show help
      |  .inspect        View tables & column information
      |  .multi          Enable or disable multiline mode: on, off
      |  .output         Set output format: csv, json, table or line
      |  .quit           Exit from the terminal
      |  .separator      Set csv output separator""".stripMargin
}
