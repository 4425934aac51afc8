package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Post-execution scan observability: how many files a query's
  * parquet scans actually read (the `numFiles` SQL metric, summed over
  * every `FileSourceScanExec`, descending through AQE). This is the
  * measured counterpart of the zone-map/partition pruning stack — the
  * number `.explain`'s static "Location" line can't give you, because
  * file skipping happens inside `FileIndex.listFiles` at planning/
  * execution time. Used by the qi29 oracle's in-query `require` and
  * the ZoneMap specs; callers must have EXECUTED the DataFrame first
  * (metrics are zero until an action runs).
  */
object ScanAudit {

  /** Sum of `numFiles` over all file scans in the executed plan. */
  def filesRead(df: DataFrame): Long = {
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      // AQE stages are LEAF nodes whose real subtree hangs off .plan
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other =>
        other.children.flatMap(scans) ++
          other.subqueries.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
  }

  /** Execute `df` (collect, discarding rows) and report files read. */
  def filesReadAfterRun(df: DataFrame): Long = {
    df.collect()
    filesRead(df)
  }
}
