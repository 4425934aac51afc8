package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round profiling harness (guide §1): run named queries
  * with a job listener that attributes wall-clock to individual Spark
  * jobs (description, duration), exposing how much of a query is job
  * count × fixed overhead vs real compute. Not part of the driver
  * contract; used to produce the evidence in OPTIMIZATION_r19.md.
  *
  * Usage: runMain graft.ProfileQ <sfDir> <query>[,<query>...] [--explain]
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("qi01_ingest_enrich"))
    val doExplain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(js.stageInfos.headOption.map(_.name).getOrElse("?"))
        val nTasks = js.stageInfos.map(_.numTasks).sum
        jobs.put(js.jobId, (System.nanoTime(), desc, nTasks))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, desc, nTasks) =>
          done.add((desc, (System.nanoTime() - t0) / 1e9, nTasks))
        }
      }
    })
    // same warmup as Bench
    spark.range(1000000).selectExpr("id % 97 as k", "id * 1.5 as v")
      .groupBy("k").sum("v")
      .write.format("noop").mode("overwrite").save()

    // janino codegen-compile attribution (r19 verdict task 5): the
    // CodegenMetrics source counts every whole-stage compilation and
    // its duration; per-query deltas of the counter + timer separate
    // "plan compile cost" from data compute in the ≤1.5 s long tail.
    val cgTime = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME
    val cgSize = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_GENERATED_CLASS_BYTECODE_SIZE
    def cgTotals(): (Long, Double) = {
      // histogram count is exact; the reservoir mean × count is an
      // APPROXIMATE total ms (decaying reservoir) — good enough to
      // decide whether compile time dominates a 1-second query
      val sn = cgTime.getSnapshot
      (cgTime.getCount, cgTime.getCount * sn.getMean)
    }
    for (name <- names) {
      done.clear()
      spark.sharedState.cacheManager.clearCache()
      System.gc(); Thread.sleep(250); System.gc()
      val (cgN0, cgMs0) = cgTotals()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (doExplain) {
        System.err.println(s"==== PLAN $name ====")
        System.err.println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      df.write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      val (cgN1, cgMs1) = cgTotals()
      System.err.println(f"==== PROFILE $name total=$total%.3f s ====")
      val rows = done.toArray(Array.empty[(String, Double, Int)])
      val jobSum = rows.map(_._2).sum
      rows.zipWithIndex.foreach { case ((desc, sec, nTasks), i) =>
        System.err.println(f"  job[$i%3d] $sec%7.3f s  tasks=$nTasks%4d  ${desc.take(110)}")
      }
      System.err.println(
        f"  jobs=${rows.length} jobSum=$jobSum%.3f s  gap=${total - jobSum}%.3f s (driver/planning/listing)")
      System.err.println(
        f"  codegen: ${cgN1 - cgN0}%d compilations, ~${(cgMs1 - cgMs0) / 1000.0}%.2f s compile time (approx), class bytes total=${cgSize.getCount}%d")
    }
    spark.stop()
  }
}
