package graft
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.{Lake, TpSchema}
import graft.config.PartitionSpec
import graft.query.Views
class Dbg2Spec extends AnyFunSuite with SparkTest {
  test("dbg derived plan") {
    val lake = Lake(Files.createTempDirectory("graft_dbg2").toString)
    val spec = PartitionSpec("dbq", "p0", tpIndexColumn = Some("idx"))
    def day(i: Int) = TpSchema.enrich(spark.range(i * 10, (i + 1) * 10).select(
      col("id").as("event_id"),
      expr(s"timestamp '2024-03-01 00:00:00' + make_interval(0,0,0,$i,0,0, (id % 10) * 600)").as("tp_timestamp"),
      lit("0").as("idx"), col("id").cast("double").as("v")), spec)
    for (i <- 0 until 3) lake.append(spark, "dbq", day(i))
    lake.enableColumnStats(spark, "dbq", Seq("v", "event_id", "tp_timestamp"))
    Views.register(spark, lake, Views.Filters())
    val df = spark.sql("""
      SELECT cast(date_trunc('DAY', tp_timestamp) AS date) AS day,
             count(*) AS n, sum(event_id) AS s
      FROM dbq GROUP BY date_trunc('DAY', tp_timestamp)""")
    info("OPTIMIZED:\n" + df.queryExecution.optimizedPlan.treeString)
  }
}
