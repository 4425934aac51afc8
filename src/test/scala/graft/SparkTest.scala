package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (session startup is
  * ~5 s; per-suite sessions would dominate test time).
  */
trait SparkTest {
  lazy val spark: SparkSession = SparkTest.session
}

object SparkTest {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
