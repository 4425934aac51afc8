package graft.ingest

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.config.PartitionSpec
import graft.lake.Lake

class SyntheticSpec extends AnyFunSuite with SparkTest {

  test("spec parsing accepts the reference format, rejects junk") {
    assert(Synthetic.parseSpec("synthetic_50cols_2000000rows_10000chunk_100ms")
      .contains(Synthetic.Spec(50, 2000000L, 10000, 100)))
    assert(Synthetic.parseSpec("synthetic_0cols_1rows_1chunk_1ms").isEmpty)
    assert(Synthetic.parseSpec("synthetic_1cols_1rows_1chunk").isEmpty)
    assert(Synthetic.parseSpec("events.p0").isEmpty)
  }

  test("generated values are deterministic functions of the row index") {
    val df = Synthetic.dataFrame(spark,
      Synthetic.Spec(cols = 11, rows = 100, chunkSize = 50, intervalMs = 1),
      "p0", "synthetic",
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-01-31 00:00:00"))
    assert(df.columns.length == 3 + 11)
    val r5 = df.where(col("int_col_1") === 6).collect().head // id = 5
    assert(r5.getAs[String]("string_col_0") == "string_col_0_val5")
    assert(r5.getAs[Double]("float_col_2") == 0.5)
    assert(!r5.getAs[Boolean]("bool_col_3"))
    assert(r5.getAs[String]("json_col_4") ==
      """{"field1":5,"field2":"field_5","field3":false}""")
    assert(r5.getAs[String]("array_col_6") == """["item_5","5","false"]""")
    val ss = r5.getAs[org.apache.spark.sql.Row]("simple_struct_col_9")
    assert(ss.getAs[Int]("id") == 5 && ss.getAs[String]("name") == "name_5")
    // deterministic: a second generation is identical
    val again = Synthetic.dataFrame(spark,
      Synthetic.Spec(11, 100, 50, 1), "p0", "synthetic",
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-01-31 00:00:00"))
    assert(df.exceptAll(again).isEmpty && again.exceptAll(df).isEmpty)
  }

  test("timestamps stride evenly across [from, to]") {
    val df = Synthetic.dataFrame(spark,
      Synthetic.Spec(1, 1000, 100, 1), "p0", "synthetic",
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-01-02 00:00:00"))
    val mm = df.agg(min("tp_timestamp"), max("tp_timestamp"),
      countDistinct("tp_timestamp")).collect().head
    assert(mm.getTimestamp(0) == Timestamp.valueOf("2024-01-01 00:00:00"))
    // last row = from + 999 * floor(86400e6/999) micros ≈ to
    assert(math.abs(mm.getTimestamp(1).getTime -
      Timestamp.valueOf("2024-01-02 00:00:00").getTime) < 1000)
    assert(mm.getLong(2) == 1000)
  }

  test("1M-row ingest smoke: full pipeline at load-harness scale") {
    val root = Files.createTempDirectory("graft_synth").toString
    val lake = Lake(s"$root/lake")
    val spec = Synthetic.Spec(cols = 11, rows = 1000000L,
      chunkSize = 100000, intervalMs = 1)
    val batch = Synthetic.dataFrame(spark, spec, "load", "synthetic",
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-03-01 00:00:00"))
    val res = Ingest.collectBatch(spark, lake,
      PartitionSpec("synthetic", "load"), batch)
    assert(res.rowsIngested == 1000000L)
    assert(res.rowsInvalid == 0L)
    val back = lake.read(spark, "synthetic")
    assert(back.count() == 1000000L)
    // spans two tp_month partitions (Jan + Feb)
    assert(back.select("tp_month").distinct().count() == 2)
  }
}
