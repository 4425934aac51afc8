package graft.config

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ModelSpec extends AnyFunSuite {

  test("Types.parse handles primitives, arrays, nested structs") {
    assert(Types.parse("varchar") == StringType)
    assert(Types.parse("BIGINT") == LongType)
    assert(Types.parse("double[]") == ArrayType(DoubleType))
    assert(Types.parse("struct(a integer, b varchar)") ==
      StructType(Seq(StructField("a", IntegerType),
        StructField("b", StringType))))
    assert(Types.parse("struct(u struct(id bigint, tags varchar[]), n integer)[]") ==
      ArrayType(StructType(Seq(
        StructField("u", StructType(Seq(
          StructField("id", LongType),
          StructField("tags", ArrayType(StringType))))),
        StructField("n", IntegerType)))))
  }

  test("Types.name round-trips through parse") {
    val ts = Seq("varchar", "integer", "bigint", "double", "float",
      "boolean", "timestamp", "date", "varchar[]",
      "struct(a integer, b struct(c varchar))")
    ts.foreach { t =>
      assert(Types.name(Types.parse(t)) == t, s"round trip of $t")
    }
  }

  test("Types.parse rejects unknown types") {
    intercept[IllegalArgumentException](Types.parse("widget"))
  }

  test("PartitionSpec rejects non-identifier tp_index and bad filters") {
    intercept[IllegalArgumentException](
      PartitionSpec("t", "p", tpIndexColumn = Some("a || b")))
    intercept[IllegalArgumentException](
      PartitionSpec("t", "p", filter = Some("1=1; drop table x")))
    intercept[IllegalArgumentException](
      PartitionSpec("t", "p", filter = Some("x > 0 -- comment")))
    // a plain predicate is fine
    PartitionSpec("t", "p", tpIndexColumn = Some("region"),
      filter = Some("status_code < 400 and region like 'us-%'"))
  }

  test("ColumnSpec rejects source+transform together") {
    intercept[IllegalArgumentException](
      ColumnSpec("c", source = Some("s"), transform = Some("1+1")))
  }
}
