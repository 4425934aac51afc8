package graft.query

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class RenderSpec extends AnyFunSuite with SparkTest {

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1L, "alpha", Some(3.25), Timestamp.valueOf("2024-05-01 10:30:45")),
      (2L, "beta,x", None, Timestamp.valueOf("2024-05-01 10:31:00.123456")))
      .toDF("id", "name", "score", "ts")
  }

  test("csv matches the golden acceptance shape") {
    assert(Render.csv(df) ==
      """id,name,score,ts
        |1,alpha,3.25,2024-05-01 10:30:45
        |2,"beta,x",,2024-05-01 10:31:00.123456""".stripMargin)
  }

  test("csv without header, custom separator leaves commas unquoted") {
    assert(Render.csv(df, header = false, sep = "|") ==
      """1|alpha|3.25|2024-05-01 10:30:45
        |2|beta,x||2024-05-01 10:31:00.123456""".stripMargin)
  }

  test("json renders typed values and escapes") {
    import spark.implicits._
    val j = Render.json(Seq((1, "a\"b", true, Seq(1, 2)))
      .toDF("n", "s", "b", "arr"))
    assert(j == """[{"n":1,"s":"a\"b","b":true,"arr":[1,2]}]""")
  }

  test("json renders map columns as objects, not quoted strings") {
    import spark.implicits._
    val j = Render.json(Seq((1, Map("a" -> 1, "b" -> 2))).toDF("n", "m"))
    assert(j == """[{"n":1,"m":{"a":1,"b":2}}]""" ||
      j == """[{"n":1,"m":{"b":2,"a":1}}]""", j)
  }

  test("streaming variants emit byte-identical output to the String forms") {
    import spark.implicits._
    val df = Seq((1, "x"), (2, "y")).toDF("n", "s")
    def via(f: Appendable => Unit): String = {
      val sb = new java.lang.StringBuilder; f(sb); sb.toString
    }
    assert(via(Render.csvTo(_, df)) == Render.csv(df))
    assert(via(Render.jsonTo(_, df)) == Render.json(df))
    assert(via(Render.lineTo(_, df)) == Render.line(df))
  }

  test("line mode prints column = value blocks") {
    import spark.implicits._
    val out = Render.line(Seq(("x", 1), ("y", 2)).toDF("name", "v"))
    assert(out ==
      """name = x
        |   v = 1
        |
        |name = y
        |   v = 2""".stripMargin)
  }

  test("table draws a box with aligned columns") {
    import spark.implicits._
    val out = Render.table(Seq(("a", 10), ("longer", 2)).toDF("k", "n"))
    assert(out ==
      """+--------+----+
        || k      | n  |
        |+--------+----+
        || a      | 10 |
        || longer | 2  |
        |+--------+----+""".stripMargin)
  }

  test("cell: double integers lose the trailing .0, arrays bracket") {
    assert(Render.cell(36.0d) == "36")
    assert(Render.cell(3.25d) == "3.25")
    assert(Render.cell(Seq(1, 2, 3)) == "[1, 2, 3]")
    assert(Render.cell(null) == "")
  }
}
