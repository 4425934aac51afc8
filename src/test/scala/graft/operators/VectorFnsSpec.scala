package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest


/** The codegen'd dot product must be BIT-identical to the
  * higher-order-function formulation it replaced (same left-to-right
  * double accumulation), including the null semantics zip_with +
  * aggregate imply.
  */
class VectorFnsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("bit-identical to the HOF formulation on random float vectors") {
    val rng = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      (i.toLong,
        Array.fill(64)(rng.nextFloat() * 2 - 1),
        Array.fill(64)(rng.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val diff = df.select(
      graft.functions.VectorFns.dotCol(spark, col("a"), col("b")).as("fast"),
      Similarity.dotHof(col("a"), col("b")).as("hof"))
      .where(col("fast") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("double and long element types") {
    val df = Seq((Seq(1.5, 2.0), Seq(2.0, 3.0))).toDF("a", "b")
    assert(df.select(graft.functions.VectorFns.dotCol(spark, col("a"), col("b")))
      .head().getDouble(0) == 9.0)
    val dl = Seq((Seq(2L, 3L), Seq(4L, 5L))).toDF("a", "b")
    assert(dl.select(graft.functions.VectorFns.dotCol(spark, col("a"), col("b")))
      .head().getDouble(0) == 23.0)
  }

  test("length mismatch and null element yield NULL, like the HOF") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)),
      (2L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("id", "a", "b")
    val out = df.select(col("id"),
      graft.functions.VectorFns.dotCol(spark, col("a"), col("b")).as("fast"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect()
    for (r <- out) {
      assert(r.isNullAt(1), s"fast not null for id ${r.getLong(0)}")
      assert(r.isNullAt(2), s"hof not null for id ${r.getLong(0)}")
    }
  }

  test("whole-stage codegen keeps the scoring pipeline compiled") {
    // a non-local source, or the optimizer folds the projection into
    // a LocalTableScan before any codegen happens
    val df = spark.range(100)
      .select(array(col("id").cast("float"),
        (col("id") + 1).cast("float")).as("a"))
    val plan = df
      .select(graft.functions.VectorFns.dotCol(spark, col("a"), col("a")))
      .queryExecution.executedPlan.toString
    // the "*(n)" stage prefix marks WholeStageCodegen in the plan string
    assert(plan.linesIterator.next().startsWith("*("), plan)
  }
}
