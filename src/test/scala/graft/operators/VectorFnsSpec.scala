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

  test("argmax cell assignment is bit-identical to the HOF formulation") {
    // the r13 blocked assignment expression vs the array_max(transform)
    // pipeline it replaced: same dots (left-to-right accumulation),
    // same tie-break (max score, then max id) — on float AND double
    // vectors, including planted exact ties and degenerate rows
    val rng = new scala.util.Random(7)
    val cents: Seq[(Int, Seq[Double])] = (0 until 37).map { i =>
      val v = Seq.fill(16)(rng.nextDouble() * 2 - 1)
      val n = math.sqrt(v.map(x => x * x).sum)
      (i, v.map(_ / n))
    } :+ (37, Seq.fill(16)(0.0))   // duplicate-score tie vs nothing
    val floatRows = (1 to 300).map { i =>
      (i.toLong, Array.fill(16)(rng.nextFloat() * 2 - 1))
    }
    val fdf = floatRows.toDF("id", "v")
    val fDiff = fdf.select(
      graft.functions.VectorFns.argmaxCellCol(spark, col("v"),
        typedLit(cents)).as("fast"),
      Similarity.assignCellHof(cents, col("v")).as("hof"))
      .where(col("fast") =!= col("hof"))
    assert(fDiff.count() == 0)
    // double vectors + an all-zero vector (every dot 0.0 → pure id
    // tie-break: both paths must pick the MAX id)
    val ddf = ((1 to 100).map { i =>
      (i.toLong, Seq.fill(16)(rng.nextDouble() * 2 - 1))
    } :+ (0L, Seq.fill(16)(0.0))).toDF("id", "v")
    val out = ddf.select(col("id"),
      graft.functions.VectorFns.argmaxCellCol(spark, col("v"),
        typedLit(cents)).as("fast"),
      Similarity.assignCellHof(cents, col("v")).as("hof")).collect()
    out.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"id=${r.getLong(0)}: $r")
    }
    assert(out.find(_.getLong(0) == 0L).get.getInt(1) == 37)
    // degenerate rows: wrong length / null element → both fall to the
    // max-id tie-break (all dots null under the HOF)
    val weird = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0)),
      (2L, (Seq.fill[java.lang.Double](15)(1.0) :+
        (null: java.lang.Double))))
      .toDF("id", "v")
    val wout = weird.select(col("id"),
      graft.functions.VectorFns.argmaxCellCol(spark, col("v"),
        typedLit(cents)).as("fast"),
      Similarity.assignCellHof(cents, col("v")).as("hof")).collect()
    wout.foreach { r =>
      assert(r.getInt(1) == r.getInt(2) && r.getInt(1) == 37, r.toString)
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
