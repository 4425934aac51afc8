package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Pins the exact-vs-approximate percentile swap the q39 scaladoc
  * promises: `approx_percentile` (t-digest, partial-aggregable — the
  * 100 TB path) must land within tolerance of the exact sort-based
  * `percentile` on a skewed distribution.
  */
class PercentileSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private lazy val df = {
    val rnd = new scala.util.Random(11)
    (1 to 50000).map(_ => math.pow(rnd.nextDouble(), 3) * 1000.0)
      .toDF("v")
  }

  test("approx_percentile tracks exact percentile within 1% of range") {
    val exact = df.select(
        expr("percentile(v, array(0.25D, 0.5D, 0.75D, 0.95D))"))
      .as[Seq[Double]].head()
    val approx = df.select(
        expr("approx_percentile(v, array(0.25D, 0.5D, 0.75D, 0.95D), 10000)"))
      .as[Seq[Double]].head()
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e - a) <= 10.0, s"exact $e vs approx $a")
    }
  }

  test("exact percentile interpolates linearly (quantile_cont semantics)") {
    val got = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
      .select(expr("percentile(v, array(0.5D, 0.25D))"))
      .as[Seq[Double]].head()
    assert(got === Seq(2.5, 1.75))
  }
}
