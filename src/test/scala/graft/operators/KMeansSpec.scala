package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class KMeansSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("two well-separated groups converge to two cells in 2 rounds") {
    // whatever two vectors md5-init picks as seeds, two Lloyd rounds
    // must end with the tight groups in distinct cells (hand-traced in
    // the scaladoc's worst case: both seeds from one group)
    val df = Seq(
      (1L, vec(0.0, 0)), (2L, vec(0.1, 0)),
      (3L, vec(5.0, 0)), (4L, vec(5.1, 0))).toDF("id", "v")
    val got = KMeans.assign(df, "id", "v", k = 2, iters = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("cell")).toMap
    assert(got(1L) == got(2L))
    assert(got(3L) == got(4L))
    assert(got(1L) != got(3L))
  }

  test("quantization rounds symmetrically for negative values") {
    val df = Seq((1L, vec(0.016, -0.016, 0.0149))).toDF("id", "v")
    val q = df.select(KMeans.quantize(col("v"), 100).as("q"))
      .head().getSeq[Long](0)
    assert(q == Seq(2L, -2L, 1L))
  }

  test("k larger than distinct rows still assigns every row") {
    val df = Seq((1L, vec(1, 0)), (2L, vec(0, 1))).toDF("id", "v")
    val got = KMeans.assign(df, "id", "v", k = 2, iters = 1)
    assert(got.count() == 2)
  }

  test("assignDist: distance to the converged centroid, cells match assign") {
    // k=1 removes init nondeterminism: after one update the single
    // centroid is the mean (400,200)/3 in quantized units; distances
    // follow by hand. (With k≥2 an extreme outlier legitimately
    // becomes its own centroid at dist 0 — that's Lloyd, not a bug.)
    val df = Seq(
      (1L, vec(0.0, 0.0)), (2L, vec(0.0, 2.0)), (3L, vec(4.0, 0.0))
    ).toDF("id", "v")
    val d = KMeans.assignDist(df, "id", "v", k = 1, iters = 2)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("cell"), r.getAs[Double]("dist")))).toMap
    val a = KMeans.assign(df, "id", "v", k = 1, iters = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("cell")).toMap
    assert(d.view.mapValues(_._1).toMap == a)
    assert(d.values.forall(_._2 >= 0.0))
    // p1=(0,0): dist = sqrt(ss/n²)/scale with s=(400,200), n=3
    val ss = 400.0 * 400 + 200.0 * 200
    val exp1 = BigDecimal(math.sqrt(ss / 9.0) / 100.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d(1L)._2 == exp1)
    // the point farthest from the mean carries the largest distance
    assert(d(3L)._2 > d(2L)._2 && d(2L)._2 > d(1L)._2)
  }

  test("clusterSample caps each cell, keeps small cells whole") {
    // two tight groups; cap 2 per cell: the 3-member group loses one
    // member, the 2-member group survives whole
    val df = Seq(
      (1L, vec(0.0, 0)), (2L, vec(0.1, 0)), (3L, vec(0.2, 0)),
      (4L, vec(5.0, 0)), (5L, vec(5.1, 0))).toDF("id", "v")
    val kept = KMeans.clusterSample(df, "id", "v", k = 2, iters = 2,
      perCell = 2)
    val byCell = kept.collect()
      .groupBy(_.getAs[Int]("cell")).view.mapValues(_.length).toMap
    assert(byCell.values.forall(_ <= 2), s"cell over cap: $byCell")
    assert(kept.count() == 4)
    // deterministic: same draw twice
    val again = KMeans.clusterSample(df, "id", "v", k = 2, iters = 2,
      perCell = 2).collect().map(_.getLong(0)).toSet
    assert(again == kept.collect().map(_.getLong(0)).toSet)
  }

  test("clusterEval: perfect clustering scores ARI = purity = 1") {
    val df = Seq(
      (1L, vec(0.0, 0), 7), (2L, vec(0.1, 0), 7),
      (3L, vec(5.0, 0), 9), (4L, vec(5.1, 0), 9)
    ).toDF("id", "v", "lab")
    val r = KMeans.clusterEval(df, "id", "v", "lab", k = 2, iters = 2)
      .head()
    assert(r.getAs[Long]("n_points") == 4L)
    assert(r.getAs[Int]("n_cells") == 2)
    assert(r.getAs[Double]("purity") == 1.0)
    assert(r.getAs[Double]("ari") == 1.0)
  }

  test("clusterEval: a single truth label scores chance-level ARI = 0") {
    // two real cells but only one label: agreement is exactly what
    // chance predicts (expected index = index), so ARI must be 0 while
    // purity is trivially 1
    val df = Seq(
      (1L, vec(0.0, 0), 1), (2L, vec(0.1, 0), 1),
      (3L, vec(5.0, 0), 1), (4L, vec(5.1, 0), 1)
    ).toDF("id", "v", "lab")
    val r = KMeans.clusterEval(df, "id", "v", "lab", k = 2, iters = 2)
      .head()
    assert(r.getAs[Double]("ari") == 0.0)
    assert(r.getAs[Double]("purity") == 1.0)
  }

  test("silhouette: tight well-separated groups score near 1, cells " +
    "match assign") {
    val df = Seq(
      (1L, vec(0.0, 0)), (2L, vec(0.1, 0)),
      (3L, vec(5.0, 0)), (4L, vec(5.1, 0))).toDF("id", "v")
    val sil = KMeans.silhouette(df, "id", "v", k = 2, iters = 2)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("cell"), r.getAs[Double]("dist_own"),
          r.getAs[Double]("dist_next"), r.getAs[Double]("sil")))).toMap
    val cells = KMeans.assign(df, "id", "v", k = 2, iters = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("cell")).toMap
    sil.foreach { case (id, (cell, a, b, s)) =>
      assert(cell == cells(id), s"cell mismatch for $id")
      assert(a < b, s"own centroid must be nearer for $id")
      assert(s > 0.8, s"tight separated groups: sil ~1, got $s for $id")
    }
  }

  test("silhouette fails loudly when Lloyd collapses to one cell") {
    // duplicate-heavy input: every vector identical → the k=2 seeds
    // coincide, the first update folds all mass into one cell, and a
    // single surviving centroid has no second-nearest distance — the
    // operator must refuse rather than emit null/diverging rows
    val df = Seq(
      (1L, vec(1.0, 1)), (2L, vec(1.0, 1)), (3L, vec(1.0, 1)),
      (4L, vec(1.0, 1))).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      KMeans.silhouette(df, "id", "v", k = 2, iters = 2).collect()
    }
    assert(e.getMessage.contains("centroid"), e.getMessage)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
