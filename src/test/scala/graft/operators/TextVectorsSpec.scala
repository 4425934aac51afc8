package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class TextVectorsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("vector components are bucket counts summing to token count") {
    val df = Seq((1L, "the cat sat on the mat"), (2L, "the the the"))
      .toDF("id", "text")
    val v = TextVectors.hashed(df, "id", "text", dim = 16)
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Float](1)).toMap
    assert(v(1L).length == 16 && v(1L).sum == 6.0f)
    assert(v(2L).sum == 3.0f)
    // 'the' hashes to one bucket: doc 2 has a single component = 3
    assert(v(2L).count(_ != 0f) == 1 && v(2L).max == 3.0f)
  }

  test("identical texts produce identical vectors; empty text no row") {
    val df = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "   "))
      .toDF("id", "text")
    val v = TextVectors.hashed(df, "id", "text", dim = 8)
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Float](1)).toMap
    assert(v.keySet === Set(1L, 2L))
    assert(v(1L) === v(2L))
  }

  test("hashed vectors feed kmeans end-to-end") {
    val df = Seq(
      (1L, "aa bb aa bb aa"), (2L, "aa bb aa bb"),
      (3L, "zz yy xx zz yy"), (4L, "zz yy xx"))
      .toDF("id", "text")
    val v = TextVectors.hashed(df, "id", "text", dim = 8)
    val cells = KMeans.assign(v, "id", "vector", k = 2, iters = 2,
        scale = 1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("cell")).toMap
    assert(cells(1L) == cells(2L))
    assert(cells(3L) == cells(4L))
    assert(cells(1L) != cells(3L))
  }
}
