package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class BinaryAnnSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def sig(v: Seq[Double]): Seq[Long] =
    Seq(v).toDF("v")
      .select(Similarity.binarySignature(col("v")))
      .as[Seq[Long]].head()

  test("signature packs signs MSB-first via shift-or") {
    // bits: 1,0,1,0 (strictly positive → 1; zero/negative → 0)
    assert(sig(Seq(1.0, -1.0, 0.5, 0.0)) === Seq(10L))
    assert(sig(Seq(-1.0, -2.0)) === Seq(0L))
    assert(sig(Seq(3.0)) === Seq(1L))
  }

  test("vectors beyond 64 dims spill into additional words") {
    val v = Seq.fill(64)(1.0) ++ Seq(1.0, -1.0, 1.0, -1.0, -1.0, 1.0)
    val s = sig(v)
    assert(s.length === 2)
    assert(s.head === -1L) // 64 ones
    assert(s(1) === 41L)   // 101001 MSB-first
  }

  test("empty vectors get empty signatures and never reach the rerank") {
    assert(sig(Seq.empty[Double]) === Seq.empty[Long])
    // one malformed row must not abort the scan or match anything
    val q = Seq((1L, Seq(1.0, 1.0, -1.0, 1.0))).toDF("qid", "qvec")
    val c = Seq(
      (10L, Seq(1.0, 1.0, -1.0, 1.0)),
      (11L, Seq.empty[Double])
    ).toDF("cid", "cvec")
    val got = Similarity.annBinary(q, c, k = 5, maxHamming = 4)
      .select("cid").as[Long].collect().toSet
    assert(got === Set(10L))
  }

  test("positive per-coordinate scaling preserves the signature exactly") {
    val base = (0 until 64).map(i => math.sin(i * 2.7) + 0.001)
    val scaled = base.zipWithIndex.map { case (x, i) =>
      x * (1.0 + 0.01 * ((i % 5) - 2))
    }
    assert(sig(base) === sig(scaled))
  }

  test("hamming counts differing sign bits across words") {
    val a = Seq.fill(70)(1.0)
    val b = a.updated(3, -1.0).updated(68, -1.0)
    val d = Seq((a, b)).toDF("a", "b")
      .select(Similarity.hamming(
        Similarity.binarySignature(col("a")),
        Similarity.binarySignature(col("b"))))
      .as[Long].head()
    assert(d === 2L)
  }

  test("mipsBinary ranks by inner product, not cosine") {
    // candidate B is perfectly aligned but tiny; candidate C is at a
    // modest angle but large — MIPS must put C first (dot 8 > 0.1),
    // where cosine search would put B first
    val q = Seq((1L, Seq(1.0, 0.0, 0.0, 0.0))).toDF("qid", "qvec")
    val c = Seq(
      (10L, Seq(0.1, 0.0, 0.0, 0.0)),           // cos 1.0, dot 0.1
      (11L, Seq(8.0, 6.0, 0.0, 0.0)),           // cos 0.8, dot 8.0
      (12L, Seq(-5.0, 1.0, 1.0, 1.0))           // negative dot
    ).toDF("cid", "cvec")
    val got = Similarity.mipsBinary(q, c, k = 3, maxHamming = 4)
      .select("cid", "dot", "rank").as[(Long, Double, Int)]
      .collect().sortBy(_._3).toSeq
    assert(got.map(_._1).take(2) === Seq(11L, 10L))
    assert(got.head._2 === 8.0)
  }

  test("mipsBinary recalls max-scale copies at Hamming <= 1") {
    val rnd = new scala.util.Random(13)
    val base = (0L until 100L).map { id =>
      val v = Seq.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (id, v.map(_ / n))
    }
    val copies = base.take(4).map { case (id, v) =>
      (id + 1000, v.map(_ * 10.0))
    }
    val corpus = (base ++ copies).toDF("cid", "cvec")
    val q = base.take(4).toDF("qid", "qvec")
    val got = Similarity.mipsBinary(q, corpus, k = 2, maxHamming = 6,
        minDot = 6.0)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    assert(got === (0L until 4L).map(id => (id, id + 1000)).toSet)
  }

  test("annBinary recalls planted positive-scaled copies exactly") {
    val rnd = new scala.util.Random(7)
    val base = (0L until 200L).map(id =>
      (id, Seq.fill(64)(rnd.nextGaussian())))
    val copies = base.take(5).map { case (id, v) =>
      (id + 1000, v.zipWithIndex.map { case (x, i) =>
        x * (1.0 + 0.005 * ((i % 3) - 1)) })
    }
    val corpus = (base ++ copies).toDF("cid", "cvec")
    val q = base.take(5).toDF("qid", "qvec")
    val got = Similarity.annBinary(q, corpus, k = 3, maxHamming = 6,
        minSim = 0.99)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    assert(got === (0L until 5L).map(id => (id, id + 1000)).toSet)
  }
}
