package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic properties of the sketch aggregators. `merge` must be a
  * commutative, associative monoid action for Spark's partial
  * aggregation (map-side combine + arbitrary merge trees) to be
  * correct — checked with scalacheck over random buffer splits.
  */
class AggregatorsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(r.passed, r.status.toString)
  }

  private val mh = new Aggregators.MinHash(32)

  private def signature(xs: Seq[Long]): Seq[Long] =
    xs.foldLeft(mh.zero)((b, a) => mh.reduce(b, a)).toSeq

  test("MinHash: merge of any split equals the full signature (scalacheck)") {
    val gen = for {
      xs <- Gen.nonEmptyListOf(Gen.long)
      i <- Gen.choose(0, xs.length)
    } yield (xs, i)
    check(Prop.forAll(gen) { case (xs, i) =>
      val (l, r) = xs.splitAt(i)
      val merged = mh.merge(
        l.foldLeft(mh.zero)(mh.reduce),
        r.foldLeft(mh.zero)(mh.reduce))
      merged.toSeq == signature(xs)
    })
  }

  test("MinHash: merge is commutative (scalacheck)") {
    val gen = for {
      a <- Gen.listOf(Gen.long)
      b <- Gen.listOf(Gen.long)
    } yield (a, b)
    check(Prop.forAll(gen) { case (a, b) =>
      val ba = a.foldLeft(mh.zero)(mh.reduce)
      val bb = b.foldLeft(mh.zero)(mh.reduce)
      // merge mutates its first arg -> rebuild buffers per call
      val m1 = mh.merge(a.foldLeft(mh.zero)(mh.reduce), bb).toSeq
      val m2 = mh.merge(b.foldLeft(mh.zero)(mh.reduce), ba).toSeq
      m1 == m2
    })
  }

  test("MinHash: order-insensitive (a signature is a set property)") {
    val xs = (1L to 500L).map(Aggregators.mix64)
    assert(signature(xs) === signature(scala.util.Random.shuffle(xs)))
  }

  test("MinHash estimate tracks true Jaccard within sampling error") {
    val mh128 = new Aggregators.MinHash(128)
    def sig(xs: Seq[Long]) = xs.foldLeft(mh128.zero)(mh128.reduce).toSeq
    val universe = (1L to 2000L).map(Aggregators.mix64)
    val a = universe.take(1200)
    val b = universe.drop(400) // |inter|=800, |union|=2000 -> J=0.4
    val est = sig(a).zip(sig(b)).count { case (x, y) => x == y } / 128.0
    assert(math.abs(est - 0.4) < 0.15, s"estimate $est vs true 0.4")
  }

  test("MinHash rejects out-of-range hash counts at construction") {
    intercept[IllegalArgumentException](new Aggregators.MinHash(0))
    intercept[IllegalArgumentException](new Aggregators.MinHash(257))
  }

  test("SimHash: merge of split equals full; identical input -> hamming 0") {
    val sh = new Aggregators.SimHash
    val xs = (1L to 300L).map(Aggregators.mix64)
    val full = xs.foldLeft(sh.zero)(sh.reduce)
    val (l, r) = xs.splitAt(97)
    val merged = sh.merge(
      l.foldLeft(sh.zero)(sh.reduce), r.foldLeft(sh.zero)(sh.reduce))
    assert(sh.finish(full) === sh.finish(merged))
  }

  test("SimHash: small edits flip few bits, disjoint inputs flip many") {
    val sh = new Aggregators.SimHash
    def sig(xs: Seq[Long]) = sh.finish(xs.foldLeft(sh.zero)(sh.reduce))
    val base = (1L to 400L).map(Aggregators.mix64)
    val edited = base.drop(8) ++ (9001L to 9008L).map(Aggregators.mix64)
    val disjoint = (5000L to 5400L).map(Aggregators.mix64)
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(base), sig(edited)) <= 12)
    assert(hamming(sig(base), sig(disjoint)) >= 16)
  }
}
