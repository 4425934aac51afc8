package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing fingerprints: determinism, the SIGMOD'03 coverage
  * guarantee, and sensitivity to edits.
  */
class FingerprintSpec extends AnyFunSuite {

  private def fp(s: String): Long =
    Fingerprints.winnow(UTF8String.fromString(s))

  private def fpSet(s: String, k: Int = 8, w: Int = 16): Set[Long] = {
    val arr = Fingerprints.winnowSet(UTF8String.fromString(s), k, w)
    (0 until arr.numElements()).map(arr.getLong).toSet
  }

  test("deterministic across calls") {
    val text = "the quick brown fox jumps over the lazy dog" * 5
    assert(fp(text) === fp(text))
    assert(fpSet(text) === fpSet(text))
  }

  test("identical texts share the digest; an edit changes it") {
    val a = "select count(*) from logs where level = 'error' group by day"
    assert(fp(a) === fp(a))
    assert(fp(a) !== fp(a.replace("error", "warn!")))
  }

  test("short inputs (< k bytes) fall back to a length-keyed hash") {
    assert(fp("abc") === fp("xyz")) // same length -> same fallback
    assert(fp("abc") !== fp("abcd"))
    assert(fpSet("ab").size === 1)
  }

  test("winnowing guarantee: docs sharing a substring >= w+k-1 chars share a fingerprint") {
    val k = 8; val w = 16
    val shared = "A" + ("shared-boilerplate-run-0123456789" * 3) // >> w+k-1
    val rng = new scala.util.Random(11)
    (1 to 20).foreach { _ =>
      val pre = rng.alphanumeric.take(rng.nextInt(200)).mkString
      val post = rng.alphanumeric.take(rng.nextInt(200)).mkString
      val a = pre + shared + rng.alphanumeric.take(100).mkString
      val b = rng.alphanumeric.take(150).mkString + shared + post
      assert(fpSet(a, k, w).intersect(fpSet(b, k, w)).nonEmpty,
        "pair sharing a long substring must share a winnowed fingerprint")
    }
  }

  test("unrelated random texts share (almost) no fingerprints") {
    val rng = new scala.util.Random(13)
    val a = rng.alphanumeric.take(2000).mkString
    val b = rng.alphanumeric.take(2000).mkString
    val inter = fpSet(a).intersect(fpSet(b))
    assert(inter.isEmpty)
  }

  test("winnow set density is ~2/(w+1) of k-grams") {
    val rng = new scala.util.Random(17)
    val text = rng.alphanumeric.take(5000).mkString
    val n = fpSet(text, 8, 16).size.toDouble
    val grams = 5000 - 8 + 1
    assert(n > grams * 0.05 && n < grams * 0.25,
      s"selected $n of $grams grams — outside plausible winnow density")
  }
}
