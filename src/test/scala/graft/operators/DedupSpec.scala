package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class DedupSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("exact dedup groups identical texts, keeps min id") {
    val df = Seq(
      (1L, "hello world"), (2L, "hello world"), (3L, "different"),
      (7L, "hello world")).toDF("id", "text")
    val out = Dedup.exact(df, "id", "text")
      .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies")))
      .toSet
    assert(out === Set((1L, 3L), (3L, 1L)))
  }

  test("normalized dedup ignores case and whitespace runs") {
    val df = Seq(
      (1L, "Hello   World"), (2L, "  hello world "), (3L, "HELLO\tWORLD"),
      (4L, "hello, world")).toDF("id", "text")
    val out = Dedup.normalized(df, "id", "text")
      .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies")))
      .toSet
    assert(out === Set((1L, 3L), (4L, 1L)))
  }

  test("substring dedup: non-first occurrences of duplicated k-grams are cut") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")   // 10 tokens
    val eight = (1 to 8).map(i => s"m$i").mkString(" ")  // one exact 8-gram
    val df = Seq(
      (1L, ten),                    // first occurrence of the shared span
      (2L, ten + " x y z"),         // later copy + unique tail
      (3L, "p q"),                  // shorter than k: untouched
      (4L, eight + " " + eight)     // within-doc repeat: second copy cut
    ).toDF("id", "text")
    val out = Dedup.substringDedup(df, "id", "text", k = 8)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Int]("n_removed"),
          r.getAs[String]("cleaned")))).toMap
    // doc 1 is globally first for every shared gram: intact
    assert(out(1L) == ((10, 0, ten)))
    // doc 2's grams at pos 0..2 are non-first: tokens 0..9 covered
    assert(out(2L) == ((13, 10, "x y z")))
    assert(out(3L) == ((2, 0, "p q")))
    // self-repeat: the second 8-token copy is removed
    assert(out(4L) == ((16, 8, eight)))
  }

  test("substring dedup conserves tokens under overlapping repeats") {
    // token-conservation invariant: n_tokens == n_removed + |cleaned|,
    // on shapes chosen to stress the interval-union math — nested
    // repeats, period-1 runs, overlapping shifted copies
    val run = ("z " * 30).trim                       // period-1 run
    val phrase = (1 to 10).map(i => s"p$i").mkString(" ")
    val df = Seq(
      (1L, run),                                     // self-overlap
      (2L, s"$phrase middle $phrase"),               // within-doc repeat
      (3L, s"lead $phrase tail"),                    // shifted copy
      (4L, s"$phrase $run"),                         // both families
      (5L, "tiny")).toDF("id", "text")
    val out = Dedup.substringDedup(df, "id", "text", k = 4).collect()
    assert(out.length == 5)
    out.foreach { r =>
      val cleanedTokens =
        r.getAs[String]("cleaned").split("\\s+").count(_.nonEmpty)
      assert(r.getAs[Int]("n_tokens") ==
        r.getAs[Int]("n_removed") + cleanedTokens,
        s"conservation violated for id ${r.get(0)}: $r")
    }
  }

  test("passage dedup: cross-doc windows count, within-doc repeats don't") {
    val w = (1 to 20).map(i => s"w$i").mkString(" ")     // one full window
    val df = Seq(
      (1L, w + " t1 t2 t3 t4 t5"),  // [w, tail1] — shares w with doc 2
      (2L, w + " u1 u2 u3 u4 u5"),  // [w, tail2]
      (3L, "lonely words only"),    // single unique short passage
      (4L, w.replace("w", "x") + " " + w.replace("w", "x")) // self-repeat
    ).toDF("id", "text")
    val out = Dedup.passageDuplication(df, "id", "text", window = 20)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_passages"), r.getAs[Long]("n_dup_passages"),
          r.getAs[Double]("dup_ratio"))))
      .toMap
    assert(out(1L) == ((2L, 1L, 0.5)))  // shared window flagged
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((1L, 0L, 0.0)))
    // the repeated passage occurs only within doc 4 → not duplicated
    assert(out(4L) == ((2L, 0L, 0.0)))
  }

  test("exactJaccardFor computes hand-checked set Jaccard") {
    // a: {w1 w2 w3, w2 w3 w4} ; b: {w2 w3 w4, w3 w4 w5} -> J = 1/3
    val docs = Seq(
      (1L, "w1 w2 w3 w4"), (2L, "w2 w3 w4 w5")).toDF("id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val j = Dedup.exactJaccardFor(pairs, docs, "id", "text", 3)
      .collect().head.getAs[Double]("jaccard")
    assert(math.abs(j - 1.0 / 3.0) < 1e-12)
  }

  test("identical docs have exact Jaccard 1.0, disjoint docs 0.0") {
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z q r s"))
      .toDF("id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.exactJaccardFor(pairs, docs, "id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(out((1L, 2L)) === 1.0)
    assert(out((1L, 3L)) === 0.0)
  }

  test("ngramJaccardPairs finds the planted pair on inline data") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely unrelated text with other words entirely"))
      .toDF("id", "text")
    val out = Dedup.ngramJaccardPairs(docs, "id", "text", n = 3,
        threshold = 0.5, maxDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet === Set((1L, 2L)))
  }

  test("contamination report: dirty fraction of eval grams in corpus") {
    // bench doc 1: 4 tokens -> 2 distinct 3-grams ("a b c", "b c d");
    // corpus contains "a b c" (via doc 10) but never "b c d" -> 1/2.
    // bench doc 2 shares nothing -> 0/1.
    val corpus = Seq(
      (10L, "x y a b c z"), (11L, "unrelated corpus content here"))
      .toDF("id", "text")
    val bench = Seq((1L, "a b c d"), (2L, "q r s")).toDF("id", "text")
    val got = Dedup.contaminationReport(corpus, bench, "id", "text", n = 3)
      .collect().map(r => (r.getAs[Long]("bench_id"),
        r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"),
        r.getAs[Double]("dirty_frac"))).toSet
    assert(got === Set((1L, 2L, 1L, 0.5), (2L, 1L, 0L, 0.0)))
  }

  test("digest index: build, filter, append accumulates across batches") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_didx").toFile.getPath + "/idx"
    val batch1 = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
    Dedup.buildDigestIndex(batch1, "text", dir)
    // batch 2: one re-send of "alpha", one new row
    val batch2 = Seq((3L, "alpha"), (4L, "gamma")).toDF("id", "text")
    val fresh2 = Dedup.filterAgainstIndex(batch2, "text", dir)
      .select("id").as[Long].collect().toSet
    assert(fresh2 == Set(4L))
    Dedup.appendToDigestIndex(
      batch2.where($"id" === 4L), "text", dir)
    // batch 3 re-sends rows from BOTH earlier batches
    val batch3 = Seq((5L, "beta"), (6L, "gamma"), (7L, "delta"))
      .toDF("id", "text")
    val fresh3 = Dedup.filterAgainstIndex(batch3, "text", dir)
      .select("id").as[Long].collect().toSet
    assert(fresh3 == Set(7L))
    // the index stores digests only — one 32-char hex column
    val idx = spark.read.parquet(dir)
    assert(idx.columns.toSeq == Seq("content_hash"))
    assert(idx.count() == 3)
  }

  test("noveltyScore: df=1 grams are novel, shared grams are not") {
    // B and C are identical -> every gram of theirs has df >= 2 ->
    // novelty 0.0; A shares no vocabulary -> all grams df=1 -> 1.0
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five"),
      (3L, "one two three four five")).toDF("id", "text")
    val got = Dedup.noveltyScore(df, "id", "text", n = 3)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty"))).toMap
    assert(got(1L) == ((3L, 3L, 1.0)))
    assert(got(2L) == ((3L, 0L, 0.0)))
    assert(got(3L) == ((3L, 0L, 0.0)))
  }

  test("redactContaminated drops exactly the covered spans, " +
    "hand-traced") {
    val bench = Seq((100L, "a b c d")).toDF("id", "text")
    val corpus = Seq(
      (1L, "x a b c y"), // "a b c" at pos 2 → drop 2,3,4 → "x y"
      (2L, "p q r"),     // untouched
      (3L, "a b c d"),   // both bench grams → fully redacted
      (4L, "a b")        // 2 tokens: its single short gram ≠ any 3-gram
    ).toDF("id", "text")
    val got = Dedup.redactContaminated(corpus, bench, "id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Int]("n_dirty"),
          r.getAs[String]("clean_text")))).toMap
    assert(got(1L) == ((5, 3, "x y")), got(1L))
    assert(got(2L) == ((3, 0, "p q r")), got(2L))
    assert(got(3L) == ((4, 4, "")), got(3L))
    assert(got(4L) == ((2, 0, "a b")), got(4L))
  }

  test("redactContaminated: sub-n documents emit no grams on either side") {
    // a 2-token bench row must NOT redact exact 2-token corpus docs —
    // the exactly-n contract (no sub-n edge grams), on both sides
    val bench = Seq((100L, "a b")).toDF("id", "text")
    val corpus = Seq(
      (1L, "a b"),     // identical to the short bench row: untouched
      (2L, "x a b y")  // contains "a b" but no 3-gram matches
    ).toDF("id", "text")
    val got = Dedup.redactContaminated(corpus, bench, "id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("n_dirty"), r.getAs[String]("clean_text")))).toMap
    assert(got(1L) == ((0, "a b")), got(1L))
    assert(got(2L) == ((0, "x a b y")), got(2L))
  }

  test("lshRecommend independently derives the shipped 128/32 banding " +
    "at target 0.8") {
    val rec = Dedup.lshRecommend(128, 0.8)
    assert(rec.bands == 32 && rec.rows == 4, rec)
    assert(rec.pAtTarget > 0.9999, rec.pAtTarget) // P(miss) ~ 5e-8
    // the next-steeper split (16x8) misses too often to ship
    val sixteen = Dedup.lshPlan(128, 0.8).find(_.bands == 16).get
    assert(sixteen.pAtTarget < 0.999, sixteen.pAtTarget)
    // a stricter target needs more rows per band (steeper curve):
    // at 0.95 the planner can afford 16 bands
    val strict = Dedup.lshRecommend(128, 0.95)
    assert(strict.bands <= 32, strict)
  }
}
