package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class PerplexitySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("add-1 unigram perplexity matches hand math") {
    // counts: a->3, b->1; N=4, V=2 -> p(a)=4/6, p(b)=2/6
    val df = Seq((1L, "a a b"), (2L, "a")).toDF("id", "text")
    val got = Perplexity(df, "id", "text").collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("ppl")))).toMap
    // doc 2: single token 'a' -> ppl = 1/p(a) = 1.5 exactly
    assert(got(2L) == ((1L, 1.5)))
    // doc 1: ((2/3)^2 * (1/3))^(-1/3) = (27/4)^(1/3)
    assert(got(1L)._1 == 3L)
    assert(got(1L)._2 == BigDecimal(math.cbrt(27.0 / 4.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("common text scores lower perplexity than rare text") {
    val common = (1 to 40).map(i => (i.toLong, "the cat sat on the mat"))
    val rare = Seq((99L, "zyx wvu tsr qpo nml kji"))
    val df = (common ++ rare).toDF("id", "text")
    val out = Perplexity(df, "id", "text").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("ppl")).toMap
    assert(out(1L) < out(99L))
    // whitespace-only docs (no tokens) are absent, not NaN
    val e = Perplexity(Seq((1L, "x y"), (2L, "   ")).toDF("id", "text"),
      "id", "text")
    assert(e.count() == 1)
  }

  test("add-1 bigram perplexity matches hand math") {
    // doc1 "a a b" -> (a,a),(a,b); doc2 "b a" -> (b,a)
    // c2: each pair once; c1: a->2, b->1; V={a,b}=2
    // p(a|a)=p(b|a)=2/4, p(a|b)=2/3 -> ppl2: doc1=2.0, doc2=1.5 exact
    val df = Seq((1L, "a a b"), (2L, "b a")).toDF("id", "text")
    val got = Perplexity.bigram(df, "id", "text").collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("ppl2")))).toMap
    assert(got(1L) == ((2L, 2.0)))
    assert(got(2L) == ((1L, 1.5)))
  }

  test("bigram score separates word order that unigrams cannot see") {
    // same bag of words, shuffled transitions: unigram ppl identical,
    // bigram ppl must rank the corpus-consistent order lower
    val fluent = (1 to 30).map(i => (i.toLong, "the cat sat on the mat"))
    val shuffled = Seq((99L, "mat the on sat cat the"))
    val df = (fluent ++ shuffled).toDF("id", "text")
    val uni = Perplexity(df, "id", "text").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("ppl")).toMap
    assert(uni(1L) == uni(99L)) // unigram LM is order-blind
    val bi = Perplexity.bigram(df, "id", "text").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("ppl2")).toMap
    assert(bi(1L) < bi(99L))
    // sub-2-token docs are absent, not NaN
    val e = Perplexity.bigram(
      Seq((1L, "x y"), (2L, "solo"), (3L, " ")).toDF("id", "text"),
      "id", "text")
    assert(e.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("interpolatedBigram: hand-traced JM mixture on a tiny corpus, " +
    "OOV-safe where the pure bigram saturates") {
    // corpus "a b a b": bigrams (a,b)x2, (b,a)x1; c1: a->2, b->1;
    // unigrams a->2, b->2, T=4, V=2. P(b|a) = .75*2/2 + .25*3/6 = .875;
    // P(a|b) = .75*1/1 + .25*3/6 = .875 → ppl = 1/0.875 = 1.1429
    val df = Seq((1L, "a b a b")).toDF("id", "text")
    val r = Perplexity.interpolatedBigram(df, "id", "text").head()
    assert(r.getAs[Long]("n_bigrams") == 3L)
    assert(r.getAs[Double]("ppl_jm") == 1.1429)
    // an unseen transition ("b b") still scores via the unigram term
    // instead of collapsing to the add-1 floor alone: JM ppl for the
    // shuffled doc stays finite and above the fluent doc's
    val corpus = ((1 to 30).map(i => (i.toLong, "the cat sat on the mat"))
      :+ (99L, "mat the on sat cat the")).toDF("id", "text")
    val jm = Perplexity.interpolatedBigram(corpus, "id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("ppl_jm"))
      .toMap
    assert(jm(1L) < jm(99L))
    assert(jm(99L).isFinite)
  }

  test("ccnet buckets: per-language exact terciles of perplexity rank") {
    // lang en: 7 docs (tercile sizes 3/2/2), lang fr: 2 docs (fewer
    // rows than tiles -> ranks become tiles: head, middle)
    val en = Seq(
      "the the the", "the the cat", "the cat cat", "cat cat cat",
      "cat dog dog", "dog dog dog", "qqq zzz www")
      .zipWithIndex.map { case (t, i) => (i.toLong, t, "en") }
    val fr = Seq((100L, "le le le", "fr"), (101L, "xyz abc def", "fr"))
    val df = (en ++ fr).toDF("doc_id", "text", "lang")
    val got = Perplexity.buckets(df, "doc_id", "text", "lang")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("bucket")).toMap
    // reference: rank each lang by (ppl, doc_id), SQL ntile(3)
    val ppl = Perplexity(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("ppl")).toMap
    def expect(ids: Seq[Long]): Map[Long, String] = {
      val ordered = ids.sortBy(id => (ppl(id), id))
      val n = ordered.size
      val (q, r) = (n / 3, n % 3)
      ordered.zipWithIndex.map { case (id, i0) =>
        val tile =
          if (q == 0) i0 + 1
          else if (i0 < r * (q + 1)) i0 / (q + 1) + 1
          else r + (i0 - r * (q + 1)) / q + 1
        id -> Seq("head", "middle", "tail")(tile - 1)
      }.toMap
    }
    assert(got === expect(en.map(_._1)) ++ expect(fr.map(_._1)))
    assert(got(100L) == "head" && got(101L) == "middle")
  }

  test("persisted LM scores are identical to the from-scratch run") {
    val df = Seq((1L, "a a b c"), (2L, "a b a c"), (3L, "c b a"),
      (4L, "zz yy xx")).toDF("id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_lm_rt").toString + "/lm"
    Perplexity.ensureLm(df, "text", path)
    // frozen scoring of the training corpus == from-scratch scores,
    // with every n_oov 0 (drop it for the row-for-row identity)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.drop("n_oov").orderBy("id").collect().map(_.toSeq).toSeq
    val uniW = Perplexity.applyWith(df, "id", "text", path)
    assert(uniW.select("n_oov").collect().forall(_.getLong(0) == 0L))
    assert(rows(uniW) == rows(Perplexity(df, "id", "text")))
    assert(rows(Perplexity.bigramWith(df, "id", "text", path)) ==
      rows(Perplexity.bigram(df, "id", "text")))
    assert(rows(Perplexity.interpolatedBigramWith(df, "id", "text", path)) ==
      rows(Perplexity.interpolatedBigram(df, "id", "text")))
    // a second ensure with the same corpus is a no-op hit
    assert(!graft.lake.Artifacts.ensure(path, s"lm;col=text;n=${df.count()};src=") {
      fail("ensure must not rebuild on a fresh fingerprint")
    })
    // a changed corpus (different fingerprint) rebuilds
    val df2 = df.union(Seq((5L, "new doc entirely")).toDF("id", "text"))
    Perplexity.ensureLm(df2, "text", path)
    assert(rows(Perplexity.applyWith(df2, "id", "text", path)) ==
      rows(Perplexity(df2, "id", "text")))
  }

  test("frozen-LM scoring keeps OOV tokens: junk scores HIGH, " +
    "all-OOV docs stay in the output") {
    // ADVICE r10: the inner join dropped OOV tokens, so junk text
    // scored artificially LOW and all-OOV documents vanished — the
    // opposite of the CCNet fixed-reference-model contract.
    val train = (1 to 20).map(i => (i.toLong, "the cat sat on the mat"))
      .toDF("id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_lm_oov").toString + "/lm"
    Perplexity.ensureLm(train, "text", path)
    val eval = Seq(
      (1L, "the cat sat"),        // fully in-model
      (2L, "the cat zzz"),        // one OOV token
      (3L, "qqq zzz www")         // all OOV
    ).toDF("id", "text")
    val uni = Perplexity.applyWith(eval, "id", "text", path)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("ppl")))).toMap
    assert(uni.keySet == Set(1L, 2L, 3L), "all-OOV doc vanished")
    assert(uni(1L)._2 == 0L && uni(2L)._2 == 1L && uni(3L)._2 == 3L)
    // n_tokens counts ALL tokens, not just matched ones
    assert(uni(2L)._1 == 3L && uni(3L)._1 == 3L)
    // junk ranks ABOVE fluent text, and the all-OOV doc scores the
    // exact UNK-floor perplexity (N+V)/1 per token
    assert(uni(1L)._3 < uni(2L)._3 && uni(2L)._3 < uni(3L)._3)
    val Array(n, v) = spark.read.parquet(s"$path/unigrams")
      .agg(org.apache.spark.sql.functions.sum("c"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1))).head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    assert(uni(3L)._3 == BigDecimal((n + v).toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // bigram: unseen pair with SEEN context backs off to (0+1)/(c1+V),
    // not to the 1/V unseen-context floor; n_oov reports it
    val bi = Perplexity.bigramWith(eval, "id", "text", path)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("ppl2")))).toMap
    assert(bi.keySet == Set(1L, 2L, 3L))
    assert(bi(1L)._2 == 0L && bi(2L)._2 == 1L && bi(3L)._2 == 2L)
    assert(bi(1L)._1 == 2L && bi(2L)._1 == 2L)
    // fluent text still scores lowest; the all-unseen doc sits exactly
    // on the 1/V unseen-context floor (training vocab V=5 → ppl2=5)
    assert(bi(1L)._3 < bi(2L)._3 && bi(1L)._3 < bi(3L)._3)
    assert(bi(3L)._3 == 5.0, bi(3L))
    // JM: unseen transitions survive on the unigram term; finite
    val jm = Perplexity.interpolatedBigramWith(eval, "id", "text", path)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_oov"), r.getAs[Double]("ppl_jm")))).toMap
    assert(jm.keySet == Set(1L, 2L, 3L))
    assert(jm(3L)._2.isFinite && jm(1L)._2 < jm(3L)._2)
  }

  test("appendLm folds a new corpus exactly: appended == trained on union") {
    val a = Seq((1L, "a a b c"), (2L, "a b a c")).toDF("id", "text")
    val b = Seq((3L, "c b a d"), (4L, "d d e")).toDF("id", "text")
    val union = a.union(b)
    val base = java.nio.file.Files
      .createTempDirectory("graft_lm_app").toString
    Perplexity.saveLm(a, "text", s"$base/appended")
    Perplexity.appendLm(b, "text", s"$base/appended")
    Perplexity.saveLm(union, "text", s"$base/full")
    // table-for-table exact equality
    for (t <- Seq("unigrams", "bigrams", "uni2")) {
      val got = spark.read.parquet(s"$base/appended/$t")
        .collect().map(_.toSeq).toSet
      val want = spark.read.parquet(s"$base/full/$t")
        .collect().map(_.toSeq).toSet
      assert(got == want, s"table $t diverged")
    }
    // and the scores the artifact serves are the union-trained scores
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.drop("n_oov").orderBy("id").collect().map(_.toSeq).toSeq
    assert(rows(Perplexity.applyWith(union, "id", "text", s"$base/appended")) ==
      rows(Perplexity(union, "id", "text")))
    assert(rows(Perplexity.interpolatedBigramWith(
        union, "id", "text", s"$base/appended")) ==
      rows(Perplexity.interpolatedBigram(union, "id", "text")))
  }
}
