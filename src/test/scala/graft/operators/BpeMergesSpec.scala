package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class BpeMergesSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("learns the classic Sennrich merges with deterministic ties") {
    // vocab {low:5, lower:2, newest:6, widest:3} — the paper's example
    val text = ("low " * 5) + ("lower " * 2) +
      ("newest " * 6) + ("widest " * 3)
    val df = Seq(text.trim).toDF("text")
    val out = BpeMerges(df, "text", rounds = 3)
      .collect().map(r => (r.getAs[Int]("merge_rank"),
        r.getAs[String]("lhs"), r.getAs[String]("rhs"),
        r.getAs[Long]("freq")))
    // round 1: (e,s)=(s,t)=(t,</w>)=9 — lexicographic tie-break on lhs
    // round 2: es+t=9; round 3: est+</w>=9
    assert(out.toSeq == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", BpeMerges.Eow, 9L)))
  }

  test("single-char words merge straight into the end-of-word symbol") {
    val df = Seq("a a a b").toDF("text")
    val out = BpeMerges(df, "text", rounds = 1)
      .collect().map(r => (r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("freq")))
    assert(out.toSeq == Seq(("a", BpeMerges.Eow, 3L)))
  }

  test("runs of a repeated symbol merge leftmost non-overlapping") {
    // 'aaaa' -> pairs (a,a)x3 within one word; after merging (a,a) the
    // word becomes aa,aa,</w> — the greedy fold, not an overlap count
    val df = Seq("aaaa aaaa").toDF("text")
    val r1 = BpeMerges(df, "text", rounds = 2).collect()
    assert(r1(0).getAs[String]("lhs") == "a" &&
      r1(0).getAs[String]("rhs") == "a")
    // round 2's winner has lhs 'aa' — proof round 1's fold left
    // [aa,aa,</w>]: a leftover single 'a' (overlap-style merge) would
    // make (a,</w>) win the lexicographic tie instead
    assert((r1(1).getAs[String]("lhs"), r1(1).getAs[String]("rhs")) ==
      ("aa", BpeMerges.Eow))
  }

  test("saved tokenizer round-trips: load+encode == train+encode") {
    val df = Seq((1L, "low lower lowest"), (2L, "new newer newest"),
      (3L, "low new")).toDF("id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_bpe_rt").toString + "/tok"
    val direct = BpeMerges.train(df, "text", rounds = 3)
    BpeMerges.save(direct, path)
    val loaded = BpeMerges.load(spark, path)
    assert(loaded.merges.orderBy("merge_rank").collect().map(_.toSeq).toSeq ==
      direct.merges.orderBy("merge_rank").collect().map(_.toSeq).toSeq)
    def enc(t: BpeMerges.Trained) =
      BpeEncode(df, "id", "text", t).orderBy("id")
        .collect().map(_.toSeq).toSeq
    assert(enc(loaded) == enc(direct))
    direct.release()
    // ensureTrained: second call with the same corpus loads, no retrain
    val e1 = BpeMerges.ensureTrained(df, "text", 3, path + "2")
    val mf = new java.io.File(path + "2", "_manifest.json")
    val stamp = mf.lastModified()
    val e2 = BpeMerges.ensureTrained(df, "text", 3, path + "2")
    assert(mf.lastModified() == stamp, "fresh hit must not rebuild")
    assert(enc(e2) == enc(e1))
  }
}
