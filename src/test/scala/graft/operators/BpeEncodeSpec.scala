package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class BpeEncodeSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("per-doc token counts with trained merges applied") {
    // merges learned over the whole corpus: (e,s), (es,t), (est,</w>)
    // — the Sennrich example. After them: low=4 tokens, lower=6,
    // newest=4 (n,e,w,est</w>), widest=4 (w,i,d,est</w>).
    val text = ("low " * 5) + ("lower " * 2) +
      ("newest " * 6) + ("widest " * 3)
    val corpus = Seq((1, text.trim), (2, "low lower newest widest"))
      .toDF("doc_id", "text")
    val out = BpeEncode(corpus, "doc_id", "text", rounds = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getInt(0), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tokens")))
    assert(out(0) == ((1, 16L, 5 * 4 + 2 * 6 + 6 * 4 + 3 * 4L)))
    assert(out(1) == ((2, 4L, 18L)))
  }

  test("out-of-vocabulary words fall back to chars + end-of-word") {
    val trained = BpeMerges.train(
      Seq("newest newest").toDF("text"), "text", rounds = 1)
    val out = BpeEncode(Seq((1, "best")).toDF("doc_id", "text"),
      "doc_id", "text", trained).collect()
    trained.release()
    assert(out(0).getAs[Long]("n_words") == 1L &&
      out(0).getAs[Long]("n_tokens") == 5L)
  }
}
