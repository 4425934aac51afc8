package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class ChunkingSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g h i j"),       // 10 tokens
    (2L, "one two three"),             // 3 tokens — single short chunk
    (3L, "x"),                         // 1 token
    (4L, "  padded   whitespace  ")    // trim + collapse
  ).toDF("doc_id", "text")

  test("stride == size partitions the document; tail chunk is short") {
    val got = Chunking.slidingChunks(docs, "doc_id", "text",
        chunkSize = 4, stride = 4)
      .where($"doc_id" === 1L)
      .orderBy("chunk_id")
      .select("chunk_id", "start_tok", "chunk_tokens")
      .as[(Int, Int, Int)].collect().toSeq
    assert(got === Seq((0, 0, 4), (1, 4, 4), (2, 8, 2)))
  }

  test("stride < size overlaps; every token is covered by some chunk") {
    val chunks = Chunking.slidingChunks(docs, "doc_id", "text",
      chunkSize = 4, stride = 2)
    val doc1 = chunks.where($"doc_id" === 1L)
      .select("start_tok", "chunk_tokens").as[(Int, Int)].collect()
    val covered = doc1.flatMap { case (s, n) => s until (s + n) }.toSet
    assert(covered === (0 until 10).toSet)
    // overlapping starts: 0,2,4,6,8
    assert(doc1.map(_._1).sorted.toSeq === Seq(0, 2, 4, 6, 8))
  }

  test("chunk hashes equal md5 of the reconstructed chunk text") {
    val got = Chunking.slidingChunks(docs, "doc_id", "text",
        chunkSize = 4, stride = 4)
      .where($"doc_id" === 1L && $"chunk_id" === 1)
      .select("chunk_hash").as[String].head()
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest("e f g h".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got === want)
  }

  test("tokenization trims and collapses whitespace before chunking") {
    val got = Chunking.slidingChunks(docs, "doc_id", "text",
        chunkSize = 8, stride = 8)
      .where($"doc_id" === 4L)
      .select("chunk_tokens").as[Int].head()
    assert(got === 2) // "padded whitespace"
  }

  test("map-side only: no exchange in the physical plan") {
    val plan = Chunking.slidingChunks(docs, "doc_id", "text",
        chunkSize = 4, stride = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("invalid parameters are rejected") {
    intercept[IllegalArgumentException] {
      Chunking.slidingChunks(docs, "doc_id", "text", 0, 1)
    }
    intercept[IllegalArgumentException] {
      Chunking.slidingChunks(docs, "doc_id", "text", 4, 5)
    }
    intercept[IllegalArgumentException] {
      Chunking.contentDefinedChunks(docs, "doc_id", "text", 1)
    }
  }

  test("CDC chunks tile the document; expected length ~ divisor") {
    val words = (0 until 2000).map(i => s"w${i % 331}").mkString(" ")
    val chunks = Chunking.contentDefinedChunks(
        Seq((1L, words)).toDF("doc_id", "text"), "doc_id", "text",
        divisor = 16)
      .orderBy("chunk_id")
      .select("chunk_id", "start_tok", "chunk_tokens")
      .as[(Int, Int, Int)].collect().toSeq
    // chunks tile [0, 2000) contiguously
    assert(chunks.head._2 === 0)
    chunks.sliding(2).foreach {
      case Seq((_, s1, n1), (_, s2, _)) => assert(s2 === s1 + n1)
      case _ =>
    }
    assert(chunks.map(_._3).sum === 2000)
    val mean = 2000.0 / chunks.length
    assert(mean > 8 && mean < 32, s"mean chunk len $mean vs divisor 16")
  }

  test("CDC boundaries are content-anchored: an insertion changes only " +
      "the chunks it touches, unlike fixed stride") {
    // non-periodic tokens: a repeating corpus would let fixed windows
    // realign by periodicity and mask the effect under test
    val rnd = new scala.util.Random(5)
    val base = (0 until 600).map(_ => s"t${rnd.nextInt(1000000)}")
      .mkString(" ")
    val edited = "inserted " + base
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    def hashes(id: Long, chunks: org.apache.spark.sql.DataFrame) =
      chunks.where($"doc_id" === id).select("chunk_hash")
        .as[String].collect().toSet
    val cdc = Chunking.contentDefinedChunks(df, "doc_id", "text", 16)
    val cdcShared = hashes(1L, cdc) intersect hashes(2L, cdc)
    val fixed = Chunking.slidingChunks(df, "doc_id", "text", 16, 16)
    val fixedShared = hashes(1L, fixed) intersect hashes(2L, fixed)
    // the front insertion shifts every fixed window, but only the
    // first CDC chunk
    assert(cdcShared.size >= hashes(1L, cdc).size - 2,
      s"CDC must preserve nearly all chunks: ${cdcShared.size}")
    assert(fixedShared.size < cdcShared.size,
      s"fixed-stride shared ${fixedShared.size} !< CDC ${cdcShared.size}")
  }
}
