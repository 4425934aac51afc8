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
  }
}
