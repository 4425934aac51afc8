package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class ExportSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private lazy val corpus = spark.range(1000).select(
    col("id"), ((col("id") * 13) % 90 + 10).as("n_tok"))

  test("shards are balanced to ±1 row and partition the corpus") {
    val out = Files.createTempDirectory("graft_export").toString
    val manifest = Export.exportShards(spark, corpus, "id", out,
        shards = 7, seed = "s1")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(manifest.map(_._1).sorted === (0 until 7))
    val sizes = manifest.map(_._2)
    assert(sizes.sum === 1000L)
    assert(sizes.max - sizes.min <= 1, s"unbalanced: $sizes")
    // shard ranges are contiguous in shuffle order: [first,last] spans
    // tile the 1..N position range without overlap
    val spans = manifest.sortBy(_._3).map(t => (t._3, t._4))
    assert(spans.head._1 === 1L && spans.last._2 === 1000L)
    spans.sliding(2).foreach { case Seq((_, aLast), (bFirst, _)) =>
      assert(bFirst === aLast + 1)
    case _ => }
    // membership is re-readable from the written layout
    val rows = spark.read.parquet(out).count()
    assert(rows === 1000L)
  }

  test("export is deterministic: same seed reproduces shard membership") {
    val outA = Files.createTempDirectory("graft_export").toString
    val outB = Files.createTempDirectory("graft_export").toString
    Export.exportShards(spark, corpus, "id", outA, 4, seed = "z").collect()
    Export.exportShards(spark, corpus, "id", outB, 4, seed = "z").collect()
    val a = spark.read.parquet(outA).select("id", "shard")
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    val b = spark.read.parquet(outB).select("id", "shard")
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("token manifest sums the token column per shard") {
    val out = Files.createTempDirectory("graft_export").toString
    val manifest = Export.exportShards(spark, corpus, "id", out,
        shards = 3, seed = "t", tokenCol = Some("n_tok"))
    assert(manifest.columns.contains("n_tokens"))
    val total = manifest.agg(sum("n_tokens")).as[Long].head()
    val want = corpus.agg(sum("n_tok")).as[Long].head()
    assert(total === want)
  }

  test("packed export carries block ids; blocks are contiguous in order") {
    val out = Files.createTempDirectory("graft_export").toString
    val manifest = Export.exportPacked(spark, corpus, "id", "n_tok",
        out, shards = 4, budget = 2048, seed = "p")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(manifest.map(_._2).sum === 1000L)
    val written = spark.read.parquet(out)
    assert(written.columns.toSet.contains("block_id") &&
      written.columns.toSet.contains("tokens_before"))
    // block boundaries follow the global prefix sum: every row's block
    // is floor(tokens_before / budget)
    val bad = written
      .where(col("block_id") =!= floor(col("tokens_before") / 2048))
      .count()
    assert(bad === 0L)
  }

  test("input with a reserved column name fails loudly, not silently") {
    val out = Files.createTempDirectory("graft_export").toString
    val poisoned = corpus.withColumn("shard", lit(99))
    val e = intercept[IllegalArgumentException] {
      Export.exportShards(spark, poisoned, "id", out, shards = 3)
    }
    assert(e.getMessage.contains("shard"))
    val packedPoison = corpus.withColumn("block_id", lit(0))
    val e2 = intercept[IllegalArgumentException] {
      Export.exportPacked(spark, packedPoison, "id", "n_tok", out,
        shards = 3, budget = 1024)
    }
    assert(e2.getMessage.contains("block_id"))
  }

  test("jsonl export: same shard membership as parquet, .json files") {
    val outP = Files.createTempDirectory("graft_export_p").toString
    val outJ = Files.createTempDirectory("graft_export_j").toString
    Export.exportShards(spark, corpus, "id", outP, shards = 4, seed = "s2")
    val mj = Export.exportShards(spark, corpus, "id", outJ, shards = 4,
      seed = "s2", format = "jsonl")
    assert(mj.as[(Int, Long, Long, Long)].collect().map(_._2).sum == 1000L)
    // identical deterministic membership across formats
    val p = spark.read.parquet(outP).select("id", "shard")
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("shard").intValue).toMap
    val j = spark.read.json(outJ).select("id", "shard")
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("shard").intValue).toMap
    assert(p == j)
    // the layout really is JSON-Lines under shard=N dirs
    def rec(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(rec) else Seq(f)
    val files = rec(new java.io.File(outJ))
      .filter(_.getName.endsWith(".json"))
    assert(files.nonEmpty && files.forall(_.getPath.contains("shard=")))
    val firstLine = scala.io.Source.fromFile(files.head).getLines().next()
    assert(firstLine.startsWith("{") && firstLine.contains("\"id\""))
    // unknown format fails loudly
    val e3 = intercept[IllegalArgumentException] {
      Export.exportShards(spark, corpus, "id", outJ, 2, format = "orcish")
    }
    assert(e3.getMessage.contains("unknown format"))
  }
}
