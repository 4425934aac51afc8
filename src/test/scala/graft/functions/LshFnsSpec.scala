package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.operators.Similarity

/** Pins the codegen'd LSH expression bit-identical to the interpreted
  * column formulation it replaced — a silent divergence would shift
  * every bucket and quietly change ANN recall.
  */
class LshFnsSpec extends AnyFunSuite with SparkTest {

  test("codegen'd buckets == interpreted reference, float and double") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    for (cast <- Seq(false, true)) {
      val v = if (cast)
        e.select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("vec"))
      else e.select(col("vec_id"), col("embedding").as("vec"))
      val both = v.select(col("vec_id"),
        Similarity.lshBuckets(col("vec"), 8, 12).as("ref"),
        LshFns.lshBucketsCol(spark, col("vec"), 8, 12).as("fast"))
      val diff = both.where(not(col("ref") === col("fast"))).count()
      assert(diff === 0L, s"bucket divergence (double=$cast)")
    }
  }

  test("null vector yields null signature") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq(0.1f, -0.2f))), (2L, None))
      .toDF("id", "vec")
    val out = df.select(col("id"),
      LshFns.lshBucketsCol(spark, col("vec"), 4, 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L) === false)
    assert(out(2L) === true)
  }
}
