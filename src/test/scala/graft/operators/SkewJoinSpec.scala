package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Salted join output must be row-identical to the plain join. */
class SkewJoinSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // 10k rows of one hot key + a long tail, dimension of 50 keys
  private lazy val facts = spark.range(10000)
    .select(when(col("id") < 9000, 1L).otherwise(col("id") % 50).as("k"),
      col("id").as("payload"))
  private lazy val dim = spark.range(50)
    .select(col("id").as("dk"), concat(lit("name_"), col("id")).as("dname"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("payload").collect().toSeq

  test("inner salted join matches plain inner join") {
    val plain = facts.join(dim, facts("k") === dim("dk"))
      .select(facts("k"), facts("payload"), dim("dname"))
    val salted = SkewJoin.salted(facts, dim, "k", "dk",
      rightCols = Seq("dname"), factor = 8)
      .select("k", "payload", "dname")
    assert(canon(salted) === canon(plain))
  }

  test("left salted join keeps unmatched rows with null right side") {
    val smallDim = dim.where(col("dk") >= 10) // key 1 (the hot key) unmatched
    val plain = facts.join(smallDim, facts("k") === smallDim("dk"), "left")
      .select(facts("k"), facts("payload"), smallDim("dname"))
    val salted = SkewJoin.salted(facts, smallDim, "k", "dk",
      rightCols = Seq("dname"), factor = 8, joinType = "left")
      .select("k", "payload", "dname")
    assert(canon(salted) === canon(plain))
    // 9000 hot-key rows (k=1) + 200 tail rows with k<10 are unmatched
    assert(salted.where(col("dname").isNull).count() === 9200)
  }

  test("salt actually spreads the hot key across sub-keys") {
    val salts = facts.where(col("k") === 1)
      .withColumn("__salt", pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .select("__salt").distinct().count()
    assert(salts === 8)
  }
}
