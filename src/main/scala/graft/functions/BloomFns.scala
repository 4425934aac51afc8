package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{call_function, lit}

/** Bloom-filter surface over Spark's own runtime-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind `spark.sql.optimizer.runtime.bloomFilter.enabled`), exposed
  * as registered functions so operators can build and probe a filter
  * explicitly.
  *
  * Both sides stay fully distributed and codegen-friendly:
  * the aggregate builds the sketch with map-side partial merges (the
  * buffer is the bloom bitset, merged pairwise), and the probe is a
  * pure row-local bit test against a BINARY LITERAL — usable inside
  * higher-order lambdas, so a membership prefilter over an array
  * column runs with ZERO shuffle.
  *
  * The reference has no bloom surface; this backs the beyond-reference
  * decontamination prefilter (COVERAGE.md "training-data pipeline"
  * table). Values are hashed with xxhash64 on BOTH sides, matching the
  * contract the two Spark expressions share.
  */
object BloomFns {

  def register(spark: SparkSession): Unit =
    Registered.once(spark, "bloom") {
      val reg = spark.sessionState.functionRegistry
      // graft_bloom_agg(value, estItems, numBits) -> binary sketch
      reg.createOrReplaceTempFunction("graft_bloom_agg",
        es => new BloomFilterAggregate(
          new XxHash64(Seq(es(0))), es(1), es(2)),
        "built-in")
      // graft_bloom_contains(sketchBinary, value) -> boolean
      reg.createOrReplaceTempFunction("graft_bloom_contains",
        es => BloomFilterMightContain(es(0), new XxHash64(Seq(es(1)))),
        "built-in")
    }

  /** Aggregate a column into a bloom-filter sketch (binary). */
  def bloomAgg(spark: SparkSession, value: Column,
      expectedItems: Long, numBits: Long): Column = {
    register(spark)
    call_function("graft_bloom_agg", value,
      lit(expectedItems), lit(numBits))
  }

  /** Membership probe of `value` against a sketch column/literal. */
  def mightContain(spark: SparkSession, sketch: Column,
      value: Column): Column = {
    register(spark)
    call_function("graft_bloom_contains", sketch, value)
  }
}
