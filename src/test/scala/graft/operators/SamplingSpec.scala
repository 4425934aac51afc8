package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class SamplingSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private lazy val ids = spark.range(20000).toDF("id")

  test("uniform keeps ~fraction, deterministically under repartition") {
    val a = Sampling.uniform(ids, "id", 0.25)
    val n = a.count()
    assert(math.abs(n - 5000.0) / 5000.0 < 0.05, s"got $n of ~5000")
    val b = Sampling.uniform(ids.repartition(7), "id", 0.25)
    assert(b.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      a.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("nested fractions: the 10% sample is a subset of the 25% sample") {
    val small = Sampling.uniform(ids, "id", 0.1)
      .select("id").collect().map(_.getLong(0)).toSet
    val big = Sampling.uniform(ids, "id", 0.25)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("stratified applies per-stratum rates") {
    val df = ids.withColumn("s",
      when(col("id") % 2 === 0, "a").otherwise("b"))
    val out = Sampling.stratified(df, "id", "s", Map("a" -> 0.5, "b" -> 0.1))
    val counts = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("a") - 5000.0) / 5000.0 < 0.07)
    assert(math.abs(counts("b") - 1000.0) / 1000.0 < 0.15)
  }

  test("withShard balances and stays stable as the corpus grows") {
    val a = Sampling.withShard(ids, "id", 8)
    val counts = a.groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 until 8).toSet)
    assert(counts.values.forall(c => math.abs(c - 2500.0) / 2500.0 < 0.1))
    // growth: the first 10k ids keep their shard when 10k more arrive
    val before = Sampling.withShard(ids.where(col("id") < 10000), "id", 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val after = a.where(col("id") < 10000)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(before == after)
  }

  test("shuffled is a deterministic permutation, seed changes the order") {
    val out = Sampling.shuffled(ids, "id", seed = "7", numPartitions = 8)
    val pos = out.select("shuffle_pos").as[Long].collect().sorted
    // exact permutation: positions are 1..n with no gaps or repeats
    assert(pos.toSeq == (1L to 20000L))
    // not the identity order (vanishingly unlikely for a hash order)
    val first = out.where(col("shuffle_pos") === 1)
      .select("id").as[Long].head()
    assert(first != 0L || out.where(col("shuffle_pos") === 2)
      .select("id").as[Long].head() != 1L)
    // deterministic: same seed reproduces identical positions even
    // under different input partitioning
    val again = Sampling.shuffled(ids.repartition(5), "id", seed = "7",
        numPartitions = 8)
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    val ref = out.select("id", "shuffle_pos").as[(Long, Long)]
      .collect().toMap
    assert(again == ref)
    // a different seed yields a different permutation
    val other = Sampling.shuffled(ids, "id", seed = "8", numPartitions = 8)
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(other != ref)
  }

  test("temperatureMixture caps small-source rates and hits ~budget") {
    // 100 docs in 'small', 9900 in 'big': α=0.5 weights 10 vs ~99.5,
    // budget 2000 → small rate = min(1, 2000·0.0913/100) > 1 capped,
    // big rate = 2000·0.9087/9900 ≈ 0.18
    val df = spark.range(10000).select(col("id"),
      when(col("id") < 100, lit("small")).otherwise(lit("big")).as("src"))
    val got = Sampling.temperatureMixture(df, "id", "src",
      alpha = 0.5, budget = 2000)
    val bySrc = got.groupBy("src").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc("small") === 100L, "capped rate must keep all small-src rows")
    val big = bySrc("big")
    val expected = (2000.0 * (math.sqrt(9900.0) /
      (math.sqrt(100.0) + math.sqrt(9900.0))))
    assert(math.abs(big - expected) / expected < 0.1,
      s"big-src sample $big vs ~$expected")
  }

  test("temperatureMixture is deterministic under repartitioning and " +
      "broadcasts the rate table") {
    val df = spark.range(5000).select(col("id"),
      concat(lit("s"), (col("id") % 7).cast("string")).as("src"))
    val a = Sampling.temperatureMixture(df, "id", "src", 0.3, 1000)
    val b = Sampling.temperatureMixture(df.repartition(13), "id", "src",
      0.3, 1000)
    assert(a.select("id").as[Long].collect().sorted.toSeq ===
      b.select("id").as[Long].collect().sorted.toSeq)
    val plan = a.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rate table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("temperatureMixture alpha=1 reduces to uniform corpus sampling") {
    // natural-frequency mixing: every source's rate = budget/N
    val df = spark.range(4000).select(col("id"),
      (col("id") % 4).cast("string").as("src"))
    val got = Sampling.temperatureMixture(df, "id", "src", 1.0, 1000)
      .select("id").as[Long].collect().toSet
    val want = Sampling.uniform(df, "id", 0.25)
      .select("id").as[Long].collect().toSet
    assert(got === want)
  }

  test("weightedSample favors heavy rows, exact k, deterministic") {
    // two weight classes: w=100 vs w=1. A-ES with k=100 of 2000 rows
    // must select overwhelmingly from the heavy class.
    val df = ids.limit(2000)
      .withColumn("w", when(col("id") < 200, 100.0).otherwise(1.0))
    val got = Sampling.weightedSample(df, "id", "w", k = 100)
    assert(got.count() == 100)
    val heavy = got.where(col("id") < 200).count()
    assert(heavy > 80, s"only $heavy of 100 from the heavy class")
    // deterministic under repartition
    val again = Sampling.weightedSample(df.repartition(13), "id", "w", 100)
    assert(got.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // zero/null weights never qualify
    val z = df.withColumn("w",
      when(col("id") < 1000, lit(null).cast("double")).otherwise(lit(0.0)))
    assert(Sampling.weightedSample(z, "id", "w", 10).count() == 0)
  }

  test("weightedSample per-stratum takes exactly k from each group") {
    val df = ids.limit(300)
      .withColumn("g", (col("id") % 3).cast("string"))
      .withColumn("w", col("id").cast("double") + 1.0)
    val got = Sampling.weightedSample(df, "id", "w", k = 7,
      strataCol = Some("g"))
    val byG = got.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("0" -> 7L, "1" -> 7L, "2" -> 7L))
  }

  test("withSplit partitions every row exactly once") {
    val out = Sampling.withSplit(ids, "id", 0.25)
    assert(out.count() == 20000)
    val evalN = out.where(col("is_eval")).count()
    assert(math.abs(evalN - 5000.0) / 5000.0 < 0.07)
  }

  test("groupCap keeps at most n best rows per group, ranked") {
    val df = ids.limit(100)
      .withColumn("g", (col("id") % 4).cast("string"))
      .withColumn("score", col("id").cast("double"))
    val got = Sampling.groupCap(df, Seq("g"),
      Seq(col("score").desc, col("id")), n = 5)
    val byG = got.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG.values.forall(_ == 5L), s"cap violated: $byG")
    // the kept rows are the HIGHEST scores of each group, rank 1..5
    val g0 = got.where(col("g") === "0")
      .select("id", "cap_rank").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(g0 == Map(96L -> 1, 92L -> 2, 88L -> 3, 84L -> 4, 80L -> 5))
    // plan: the rank filter compiles to WindowGroupLimit, so per-task
    // state is n-bounded before the shuffle
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("epochMix: integer weights replicate exactly, fractions " +
    "approximate, copies indexed and deterministic") {
    val df = ids.limit(4000)
      .withColumn("w", when(col("id") % 2 === 0, 2.0).otherwise(0.75))
    val got = Sampling.epochMix(df, "id", "w")
    // every even id appears exactly twice, with copies 1 and 2
    val even = got.where(col("id") % 2 === 0)
    assert(even.count() == 4000)
    assert(even.groupBy("id").count().where(col("count") =!= 2)
      .count() == 0)
    assert(even.select("epoch_copy").distinct().collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    // odd ids (w = 0.75): each 0 or 1 copies, ~75% overall
    val odd = got.where(col("id") % 2 === 1)
    val oddN = odd.count()
    assert(math.abs(oddN - 1500.0) / 1500.0 < 0.07, s"got $oddN of ~1500")
    assert(odd.groupBy("id").count().where(col("count") =!= 1)
      .count() == 0)
    // deterministic under repartition: identical realized multiset
    val again = Sampling.epochMix(df.repartition(11), "id", "w")
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = got.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == first)
  }

  test("budgetSelect: prefix cut in key order, inclusive boundary, " +
    "stable under repartition") {
    val df = Seq((1L, 5), (2L, 4), (3L, 3), (4L, 2), (5L, 1))
      .toDF("id", "toks")
    // id order → cum 5, 9, 12, 14, 15; budget 12 keeps exactly 1..3
    val got = Sampling.budgetSelect(df, Seq(col("id")), "toks", 12L)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cum_tokens"))
      .toMap
    assert(got == Map(1L -> 5L, 2L -> 9L, 3L -> 12L))
    // budget below the first row's cost keeps nothing (prefix cut, not
    // best-fit skip)
    assert(Sampling.budgetSelect(df, Seq(col("id")), "toks", 4L)
      .count() == 0)
    // a different key order changes the prefix: value-ascending order
    // (toks asc = id desc here) packs the small docs first
    val rev = Sampling.budgetSelect(df.repartition(7),
        Seq(col("toks"), col("id")), "toks", 6L)
      .collect().map(_.getLong(0)).toSet
    assert(rev == Set(5L, 4L, 3L))
  }
}
