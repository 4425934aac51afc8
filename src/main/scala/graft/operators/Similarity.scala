package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Aggregators.mix64

/** Similarity search over embedding columns (Array[Float]).
  *
  * Two paths, as a 100 TB design requires:
  *  - [[bruteForceKnn]]: exact top-k for a SMALL broadcast query set
  *    against an arbitrarily large candidate set — the cost is
  *    |Q|·|C|·dim with |Q| small, embarrassingly parallel, no shuffle
  *    except the final per-query top-k (TakeOrdered-sized).
  *  - [[annLsh]]: random-hyperplane LSH (sign sketches) — candidates
  *    share a bucket in at least one of L tables; only bucket-colliding
  *    pairs get exact scoring. Hyperplanes are pseudo-random but fully
  *    deterministic (splitmix64 of (plane, dim)), so results are
  *    reproducible with no driver-side RNG state.
  *
  * All arithmetic runs in double via codegen'd higher-order functions
  * (zip_with/aggregate) — no UDF deserialization per row.
  */
object Similarity {

  /** Double-precision dot product of two float-array columns. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dotD(a, a))

  def cosine(a: Column, b: Column): Column = dotD(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors of each query vector.
    *
    * @param queries    (qid, qvec) — must be small (broadcast side)
    * @param candidates (cid, cvec) — arbitrarily large
    */
  def bruteForceKnn(
      queries: DataFrame, candidates: DataFrame, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val joined = candidates.crossJoin(broadcast(queries))
    val scored = joined
      .where(if (excludeSelf) col("qid") =!= col("cid") else lit(true))
      .select(col("qid"), col("cid"),
        round(cosine(col("qvec"), col("cvec")), 4).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic pseudo-random sign for hyperplane `p`, dimension `d`:
    * +x or -x depending on one avalanche bit. Column-level (codegen'd).
    */
  private def signedCoord(x: Column, p: Column, d: Column): Column = {
    // xxhash64(p * 1000003 + d) parity as the Rademacher variable
    val h = xxhash64(p * lit(1000003L) + d.cast("long"))
    when(h.bitwiseAND(lit(1L)) === 0L, x.cast("double"))
      .otherwise(-x.cast("double"))
  }

  /** LSH bucket ids for a vector: L tables × B sign-bits each. */
  def lshBuckets(vec: Column, tables: Int, bits: Int): Column = {
    val dims = sequence(lit(0), size(vec) - 1)
    val planeBit: Column => Column = p =>
      when(
        aggregate(
          zip_with(vec, dims, (x, d) => signedCoord(x, p, d)),
          lit(0.0), (acc, x) => acc + x) >= 0, lit(1L)).otherwise(lit(0L))
    // bucket_t = bits [t*B, (t+1)*B) packed into a long
    transform(sequence(lit(0), lit(tables - 1)), t =>
      aggregate(
        transform(sequence(lit(0), lit(bits - 1)), i => planeBit(t * bits + i)),
        lit(0L), (acc, bit) => acc * 2 + bit))
  }

  /** Approximate top-k neighbors: exact scoring restricted to candidates
    * sharing an LSH bucket with the query in any of `tables` tables.
    * Returns the same shape as [[bruteForceKnn]] (qid, cid, sim, rank);
    * recall vs brute force is measured in the test suite.
    */
  def annLsh(
      queries: DataFrame, candidates: DataFrame, k: Int,
      tables: Int = 8, bits: Int = 12): DataFrame = {
    val qb = queries.withColumn("bk", lshBuckets(col("qvec"), tables, bits))
      .select(col("qid"), col("qvec"), posexplode(col("bk")))
      .withColumnRenamed("pos", "t").withColumnRenamed("col", "bucket")
    val cb = candidates.withColumn("bk", lshBuckets(col("cvec"), tables, bits))
      .select(col("cid"), col("cvec"), posexplode(col("bk")))
      .withColumnRenamed("pos", "t").withColumnRenamed("col", "bucket")
    val cand = qb.join(cb, Seq("t", "bucket"))
      .where(col("qid") =!= col("cid"))
      .select("qid", "qvec", "cid", "cvec").distinct()
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    cand.select(col("qid"), col("cid"),
        round(cosine(col("qvec"), col("cvec")), 4).as("sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs over one set: all pairs with
    * cosine >= threshold, generated via LSH bucket collisions (no full
    * cross product). Returns (id_a, id_b, sim).
    */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, tables: Int = 8, bits: Int = 12): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bk", lshBuckets(col("vec"), tables, bits))
      .select(col("id"), col("vec"), posexplode(col("bk")))
      .withColumnRenamed("pos", "t").withColumnRenamed("col", "bucket")
    val a = v.select(col("t"), col("bucket"), col("id").as("id_a"), col("vec").as("va"))
    val b = v.select(col("t"), col("bucket"), col("id").as("id_b"), col("vec").as("vb"))
    a.join(b, Seq("t", "bucket")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("va"), col("vb")).distinct()
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 4).as("sim"))
      .where(col("sim") >= threshold)
  }
}
