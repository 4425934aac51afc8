package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregates for sketch-based dedup, written as public-API
  * `Aggregator`s (partial-aggregate capable: Spark computes per-partition
  * buffers map-side and merges — the property that makes these linear
  * at 100 TB, one pass + one small shuffle of fixed-size buffers).
  */
object Aggregators {

  /** splitmix64 finalizer — cheap avalanche used to derive the i-th hash
    * function from one base hash (standard MinHash trick: h_i(x) =
    * mix(base(x) ^ seed_i) instead of hashing the shingle k times).
    */
  @inline final def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d493fddb7cce25L
    z ^ (z >>> 31)
  }

  private[graft] val seeds: Array[Long] = {
    var s = 0x5851f42d4c957f2dL
    Array.fill(256) { s = mix64(s); s }
  }

  private val longArrayEnc: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  private val intArrayEnc: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  private val longSeqEnc: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()

  /** MinHash signature over a stream of shingle hashes.
    * IN = base shingle hash (e.g. xxhash64 of the shingle string);
    * OUT = Seq[Long] of `n` per-hash-function minima.
    */
  class MinHash(n: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(n > 0 && n <= seeds.length,
      s"numHashes must be in [1, ${seeds.length}], got $n")
    def zero: Array[Long] = Array.fill(n)(Long.MaxValue)
    def reduce(b: Array[Long], a: Long): Array[Long] = {
      var i = 0
      while (i < n) {
        val h = mix64(a ^ seeds(i))
        if (h < b(i)) b(i) = h
        i += 1
      }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < n) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    def outputEncoder: Encoder[Seq[Long]] = longSeqEnc
  }

  /** SimHash: 64-bit signature from token hashes — each token votes ±1
    * per bit; the sign of each counter becomes the bit. Near-duplicate
    * docs differ in few bits (small Hamming distance).
    */
  class SimHash extends Aggregator[Long, Array[Int], Long] {
    def zero: Array[Int] = new Array[Int](64)
    def reduce(b: Array[Int], a: Long): Array[Int] = {
      val h = mix64(a)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) b(i) += 1 else b(i) -= 1
        i += 1
      }
      b
    }
    def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Int]): Long = {
      var sig = 0L
      var i = 0
      while (i < 64) { if (b(i) > 0) sig |= (1L << i); i += 1 }
      sig
    }
    def bufferEncoder: Encoder[Array[Int]] = intArrayEnc
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  private val mapEnc: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  private val strSeqEnc: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()

  /** Misra–Gries heavy-hitters sketch over a term stream. Buffer holds
    * ≤ `m` (term, residual-count) entries; the classic decrement step
    * on overflow, and the mergeable-summaries merge (combine, then
    * subtract the (m+1)-th largest residual and drop ≤0) for the
    * partial-aggregate path — so the map-side buffers are fixed-size
    * and the shuffle carries ≤ m·partitions entries no matter how many
    * distinct terms the corpus has.
    *
    * Guarantee (Misra–Gries / Agarwal et al. mergeable summaries):
    * every term with true frequency > N/(m+1) survives to the output.
    * The sketch CONTENT is order-dependent (different partitionings
    * yield different residuals) — callers must treat the output as a
    * candidate superset and verify with exact counts, which is exactly
    * what [[graft.operators.HeavyHitters.topK]] does.
    */
  class MisraGries(m: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    require(m > 0, s"capacity must be positive, got $m")
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      b.get(a) match {
        case Some(c) => b.updated(a, c + 1)
        case None if b.size < m => b.updated(a, 1L)
        // decrement-all: amortized O(1) per input — each overflow
        // retires m+1 count units, so ≤ N/(m+1) overflows total
        case None =>
          b.flatMap { case (t, c) =>
            if (c > 1) Some(t -> (c - 1)) else None
          }
      }
    def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val combined = y.foldLeft(x) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (combined.size <= m) combined
      else {
        // subtract the (m+1)-th largest residual: ≤ m entries can be
        // strictly greater, so the trimmed buffer fits by construction
        val cut = combined.valuesIterator.toArray
          .sorted(Ordering[Long].reverse).apply(m)
        combined.flatMap { case (t, c) =>
          if (c > cut) Some(t -> (c - cut)) else None
        }
      }
    }
    def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted
    def bufferEncoder: Encoder[Map[String, Long]] = mapEnc
    def outputEncoder: Encoder[Seq[String]] = strSeqEnc
  }

  /** misraGries(m) as a Column-usable aggregate over term strings. */
  def misraGries(m: Int): Column => Column = {
    val f = udaf(new MisraGries(m), Encoders.STRING)
    (c: Column) => f(c)
  }

  /** minhash(n) as a Column-usable aggregate over shingle-hash longs. */
  def minhash(n: Int): Column => Column = {
    val f = udaf(new MinHash(n), Encoders.scalaLong)
    (c: Column) => f(c)
  }

  /** simhash as a Column-usable aggregate over token-hash longs. */
  def simhash: Column => Column = {
    val f = udaf(new SimHash, Encoders.scalaLong)
    (c: Column) => f(c)
  }
}
