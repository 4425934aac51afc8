package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's algorithm) over an embedding column —
  * the clustering primitive under corpus curation ops (SemDeDup-style
  * semantic dedup, cluster-balanced sampling, coverage audits).
  * Beyond-reference.
  *
  * Scale shape (the classic Spark k-means decomposition):
  *  - centroids are metadata-sized (k × dim) and live on the driver
  *    between iterations, shipped into the plan as a literal array —
  *    assignment is a PURE MAP (codegen'd argmin over k dot products),
  *    no shuffle of the vector side, no UDF;
  *  - each iteration's new centroids come from ONE map-side-combined
  *    aggregate: explode (cell, pos, x) and sum per (cell, pos) —
  *    k·dim result rows, collected to the driver;
  *  - iterations are a fixed count (`iters`), not convergence-looped:
  *    the caller picks the budget, every iteration costs exactly one
  *    pass.
  *
  * ==Determinism (what makes a float-iterative algorithm oracle-exact)==
  * Vectors are quantized to integers (`round(x·scale)`) and centroids
  * kept as RATIONALS (integer sum vector + count), never divided into
  * float means. With `scale`=100 and corpus sizes up to ~1e6 rows,
  * every dot product and squared-sum is an exact integer below 2^53:
  * the doubles that carry them round nothing, so the assignment argmin
  * compares bit-identical values in ANY evaluation order and any
  * engine. The only inexact ops are the two final divisions in the
  * comparison score `ss/n² − 2·vs/n` — identical IEEE operands and
  * operator tree, hence identical results everywhere. Ties break
  * toward the smaller cell id. Init is the k smallest md5(id) — the
  * same deterministic sampling device as [[Sampling]] (md5, not
  * xxhash64, so any SQL engine replays it).
  *
  * At 100 TB one would relax exactness (float centroids, kmeans‖
  * init) — the quantized-rational form costs nothing extra but keeps
  * the operator byte-reproducible, which production dedup pipelines
  * want anyway (re-running a curation job must tag the same clusters).
  *
  * Empty cells (possible once centroids drift) simply vanish: they
  * produce no aggregate row and no next-round centroid — documented,
  * replayed identically by the oracle.
  *
  * @param scale quantization: v_int = round(v · scale)
  * @return (idCol, cell) — final assignment after `iters` rounds
  */
object KMeans {

  /** Dot product of two long-array columns via the codegen'd
    * [[graft.functions.VectorFns]] expression — double accumulation,
    * which in the exact range (scaladoc above) is bit-identical to
    * long arithmetic AND is precisely what the SQL oracle's
    * `list_inner_product` computes, so Spark and oracle stay agreed
    * even outside the exact range (both round the same way, where
    * long math would silently wrap).
    */
  private def dotL(a: Column, b: Column): Column =
    graft.functions.VectorFns.dotCol(
      org.apache.spark.sql.SparkSession.active, a, b)

  private[operators] def quantize(vec: Column, scale: Int): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("long"))

  /** Argmin (score, cell) struct for quantized vector `qv` against
    * literal centroids (cell, s, n, ss): minimize ss/n² − 2·vs/n,
    * ties to smaller cell.
    */
  private def bestCell(
      centArr: Column, qv: Column): Column = {
    val scored = transform(centArr, c => struct(
      (c.getField("ss") / (c.getField("n") * c.getField("n")).cast("double")
        - lit(2.0) * dotL(qv, c.getField("s")).cast("double")
          / c.getField("n").cast("double")).as("score"),
      c.getField("cell").as("cell")))
    element_at(array_sort(scored), 1)
  }

  private final case class Cent(cell: Int, s: Seq[Long], n: Long) {
    def ss: Double = s.map(x => x.toDouble * x.toDouble).sum
  }

  private def centLiteral(cents: Seq[Cent]): Column =
    array(cents.sortBy(_.cell).map { c =>
      struct(lit(c.cell).as("cell"),
        array(c.s.map(lit): _*).as("s"),
        lit(c.n).as("n"), lit(c.ss).as("ss"))
    }: _*)

  def assign(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, scale: Int = 100): DataFrame =
    run(df, idCol, vecCol, k, iters, scale)
      .select(col(idCol), col("cell"))

  /** Assignment plus distance-to-centroid — the out-of-distribution
    * score (far from every centroid = outlier: mislabeled scrape,
    * encoding garbage, off-domain content — the SemDeDup paper's
    * complementary use of the same clustering). `dist` is the
    * Euclidean distance to the assigned (nearest) centroid in
    * original vector units.
    *
    * Exactness: the argmin score omits the per-row |v|² term (it
    * cannot change the argmin); adding it back gives the true squared
    * distance in quantized units: |v|² + ss/n² − 2·vs/n. |v|² is an
    * exact integer dot; the additions/sqrt/divide are the same IEEE
    * operand tree the SQL oracle writes, so the 4dp round is
    * engine-stable (same contract as the assignment itself).
    */
  def assignDist(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, scale: Int = 100): DataFrame =
    run(df, idCol, vecCol, k, iters, scale)
      .select(col(idCol), col("cell"),
        round(sqrt(greatest(
          dotL(col("__qv"), col("__qv")).cast("double") + col("__score"),
          lit(0.0))) / scale.toDouble, 4).as("dist"))

  /** Cluster-balanced sample: at most `perCell` rows from each
    * k-means cell, keeping md5(id) order — the coverage-preserving
    * subsample (SemDeDup/DCLM practice: cap dense clusters instead of
    * uniform sampling, which would keep boilerplate-heavy modes
    * over-represented and starve rare ones). Deterministic: any
    * engine reproduces the draw from ids alone (the [[Sampling]]
    * auditability contract).
    *
    * Scale shape: the per-cell rank filter compiles to
    * WindowGroupLimit (per-mapper partial top-k below the shuffle —
    * same plan pin as Sampling.weightedSample); cells number k, but
    * the partial top-k means no task ever holds a cell.
    *
    * @return (idCol, cell) — the kept rows
    */
  def clusterSample(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, perCell: Int, scale: Int = 100): DataFrame = {
    require(perCell >= 1, s"clusterSample: perCell must be >= 1, got $perCell")
    val assigned = assign(df, idCol, vecCol, k, iters, scale)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cell")
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    assigned.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= perCell)
      .select(col(idCol), col("cell"))
  }

  /** Lloyd loop; returns (idCol, cell, __score, __qv) where __score =
    * ss/n² − 2·vs/n against the assigned centroid (quantized units,
    * |v|² omitted).
    */
  private def run(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, scale: Int): DataFrame = {
    require(k >= 1 && iters >= 1, s"kmeans: bad k=$k / iters=$iters")
    // localCheckpoint (eager): init, every iteration's aggregate, and
    // the caller's materialization all replay this projection — without
    // it the upstream pipeline (a parquet scan, or a whole
    // TextVectors.hashed shuffle) re-executes 2 + iters times (the r8
    // bench measured qt37 at 12.8 s for exactly that; 4.5 s after).
    // Caching the quantized training set is the standard k-means trade
    // (MLlib does the same); unlike persist() the checkpoint blocks are
    // reclaimed by the ContextCleaner once the result is dropped.
    val q = df.select(col(idCol).as("__id"),
      quantize(col(vecCol), scale).as("__qv"))
      .localCheckpoint()

    // init: the k smallest md5(id) vectors, cell = md5 order. k rows
    // collected — metadata-sized, like every centroid exchange below.
    var cents: Seq[Cent] = q
      .orderBy(md5(col("__id").cast("string")), col("__id"))
      .limit(k).collect().zipWithIndex
      .map { case (r, i) => Cent(i, r.getSeq[Long](1), 1L) }.toSeq

    var assigned: DataFrame = null
    for (i <- 1 to iters) {
      assigned = q.withColumn("__best", bestCell(centLiteral(cents), col("__qv")))
        .withColumn("__cell", col("__best").getField("cell"))
      if (i < iters) {
        // one aggregate: per-(cell, pos) sums + per-cell counts — k·dim
        // result rows, metadata-sized
        val sums = assigned
          .select(col("__cell"), posexplode(col("__qv")).as(Seq("__pos", "__x")))
          .groupBy("__cell", "__pos")
          .agg(sum("__x").as("__s"), count(lit(1)).as("__n"))
          .collect()
        cents = sums.groupBy(_.getInt(0)).map { case (cell, rows) =>
          val byPos = rows.sortBy(_.getInt(1))
          Cent(cell, byPos.map(_.getLong(2)).toSeq, byPos.head.getLong(3))
        }.toSeq
      }
    }
    assigned.select(col("__id").as(idCol), col("__cell").as("cell"),
      col("__best").getField("score").as("__score"), col("__qv"))
  }
}
