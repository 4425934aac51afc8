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

  /** External cluster evaluation: pair-counting Adjusted Rand Index
    * (Hubert & Arabie 1985) and purity of the k-means assignment
    * against a ground-truth `labelCol` — the "did the clustering find
    * the real structure" gate a curation pipeline runs before trusting
    * cluster-balanced sampling or SemDeDup cells.
    *
    * Scale shape: ONE map-side-combined `groupBy(cell, label).count()`
    * over the assigned corpus; everything after operates on the k×L
    * contingency table — model-sized by construction (k cells × label
    * vocabulary), folded on the driver like every centroid exchange in
    * this file. All pair counts are exact integers; ARI reduces to one
    * double division of doubled pair counts,
    * `2(cp2·t2 − ap2·bp2) / (t2(ap2+bp2) − 2·ap2·bp2)`, with products
    * taken in double (the integer products can exceed Long at
    * 100 TB cardinalities) — the oracle writes the identical operand
    * tree, so the 4dp round is engine-stable.
    *
    * @return one row: (n_points, n_cells, purity, ari)
    */
  def clusterEval(
      df: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int, iters: Int, scale: Int = 100): DataFrame = {
    val cont = assign(df, idCol, vecCol, k, iters, scale)
      .join(df.select(col(idCol), col(labelCol)), Seq(idCol))
      .groupBy("cell", labelCol).agg(count(lit(1)).as("nij"))
      .collect().map(r => (r.getInt(0), r.get(1), r.getLong(2))).toSeq
    val byCell = cont.groupBy(_._1).values.map(_.map(_._3)).toSeq
    val byLabel = cont.groupBy(_._2).values.map(_.map(_._3)).toSeq
    val n = cont.map(_._3).sum
    // Pair counts in Double from the first multiply: n(n-1) and the
    // marginal sums-of-products exceed Long past ~3e9 points, and a
    // silent Long overflow here would corrupt ARI at exactly the
    // cardinalities this operator claims to serve.
    val t2 = n.toDouble * (n - 1).toDouble
    val cp2 = cont.map(x => x._3.toDouble * (x._3 - 1).toDouble).sum
    val ap2 = byCell.map { v => val s = v.sum; s.toDouble * (s - 1).toDouble }.sum
    val bp2 = byLabel.map { v => val s = v.sum; s.toDouble * (s - 1).toDouble }.sum
    val purity = byCell.map(_.max).sum.toDouble / n.toDouble
    val ari = 2.0 * (cp2 * t2 - ap2 * bp2) /
      (t2 * (ap2 + bp2) - 2.0 * ap2 * bp2)
    df.sparkSession.range(1).select(
      lit(n).as("n_points"), lit(byCell.size).as("n_cells"),
      round(lit(purity), 4).as("purity"), round(lit(ari), 4).as("ari"))
  }

  /** Simplified (centroid-based) silhouette: per-point width
    * `sil = (b − a) / max(a, b)` with a = distance to the own
    * (nearest) centroid and b = distance to the second-nearest — the
    * published large-scale surrogate for the classic silhouette
    * (O(n·k) map-side arithmetic instead of O(n²) pairwise), the
    * standard "is k right / are cells tight" diagnostic before
    * trusting cluster-balanced sampling or SemDeDup cells.
    *
    * Exactness: distances share [[assignDist]]'s quantized operand
    * tree (`sqrt(greatest(|v|² + score, 0)) / scale` per centroid);
    * a and b are 4dp-rounded BEFORE the ratio and the ratio rounded
    * after, so the oracle reproduces the chain operand-for-operand.
    * Scale shape: after training, one map-side pass — the k-struct
    * score array sorts per row, no join, no shuffle.
    *
    * @return (idCol, cell, dist_own, dist_next, sil) per point
    */
  def silhouette(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, scale: Int = 100): DataFrame = {
    require(k >= 2, s"silhouette: need k >= 2 cells, got $k")
    val q = df.select(col(idCol).as("__id"),
      quantize(col(vecCol), scale).as("__qv"))
      .localCheckpoint()
    val cents = trainCents(q, k, iters)
    // Lloyd updates can collapse cells on duplicate-heavy input; with a
    // single surviving centroid dist_next would be null and the result
    // silently diverges from the oracle's rn=2 join. Fail loudly instead.
    require(cents.size >= 2,
      s"silhouette: only ${cents.size} centroid(s) survived training " +
        s"(k=$k); need >= 2 for a second-nearest distance")
    val scored = array_sort(transform(centLiteral(cents), c => struct(
      (c.getField("ss") / (c.getField("n") * c.getField("n")).cast("double")
        - lit(2.0) * dotL(col("__qv"), c.getField("s")).cast("double")
          / c.getField("n").cast("double")).as("score"),
      c.getField("cell").as("cell"))))
    val vv = dotL(col("__qv"), col("__qv")).cast("double")
    def dist(slot: Int) = round(
      sqrt(greatest(vv + element_at(col("__sc"), slot).getField("score"),
        lit(0.0))) / scale.toDouble, 4)
    q.withColumn("__sc", scored)
      .select(col("__id").as(idCol),
        element_at(col("__sc"), 1).getField("cell").as("cell"),
        dist(1).as("dist_own"), dist(2).as("dist_next"))
      .withColumn("sil", round(
        when(greatest(col("dist_own"), col("dist_next")) === 0.0, lit(0.0))
          .otherwise((col("dist_next") - col("dist_own"))
            / greatest(col("dist_own"), col("dist_next"))), 4))
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
    val cents = trainCents(q, k, iters)
    q.withColumn("__best", bestCell(centLiteral(cents), col("__qv")))
      .select(col("__id").as(idCol),
        col("__best").getField("cell").as("cell"),
        col("__best").getField("score").as("__score"), col("__qv"))
  }

  /** Lloyd training on the quantized projection `q` (__id, __qv):
    * md5-ordered init + (iters − 1) centroid updates; the caller runs
    * the final assignment pass against the returned centroids. Each
    * update is one per-(cell, pos) aggregate — k·dim result rows,
    * metadata-sized, like the init sample.
    */
  private def trainCents(q: DataFrame, k: Int, iters: Int): Seq[Cent] = {
    var cents: Seq[Cent] = q
      .orderBy(md5(col("__id").cast("string")), col("__id"))
      .limit(k).collect().zipWithIndex
      .map { case (r, i) => Cent(i, r.getSeq[Long](1), 1L) }.toSeq
    for (_ <- 1 until iters) {
      val assigned = q
        .withColumn("__best", bestCell(centLiteral(cents), col("__qv")))
        .withColumn("__cell", col("__best").getField("cell"))
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
    cents
  }
}
