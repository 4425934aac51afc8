package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *    deterministic (xxhash64 of (plane, dim)), so results are
  *    reproducible with no driver-side RNG state.
  *
  * Scale guards (both LSH paths):
  *  - degenerate buckets are CAPPED (`maxBucket`): a boilerplate cluster
  *    of near-identical vectors would otherwise make the bucket
  *    self-join quadratic — the exact distribution near-dup detection
  *    targets;
  *  - the candidate-pair dedup shuffles ONLY `(id_a, id_b)`: vectors are
  *    re-attached by id with one narrow join per side AFTER the distinct,
  *    so repeated bucket collisions never re-shuffle vector payloads.
  *
  * All arithmetic runs in double via codegen'd higher-order functions
  * (zip_with/aggregate) — no UDF deserialization per row.
  */
object Similarity {

  /** Double-precision dot product of two float-array columns — the
    * codegen'd [[graft.functions.VectorFns]] expression (registered on
    * the thread's active session; every caller here runs inside one).
    * Bit-identical to the HOF formulation [[dotHof]], which VectorFnsSpec
    * pins; the expression form keeps |Q|·|C|-pair scoring inside
    * WholeStageCodegen instead of interpreted lambda calls per element.
    */
  def dotD(a: Column, b: Column): Column =
    graft.functions.VectorFns.dotCol(SparkSession.active, a, b)

  /** The original higher-order-function formulation, kept as the
    * bit-compatibility reference for the codegen'd expression.
    */
  private[operators] def dotHof(a: Column, b: Column): Column =
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
    // hoist the norms: computed once per ROW before the join, not per
    // PAIR after it (same expression, bit-identical sim — but one
    // higher-order aggregate per pair instead of three; HOFs evaluate
    // interpreted, so this is 3× the scoring cost at |Q|·|C| pairs)
    val q = queries.withColumn("__qn", norm(col("qvec")))
    val c = candidates.withColumn("__cn", norm(col("cvec")))
    val joined = c.crossJoin(broadcast(q))
    val scored = joined
      .where(if (excludeSelf) col("qid") =!= col("cid") else lit(true))
      .select(col("qid"), col("cid"),
        round(dotD(col("qvec"), col("cvec"))
          / (col("__qn") * col("__cn")), 4).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Two-stage truncated-dimension rerank (the Matryoshka-embedding
    * retrieval pattern, Kusupati et al. 2022): score ALL pairs on only
    * the first `prefixDim` components, keep the top `m` per query,
    * then rerank just those survivors with the exact full-dimension
    * cosine. Beyond-reference.
    *
    * Scale shape: the all-pairs stage touches `prefixDim/d` of the
    * vector bytes (at 100 TB the prefix lives as its own column /
    * truncated copy, so the scan is proportionally smaller), and its
    * per-pair cost shrinks by the same factor; full vectors are read
    * for only |Q|·m survivor rows via the rejoin. Both top-k filters
    * are `row_number <= n` over (score desc, id) — compiled to
    * WindowGroupLimit, i.e. per-mapper partial top-k before the
    * per-query shuffle, never a global sort. Deterministic end to end:
    * 4dp-rounded scores, id tiebreaks, so the survivor CUT itself is
    * reproducible by the oracle.
    *
    * @param queries    (qid, qvec) — small (broadcast side)
    * @param candidates (cid, cvec) — arbitrarily large
    * @param prefixDim  leading components scored in stage 1
    * @param m          survivors per query fed to the exact rerank
    */
  def truncatedRerank(
      queries: DataFrame, candidates: DataFrame, k: Int,
      prefixDim: Int, m: Int, excludeSelf: Boolean = true): DataFrame = {
    val qp = queries.select(col("qid"),
        slice(col("qvec"), 1, prefixDim).as("__qp"))
      .withColumn("__qpn", norm(col("__qp")))
    val cp = candidates.select(col("cid"),
        slice(col("cvec"), 1, prefixDim).as("__cp"))
      .withColumn("__cpn", norm(col("__cp")))
    val pre = cp.crossJoin(broadcast(qp))
      .where(if (excludeSelf) col("qid") =!= col("cid") else lit(true))
      .select(col("qid"), col("cid"),
        round(dotD(col("__qp"), col("__cp"))
          / (col("__qpn") * col("__cpn")), 4).as("psim"))
    val wp = Window.partitionBy("qid").orderBy(col("psim").desc, col("cid"))
    val survivors = pre.withColumn("__pr", row_number().over(wp))
      .where(col("__pr") <= m)
      .select("qid", "cid")
    // survivors are |Q|·m rows — AQE broadcasts them into the rejoin,
    // so the full-vector read is a semi-join-pruned scan, not a shuffle
    val q = queries.withColumn("__qn", norm(col("qvec")))
    val c = candidates.withColumn("__cn", norm(col("cvec")))
    val rer = survivors.join(c, "cid").join(broadcast(q), "qid")
      .select(col("qid"), col("cid"),
        round(dotD(col("qvec"), col("cvec"))
          / (col("__qn") * col("__cn")), 4).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    rer.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "cid", "sim", "rank")
  }

  /** Hard-negative mining for contrastive training — for each anchor,
    * the top-`k` most-similar candidates whose label DIFFERS from the
    * anchor's. This is the batch-mining step of embedding-model
    * training loops (triplet / InfoNCE): the negatives that matter are
    * the ones the current embedding already confuses with the anchor,
    * and those are exactly the wrong-label nearest neighbors.
    * Beyond-reference.
    *
    * Scale shape: identical to [[bruteForceKnn]] — anchors are the
    * small broadcast side, the corpus streams through map-side scoring,
    * and the label inequality filters BEFORE scoring so same-label
    * pairs are never scored. The per-anchor top-k is row_number over a
    * qid-partitioned window: WindowGroupLimit prunes to k per mapper
    * before the (anchor-count-sized) shuffle. At full corpus scale,
    * generate candidates with [[annLsh]]/[[annIvf]] and apply the same
    * wrong-label filter before rerank — composition, not new code.
    *
    * Determinism: 4dp-rounded sim, cid tiebreak — same oracle contract
    * as every retrieval operator here.
    *
    * @param anchors    (qid, qvec, qlabel) — small (broadcast side)
    * @param candidates (cid, cvec, clabel) — arbitrarily large
    * @return (qid, qlabel, cid, clabel, sim, rank), ≤`k` rows per qid
    */
  def hardNegatives(
      anchors: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = anchors.withColumn("__qn", norm(col("qvec")))
    val c = candidates.withColumn("__cn", norm(col("cvec")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("qid") =!= col("cid") &&
        !(col("clabel") <=> col("qlabel")))
      .select(col("qid"), col("qlabel"), col("cid"), col("clabel"),
        round(dotD(col("qvec"), col("cvec"))
          / (col("__qn") * col("__cn")), 4).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** kNN majority-vote label classification — propagate labels from a
    * curated seed set to unlabeled documents by embedding similarity
    * (the scalable stand-in for a trained quality/topic classifier:
    * label a small seed set by hand, classify the corpus by its
    * neighbors). Beyond-reference.
    *
    * Votes are integer counts over the exact top-k neighbor set, so
    * the operator is oracle-exact end-to-end: the neighbor set is
    * deterministic (4dp-rounded sim, id tiebreak — [[bruteForceKnn]]'s
    * contract) and the argmax breaks ties toward the smallest label.
    *
    * This brute-force form scores |Q|·|C| pairs — right when the
    * UNLABELED side is the small one (classifying a sample, auditing a
    * split). To classify an entire corpus against a large seed set,
    * generate the neighbor lists with an index probe instead
    * ([[probeIvfIndex]] over the seeds) and feed them to
    * [[majorityVote]] — the vote aggregation is candidate-source-
    * agnostic.
    *
    * @param queries    (qid, qvec) — rows to classify
    * @param candidates (cid, cvec, labelCol) — labeled seed set
    * @return (qid, pred_label, n_votes) — n_votes of the k neighbors
    *         carried the winning label
    */
  def knnClassify(
      queries: DataFrame, candidates: DataFrame, k: Int,
      labelCol: String = "label"): DataFrame = {
    val knn = bruteForceKnn(
      queries, candidates.select(col("cid"), col("cvec")), k)
    majorityVote(
      knn.join(candidates.select(col("cid"), col(labelCol)), Seq("cid")),
      labelCol)
  }

  /** Per-query majority label over `(qid, labelCol)` neighbor rows,
    * ties toward the smallest label. One map-side-combined aggregate +
    * a per-query argmax (k-bounded groups — never a hot partition).
    */
  def majorityVote(neighbors: DataFrame, labelCol: String): DataFrame = {
    val votes = neighbors.groupBy(col("qid"), col(labelCol))
      .agg(count(lit(1)).as("n_votes"))
    val w = Window.partitionBy("qid")
      .orderBy(col("n_votes").desc, col(labelCol).asc)
    votes.withColumn("__r", row_number().over(w)).where(col("__r") === 1)
      .select(col("qid"), col(labelCol).as("pred_label"), col("n_votes"))
  }

  /** Late-interaction retrieval (the ColBERT MaxSim operator,
    * Khattab & Zaharia 2020): queries and documents are BAGS of `m`
    * subvectors (token embeddings); a document's score is the sum over
    * query subvectors of its best-matching document subvector —
    * `Σ_j max_c cos(q_j, d_c)` — which preserves token-level matching
    * that single-vector cosine averages away. Beyond-reference.
    *
    * Here the bag is modeled as `m` contiguous `subDim` slices of one
    * vector column (the storage layout multi-vector systems actually
    * use: one fixed-width row per document, sliced at scan time).
    *
    * Scale shape: identical to [[bruteForceKnn]] — queries broadcast,
    * candidates stream through a codegen'd projection computing all
    * m×m subvector cosines map-side; the per-query top-k is a
    * WindowGroupLimit rank filter. m²·subDim multiplies per pair =
    * m× the single-vector cost, the price of late interaction; at
    * corpus scale the standard play is single-vector ANN for
    * candidates then MaxSim as the rerank — compose with
    * [[annIvf]]/[[probeIvfIndex]] exactly like [[truncatedRerank]].
    *
    * Determinism: `max` is order-invariant; each per-subvector maximum
    * is rounded to 4dp BEFORE the sum (the same rounding contract as
    * every retrieval operator here, applied at the only place engine
    * ulps could leak into an addition), and the sum over the m rounded
    * maxima is pinned to an explicit left-to-right chain (NOT a
    * reorderable aggregate) — identical inputs in identical order give
    * the identical double on any engine.
    *
    * @param queries    (qid, qvec) — small (broadcast side)
    * @param candidates (cid, cvec) — arbitrarily large
    * @param m          subvectors per row
    * @param subDim     dimensions per subvector
    */
  def maxSim(
      queries: DataFrame, candidates: DataFrame, k: Int,
      m: Int, subDim: Int, excludeSelf: Boolean = true): DataFrame = {
    def sub(v: Column, j: Int): Column = slice(v, j * subDim + 1, subDim)
    val joined = candidates.crossJoin(broadcast(queries))
      .where(if (excludeSelf) col("qid") =!= col("cid") else lit(true))
    val maxima = (0 until m).map { j =>
      round((0 until m).map { c =>
        cosine(sub(col("qvec"), j), sub(col("cvec"), c))
      }.reduce((a, b) => greatest(a, b)), 4)
    }
    // explicit left-to-right addition chain — deterministic FP order
    val score = maxima.reduceLeft(_ + _)
    val scored = joined.select(col("qid"), col("cid"),
      round(score, 4).as("maxsim"))
    val w = Window.partitionBy("qid").orderBy(col("maxsim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Retrieval-quality evaluation: recall@k of an approximate
    * retriever against exact ground truth. The standard ANN yardstick
    * (every FAISS/ScaNN paper reports it); running it INSIDE the engine
    * is what makes index tuning (nprobe, prefix dims, LSH tables) a
    * measured decision instead of a guess. Beyond-reference.
    *
    * Both inputs are (qid, cid) result sets, one row per returned
    * neighbor, ranks already cut to k. Per query:
    * `n_hit = |approx ∩ exact|`, `recall = n_hit / |exact|`.
    *
    * Scale shape: both sides are |Q|·k rows — metadata-sized relative
    * to the corpus that produced them, so the inner join and the
    * per-qid aggregate are trivially partitioned by qid with map-side
    * combine; the expensive work (the retrieval itself) already
    * happened upstream. A LEFT join from exact keeps queries the
    * approximate side missed entirely (n_hit = 0), so a total recall
    * miss cannot silently drop the row.
    *
    * @param exact  ground-truth neighbors (qid, cid), the denominator
    * @param approx approximate neighbors (qid, cid)
    * @return (qid, n_exact, n_hit, recall) — recall rounded to 4dp
    */
  def retrievalRecall(exact: DataFrame, approx: DataFrame): DataFrame = {
    val e = exact.select(col("qid"), col("cid"))
    val a = approx.select(col("qid"), col("cid"), lit(1).as("__hit"))
    e.join(a, Seq("qid", "cid"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("n_exact"),
        count(col("__hit")).as("n_hit"))
      .select(col("qid"), col("n_exact"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_exact"), 4).as("recall"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embeddings with [[KMeans]], score
    * pairwise cosine WITHIN each cluster only, and keep one
    * representative per near-duplicate group. Beyond-reference.
    *
    * Clustering is what makes semantic dedup subquadratic: candidate
    * pairs are confined to cells (expected |N|²/k work instead of
    * |N|²), the exact trade the paper makes. The plan shape follows
    * the LSH dedup path: cells → [[BucketCap.cappedPairs]] (bounded
    * per-bucket state, id-only pair shuffle) → vectors re-attached by
    * id for the exact cosine gate.
    *
    * Divergence from the paper, documented: the survivor of a
    * duplicate group is the SMALLEST id (deterministic, oracle-exact),
    * not the example farthest from the cluster centroid — a row is
    * dropped iff some smaller-id vector in its cell has cosine ≥ tau
    * with it. Like the paper, pairs straddling a cell boundary are
    * invisible (that is the approximation being bought).
    *
    * @return one row per input vector: (idCol, cell, keep)
    */
  def semDedup(
      df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int,
      tau: Double, maxBucket: Long = 1000): DataFrame = {
    val cells = KMeans.assign(df, idCol, vecCol, k, iters)
    val pairs = BucketCap.cappedPairs(
      cells.select(col("cell"), col(idCol)), maxBucket, idCol, "cell")
    val vecs = df.select(col(idCol).as("__vid"), col(vecCol).as("__vv"))
    val dropped = pairs
      .join(vecs.select(col("__vid").as("id_a"), col("__vv").as("__va")), Seq("id_a"))
      .join(vecs.select(col("__vid").as("id_b"), col("__vv").as("__vb")), Seq("id_b"))
      .where(round(cosine(col("__va"), col("__vb")), 4) >= tau)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("__dropped", lit(true))
    cells.join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell"), col("__dropped").isNull.as("keep"))
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

  /** LSH bucket ids for a vector: L tables × B sign-bits each.
    *
    * Interpreted REFERENCE formulation, kept for the bit-compatibility
    * spec only — higher-order lambdas evaluate interpreted, so the hot
    * path uses the codegen'd [[graft.functions.LshFns]] expression
    * (same math, pinned identical by LshFnsSpec).
    */
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

  /** (id, t, bucket) exploded LSH postings for a vector set, with
    * oversized buckets dropped (the cap bounds worst-case join fan-out;
    * shuffle payload is ids + bucket longs only — no vectors).
    */
  private def explodedPostings(
      df: DataFrame, idCol: String, vecCol: String,
      tables: Int, bits: Int): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(graft.functions.LshFns.lshBucketsCol(
          df.sparkSession, col(vecCol), tables, bits)))
      .withColumnRenamed("pos", "t").withColumnRenamed("col", "bucket")

  private def postings(
      df: DataFrame, idCol: String, vecCol: String,
      tables: Int, bits: Int, maxBucket: Int): DataFrame =
    BucketCap.cappedPostings(
      explodedPostings(df, idCol, vecCol, tables, bits),
      maxBucket, "id", "t", "bucket")

  /** Approximate top-k neighbors: exact scoring restricted to candidates
    * sharing an LSH bucket with the query in any of `tables` tables.
    * Returns the same shape as [[bruteForceKnn]] (qid, cid, sim, rank).
    * Recall is probabilistic in general; for the high-similarity regime
    * (near-copies) collisions are near-certain — see SketchRecallSpec.
    */
  def annLsh(
      queries: DataFrame, candidates: DataFrame, k: Int,
      tables: Int = 8, bits: Int = 12, maxBucket: Int = 1000,
      minSim: Double = Double.NegativeInfinity): DataFrame = {
    val qp = queries.select(col("qid").as("id"), col("qvec"))
      .select(col("id"), posexplode(graft.functions.LshFns.lshBucketsCol(
        queries.sparkSession, col("qvec"), tables, bits)))
      .withColumnRenamed("pos", "t").withColumnRenamed("col", "bucket")
      .select(col("id").as("qid"), col("t"), col("bucket"))
    val cp = postings(candidates, "cid", "cvec", tables, bits, maxBucket)
      .select(col("id").as("cid"), col("t"), col("bucket"))
    // queries are the small side by contract → broadcast postings;
    // candidate pairs dedupe on ids ONLY (no vector payload in shuffle)
    val pairs = cp.join(broadcast(qp), Seq("t", "bucket"))
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
    val scored = pairs
      .join(broadcast(queries), "qid")
      .join(candidates, "cid")
      .select(col("qid"), col("cid"),
        round(cosine(col("qvec"), col("cvec")), 4).as("sim"))
      .where(col("sim") >= minSim)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Sign-bit binary signature: each 64-dim word's signs packed into a
    * long, MSB-first, by shift-or accumulation (bitwise ops only —
    * `acc*2+bit` would trip the ANSI overflow check once the word's
    * top bit is set). Convention: strictly positive → 1, zero/negative
    * → 0. A 64-dim float32 vector collapses to ONE long: 32× less
    * memory than the raw floats, which turns the candidate scan from
    * compute-bound into a compact-signature sweep.
    */
  def binarySignature(vec: Column): Column =
    // empty vectors (failed/padded encodes) get an empty signature
    // rather than poisoning the scan: sequence(0, -1) would yield
    // [0, -1] (negative default step) and the inner element_at would
    // abort the job under ANSI mode. An empty signature can only
    // Hamming-match another empty vector, and the exact-cosine rerank
    // scores that pair NaN, which fails every >= threshold filter.
    when(size(vec) > 0,
      transform(
        sequence(lit(0), floor((size(vec) - 1) / lit(64)).cast("int")),
        w => aggregate(
          sequence(w * 64, least(w * 64 + 63, size(vec) - 1)),
          lit(0L),
          (acc, i) => shiftleft(acc, 1)
            .bitwiseOR(when(element_at(vec, i + 1) > 0, 1L).otherwise(0L)))))
      .otherwise(array().cast("array<long>"))

  /** Hamming distance between two packed signatures (xor + popcount per
    * word — codegen'd, no UDF).
    */
  def hamming(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Binary-quantization ANN (sign sketch + Hamming radius + exact
    * rerank) — the 1-bit quantization scan modern vector stores use as
    * their cheapest filter tier (public technique: sign-random-
    * projection / 1-bit PQ; here the identity projection since
    * coordinates are already ~isotropic).
    *
    * Dataflow: queries' signatures broadcast (|Q| longs); ONE pass over
    * the candidate signatures keeps pairs within `maxHamming`; only
    * those pairs re-join their float vectors for exact cosine + rank.
    * Like [[bruteForceKnn]] the scan is |Q|·|C|, but per comparison it
    * is one xor+popcount on 8 bytes instead of a 64-float dot product
    * — memory traffic drops 32×, which is what matters at 100 TB —
    * and unlike brute force only the Hamming-ball survivors (≈ the
    * true near-copies) ever touch the vector payload again.
    *
    * Recall: a near-copy whose coordinates are scaled by any positive
    * factor keeps every sign → Hamming 0 → always recalled. For general
    * angle θ the expected differing bits are dim·θ/π, so `maxHamming`
    * is a tunable radius (6 ≈ cos 0.995 at dim 64 in expectation).
    */
  def annBinary(
      queries: DataFrame, candidates: DataFrame, k: Int,
      maxHamming: Int = 6,
      minSim: Double = Double.NegativeInfinity): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    val qsig = queries
      .select(col("qid"), binarySignature(col("qvec")).as("qsig"))
    val pairs = candidates
      .select(col("cid"), binarySignature(col("cvec")).as("csig"))
      .crossJoin(broadcast(qsig))
      .where(col("qid") =!= col("cid") &&
        hamming(col("qsig"), col("csig")) <= maxHamming)
      .select("qid", "cid")
    val scored = pairs
      .join(broadcast(queries), "qid")
      .join(candidates, "cid")
      .select(col("qid"), col("cid"),
        round(cosine(col("qvec"), col("cvec")), 4).as("sim"))
      .where(col("sim") >= minSim)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Maximum-inner-product search (MIPS) via the norm-augmentation
    * reduction to angular search (public technique: Neyshabur & Srebro
    * 2015 / Shrivastava & Li asymmetric LSH): append to each candidate
    * the residual coordinate √(M²−‖c‖²) where M = max candidate norm,
    * and 0 to each query — the augmented candidates share a norm M, so
    * the largest inner product becomes the smallest augmented angle,
    * and any angular index (here: the packed sign signatures of
    * [[annBinary]]) serves as the candidate generator. Exact DOT
    * products (of the ORIGINAL vectors) rerank the Hamming survivors.
    *
    * This is the retrieval mode recommendation/embedding-score systems
    * need where cosine is wrong (magnitude carries signal —
    * popularity, confidence, recency weights baked into norms).
    *
    * Sign trick: the augmented candidate's `dim` data sign bits equal
    * the raw vector's (the 1/M scaling is positive), and the
    * augmentation coordinate carries no usable sign information — the
    * query side is always 0 (packs to bit 0) while any candidate with
    * ‖c‖ < M has residual > 0 (packs to bit 1), so including it would
    * spend one unit of `maxHamming` on EVERY query-candidate pair and
    * silently shrink the effective radius to maxHamming−1. Signatures
    * are therefore computed on the raw `dim` coordinates only (no
    * division, no augmentation in the index path); the augmentation
    * matters to the exact-dot rerank ordering, which uses the ORIGINAL
    * vectors anyway.
    */
  def mipsBinary(
      queries: DataFrame, candidates: DataFrame, k: Int,
      maxHamming: Int = 6,
      minDot: Double = Double.NegativeInfinity): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val csig = candidates
      .select(col("cid"), binarySignature(col("cvec")).as("csig"))
    val qsig = queries
      .select(col("qid"), binarySignature(col("qvec")).as("qsig"))
    val pairs = csig.crossJoin(broadcast(qsig))
      .where(col("qid") =!= col("cid") &&
        hamming(col("qsig"), col("csig")) <= maxHamming)
      .select("qid", "cid")
    val scored = pairs
      .join(broadcast(queries), "qid")
      .join(candidates, "cid")
      .select(col("qid"), col("cid"),
        round(dotD(col("qvec"), col("cvec")), 4).as("dot"))
      .where(col("dot") >= minDot)
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** IVF (inverted-file) approximate kNN — the classic two-level ANN
    * index, Spark-first. The coarse quantizer is `nlist` sampled
    * candidate vectors (deterministic hash-order sample, unit-
    * normalized); training-free, so results are reproducible with no
    * RNG state and no iterative k-means job (recall for the near-copy
    * regime needs only "near-identical vectors quantize to the same
    * cell", which sampling gives as well as k-means does).
    *
    * Scale shape (the reason IVF beats LSH at 100 TB read-side):
    *  - centroids are metadata-sized (`nlist`×dim ≈ KBs) — collected
    *    once, shipped as a literal array; cell assignment is a PURE MAP
    *    over candidates (argmax of codegen'd dot products), no shuffle
    *    of the big side, no per-row UDF;
    *  - each candidate lands in exactly ONE cell (vs L postings per
    *    vector under LSH), so the probe join fans out |Q|·nprobe cells,
    *    not |Q|·L buckets;
    *  - the probe set (qid, cell) is broadcast; only colliding pairs
    *    are scored exactly. Persist `candidates` celled by `cell` (e.g.
    *    partitionBy(cell) in the lake) to reuse the index across query
    *    batches.
    */
  /** Deterministic hash-ordered vector sample as doubles (the
    * training-free index-construction device shared by IVF and PQ).
    * Zero-norm rows (failed/padded encodes) are skipped: normalized
    * they would be all-NaN, and NaN sorts ABOVE every real dot
    * product — one such centroid would win every cell assignment and
    * collapse the index into a single cell.
    */
  private def hashSample(candidates: DataFrame, n: Int): Seq[Seq[Double]] =
    candidates
      .select(col("cid"), transform(col("cvec"), _.cast("double")).as("v"))
      .orderBy(xxhash64(col("cid").cast("string")), col("cid"))
      .limit(n)
      .collect()
      .map(_.getSeq[Double](1))
      .filter(v => v.exists(_ != 0.0))
      .map(_.toSeq).toSeq

  /** Coarse-quantizer centroids: sampled, unit-normalized so
    * argmax(dot) == argmax(cosine). Metadata-sized (nlist×dim ≈ KBs).
    */
  private def coarseCentroids(
      candidates: DataFrame, nlist: Int): Seq[(Int, Seq[Double])] = {
    val sampled = hashSample(candidates, nlist).zipWithIndex.map {
      case (v, i) =>
        val n = math.sqrt(v.map(x => x * x).sum)
        (i, v.map(_ / n))
    }
    require(sampled.nonEmpty, "IVF: no non-zero vectors to sample centroids from")
    sampled
  }

  /** Top-n cells of `vec` by centroid dot product: n passes over an
    * nlist-sized plan-literal array per row (n=1 for assignment) —
    * map-side, no shuffle. `centArr` is
    * array<struct<_1:int,_2:array<double>>>.
    */
  private def bestCells(centArr: Column, vec: Column, n: Int): Column = {
    val scored = transform(centArr, c =>
      struct(dotD(vec, c.getField("_2")).as("cs"),
        c.getField("_1").as("cent")))
    // n=1 is the ASSIGNMENT path, run once per corpus row at build
    // time — argmax via array_max (O(nlist), struct comparison picks
    // max cs then max cent, the same tie-break reverse(array_sort)
    // yields) instead of sorting all nlist structs per row
    // (O(nlist·log nlist) with a big constant; at nlist=√N the sort
    // made build wall-clock grow ~N^1.5 — measured 163 s vs 36 s for
    // 2M rows × 1414 cells)
    if (n == 1) array(array_max(scored))
    else slice(reverse(array_sort(scored)), 1, n)
  }

  /** Cell ASSIGNMENT for corpus rows: flat argmax over all centroids.
    *
    * Deliberately NOT a two-level (FAISS-style coarse-quantizer)
    * hierarchy — that was built and MEASURED this round, and rejected
    * on the numbers. At 2M rows × nlist=1414 a best-cell-of-best-super
    * scheme (g=⌈√nlist⌉ supers, literal member map, `element_at`
    * lookup) cut build 51.6→11.8 s, but probing the resulting index
    * took 9.8–10.7 s vs 5.8 s on the flat-assigned index — with
    * IDENTICAL shuffle bytes (132 vs 133 MB). The slowdown is scan
    * volume: two-level assignment funnels Voronoi-boundary mass into
    * hub cells (max cell 12 457 rows = 8.8× the mean), hub cells are
    * exactly the ones probes hit, and the partition-pruned scan reads
    * whole cells before the join filters. An index is built once and
    * probed forever — trading recurring probe scan volume for
    * one-time build FLOPs is the wrong direction, so assignment
    * stays exact. (The flat build is a map-side FLOP-bound stage
    * with linear bytes — it scales out horizontally; PERF.md
    * round 12.)
    *
    * Round 13 cut the CONSTANT instead of the FLOPs: the per-centroid
    * HOF pipeline (struct extraction + static dot call + struct
    * allocation per centroid per row) is now one blocked expression,
    * [[graft.functions.ArgmaxDotCell]] — bit-identical scores and
    * tie-break (VectorFnsSpec pins it against the HOF formulation),
    * same exact assignment, ~n× less plumbing per row.
    */
  private def assignCell(
      cents: Seq[(Int, Seq[Double])], vec: Column): Column =
    graft.functions.VectorFns.argmaxCellCol(
      SparkSession.active, vec, typedLit(cents))

  /** The pre-r13 HOF formulation of [[assignCell]] — kept as the
    * bit-compatibility reference (the [[dotHof]] pattern);
    * VectorFnsSpec pins [[graft.functions.ArgmaxDotCell]] against it.
    */
  private[operators] def assignCellHof(
      cents: Seq[(Int, Seq[Double])], vec: Column): Column =
    bestCells(typedLit(cents), vec, 1).getItem(0).getField("cent")

  /** Probe cells for a query: array<struct<cs,cent>> of the top
    * `nprobe` cells by centroid dot (full sort — query batches are
    * small; see [[assignCell]] for why there is no hierarchy here).
    */
  private def probeCells(
      cents: Seq[(Int, Seq[Double])], vec: Column, nprobe: Int): Column =
    bestCells(typedLit(cents), vec, nprobe)

  def annIvf(
      queries: DataFrame, candidates: DataFrame, k: Int,
      nlist: Int = 256, nprobe: Int = 8,
      minSim: Double = Double.NegativeInfinity): DataFrame = {
    val cents = coarseCentroids(candidates, nlist)

    // id+cell only — vectors re-attach after the probe join
    val celled = candidates.select(col("cid"),
      assignCell(cents, col("cvec")).as("cell"))
    val probes = queries.select(col("qid"),
        explode(probeCells(cents, col("qvec"), nprobe)).as("p"))
      .select(col("qid"), col("p.cent").as("cell"))
    val pairs = celled.join(broadcast(probes), Seq("cell"))
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid")
    val scored = pairs
      .join(broadcast(queries), "qid")
      .join(candidates, "cid")
      .select(col("qid"), col("cid"),
        round(cosine(col("qvec"), col("cvec")), 4).as("sim"))
      .where(col("sim") >= minSim)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Persist an IVF index as a CELL-PARTITIONED parquet table plus a
    * centroid sidecar — the "build once, probe many" lifecycle the
    * [[annIvf]] scaladoc promises. At 100 TB the index build is one
    * map-side cell assignment + one partitioned write; after that,
    * every query batch is a PARTITION-PRUNED scan of its probed cells
    * (`cell=K/` directories) — the filesystem is the inverted file,
    * and Spark's partition pruning is the posting-list seek. No
    * rebuild, no full scan, per batch.
    */
  /** The √N operating rule for `nlist`, made executable (`index build
    * --nlist auto`). Probe cost per query is
    * `nprobe · N/nlist` exact scorings (the probed cells' population)
    * plus `nlist` centroid dot products for quantization; `nlist ∝
    * √N` balances the two, so a fixed-query probe batch scales as
    * O(√N) instead of the O(N) a FIXED nlist degrades to (the 0.72
    * exponent PERF.md measured at nlist=64). Floor 16 keeps tiny
    * corpora from degenerating into brute force; cap 1<<16 keeps the
    * centroid sidecar metadata-sized (65536×32 doubles ≈ 16 MB plan
    * literal — the ceiling of "broadcastable as a typedLit").
    */
  def autoNlist(n: Long): Int =
    math.min(1L << 16,
      math.max(16L, math.round(math.sqrt(n.toDouble)))).toInt

  def buildIvfIndex(
      spark: SparkSession, candidates: DataFrame, nlist: Int,
      path: String): Unit = {
    import spark.implicits._
    val cents = coarseCentroids(candidates, nlist)
    candidates
      .withColumn("cell", assignCell(cents, col("cvec")))
      // co-locate each cell before the partitioned write: without
      // this, EVERY write task holds rows of ~every cell, so the
      // output is tasks×nlist fragment files — at nlist=√N that
      // explodes (measured: 45 s vs 7 s building 200k vectors), and
      // the probe pays the open-file tax on every batch forever. One
      // shuffle at build time buys one coherent file per cell — the
      // read-optimized layout an inverted file exists for.
      .repartition(col("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(s"$path/cells")
    cents.toDF("cell", "centroid").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
  }

  /** Append vectors to a persisted IVF index WITHOUT a rebuild: assign
    * each new vector to its nearest STORED centroid (one map pass —
    * the centroid table is the only read) and append the assignments
    * into the existing `cell=` directory layout. Ingest-time index
    * maintenance costs O(|new|), not O(|index|); probes see the new
    * vectors immediately because the filesystem IS the inverted file.
    * Centroids stay fixed — the standard IVF practice; drift from a
    * shifted corpus distribution is a periodic [[buildIvfIndex]]
    * retrain, not an append-path concern.
    */
  def appendToIvfIndex(
      spark: SparkSession, candidates: DataFrame, path: String): Unit = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    candidates
      .withColumn("cell", assignCell(cents, col("cvec")))
      .write.mode(SaveMode.Append).partitionBy("cell")
      .parquet(s"$path/cells")
  }

  /** Probe a persisted IVF index: quantize the query batch with the
    * stored centroids, then scan ONLY the probed `cell=` directories
    * (an `isin` over the partition column — pruned at planning time,
    * IvfIndexSpec pins the file-level skipping). Same output contract
    * as [[annIvf]].
    */
  def probeIvfIndex(
      spark: SparkSession, path: String, queries: DataFrame, k: Int,
      nprobe: Int = 8,
      minSim: Double = Double.NegativeInfinity): DataFrame = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    val probes = queries.select(col("qid"),
        explode(probeCells(cents, col("qvec"), nprobe)).as("p"))
      .select(col("qid"), col("p.cent").as("cell"))
    // |Q|·nprobe cell ids — metadata-sized, becomes the partition filter
    val probedCells = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val index = spark.read.parquet(s"$path/cells")
      .where(col("cell").isin(probedCells: _*))
    val pairs = index.select(col("cid"), col("cell"))
      .join(broadcast(probes), Seq("cell"))
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid")
    val scored = pairs
      .join(broadcast(queries), "qid")
      .join(index.select(col("cid"), col("cvec")), "cid")
      .select(col("qid"), col("cid"),
        round(cosine(col("qvec"), col("cvec")), 4).as("sim"))
      .where(col("sim") >= minSim)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** ANN via product quantization + asymmetric distance computation
    * (ADC; Jegou/Douze/Schmid, "Product Quantization for Nearest
    * Neighbor Search", IEEE TPAMI 2011): candidates compress to m
    * small subspace codes against deterministic sampled codebooks, the
    * scan scores every candidate with m table LOOKUPS instead of a
    * dim-wide dot product, and the top `rerank` per query re-score
    * exactly — so with adequate rerank depth the output equals the
    * exact answer.
    *
    * PQ is the scan-COMPRESSION layer of ANN: the index carries m
    * integer codes per vector instead of 4·dim bytes (32x at dim=64,
    * m=8) and the codebook travels as a plan literal, so encode, ADC
    * scoring, and the probe all stay map-side codegen'd work.
    * Candidate-set REDUCTION is the coarse quantizer's job
    * ([[annIvf]]); composing the two is the standard IVF-PQ layout —
    * kept separate here so each layer is testable against its own
    * exact oracle.
    */
  /** Deterministic PQ codebooks as a plan literal: ksub sample vectors
    * (same device as annIvf's coarse quantizer), subvector j of sample
    * c is codebook entry (j, c). Zero-norm rows (failed encodes)
    * skipped. `sub` is the subspace width dim/m.
    */
  private final case class PqIndex(m: Int, sub: Int, cb: Column)

  private def buildPqIndex(candidates: DataFrame, m: Int, ksub: Int): PqIndex = {
    val dim = candidates.select(size(col("cvec"))).head().getInt(0)
    require(dim % m == 0, s"PQ: dim $dim not divisible by m=$m")
    val sub = dim / m
    val samples = hashSample(candidates, ksub)
    require(samples.nonEmpty, "PQ: no non-zero vectors to sample codebooks from")
    val codebook: Seq[Seq[Seq[Double]]] =
      (0 until m).map(j => samples.map(_.slice(j * sub, (j + 1) * sub)))
    PqIndex(m, sub, typedLit(codebook))
  }

  private def pqL2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (s, x) => s + x)

  private def pqSubvec(idx: PqIndex, vec: Column, j: Column): Column =
    slice(transform(vec, _.cast("double")), j * idx.sub + 1, lit(idx.sub))

  /** PQ encode: per subspace, argmin L2 over the codebook entries
    * (two-arg transform lambda carries the code index; ties break to
    * the lower code via the struct sort's second field). Map-side.
    */
  private def pqEncode(idx: PqIndex, vec: Column): Column =
    transform(sequence(lit(0), lit(idx.m - 1)), j =>
      element_at(array_sort(
        transform(element_at(idx.cb, j + 1),
          (cv, c) => struct(pqL2(pqSubvec(idx, vec, j), cv).as("d"),
            c.as("code")))), 1).getField("code"))

  /** ADC lookup table per query: qtable(j)(c) = dot(q_j, codebook(j)(c)),
    * so sum_j qtable(j)(codes(j)) == dot(q, reconstruct(codes)).
    */
  private def pqQTable(idx: PqIndex, vec: Column): Column =
    transform(sequence(lit(0), lit(idx.m - 1)), j =>
      transform(element_at(idx.cb, j + 1),
        cv => dotD(pqSubvec(idx, vec, j), cv)))

  /** ADC score of a codes column against a qtable column. */
  private def adcScore(codes: Column, qtable: Column): Column =
    aggregate(zip_with(codes, qtable, (c, row) => element_at(row, c + 1)),
      lit(0.0), (s, x) => s + x)

  /** Exact cosine re-score of a (qid, cid) shortlist, top-k per query. */
  private def rerankExact(
      pairs: DataFrame, queries: DataFrame, candidates: DataFrame,
      k: Int, minSim: Double): DataFrame = {
    val scored = pairs
      .join(broadcast(queries), "qid")
      .join(candidates, "cid")
      .select(col("qid"), col("cid"),
        round(cosine(col("qvec"), col("cvec")), 4).as("sim"))
      .where(col("sim") >= minSim)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  def annPq(
      queries: DataFrame, candidates: DataFrame, k: Int,
      m: Int = 8, ksub: Int = 16, rerank: Int = 64,
      minSim: Double = Double.NegativeInfinity): DataFrame = {
    val idx = buildPqIndex(candidates, m, ksub)
    val enc = candidates.select(col("cid"), pqEncode(idx, col("cvec")).as("codes"))
    val qt = queries.select(col("qid"), pqQTable(idx, col("qvec")).as("qtable"))
    val approx = enc.crossJoin(broadcast(qt))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        adcScore(col("codes"), col("qtable")).as("approx"))
    val wA = Window.partitionBy("qid").orderBy(col("approx").desc, col("cid"))
    val cands = approx.withColumn("r", row_number().over(wA))
      .where(col("r") <= rerank)
      .select("qid", "cid")
    rerankExact(cands, queries, candidates, k, minSim)
  }

  /** IVF-PQ shortlist: (qid, cid) survivors of the ADC scan restricted
    * to the query's probed cells — top `rerank` per query by ADC score.
    * Exposed for the cell-restriction proof in SketchRecallSpec: the
    * cell join is an equi-join (broadcast hash), so the plan contains
    * NO cartesian/nested-loop product — the ADC arithmetic provably
    * runs only on candidates whose cell one of the query's probes hit.
    */
  private[graft] def ivfPqShortlist(
      queries: DataFrame, candidates: DataFrame,
      nlist: Int, nprobe: Int, m: Int, ksub: Int, rerank: Int): DataFrame = {
    val cents = coarseCentroids(candidates, nlist)
    val idx = buildPqIndex(candidates, m, ksub)
    // ONE map-side pass over the corpus computes both index columns
    // (cell + codes); the scan output is ids + m codes, never vectors
    val enc = candidates.select(col("cid"),
      assignCell(cents, col("cvec")).as("cell"),
      pqEncode(idx, col("cvec")).as("codes"))
    val probes = queries.select(col("qid"),
        explode(probeCells(cents, col("qvec"), nprobe)).as("p"))
      .select(col("qid"), col("p.cent").as("cell"))
    val qt = queries.select(col("qid"), pqQTable(idx, col("qvec")).as("qtable"))
    val adc = enc.join(broadcast(probes), Seq("cell"))
      .where(col("qid") =!= col("cid"))
      .join(broadcast(qt), "qid")
      .select(col("qid"), col("cid"),
        adcScore(col("codes"), col("qtable")).as("approx"))
    val wA = Window.partitionBy("qid").orderBy(col("approx").desc, col("cid"))
    adc.withColumn("r", row_number().over(wA))
      .where(col("r") <= rerank)
      .select("qid", "cid")
  }

  /** IVF-PQ: the standard composed ANN layout (Jegou et al. 2011, §V) —
    * the coarse quantizer REDUCES the candidate set to nprobe cells,
    * PQ/ADC COMPRESSES the scan of those cells to m table lookups per
    * candidate, and the top `rerank` survivors re-score exactly.
    *
    * This is the 100 TB read-side shape [[annPq]] alone lacks: annPq's
    * ADC pass still touches every candidate (cheaper per row, same row
    * count), while here the per-query work is proportional to the
    * probed cells' population (~ nprobe/nlist of the corpus). Persist
    * the (cell, codes) index partitioned by cell in the lake and query
    * batches skip everything outside their probes at the FILE level.
    */
  def annIvfPq(
      queries: DataFrame, candidates: DataFrame, k: Int,
      nlist: Int = 256, nprobe: Int = 8,
      m: Int = 8, ksub: Int = 16, rerank: Int = 64,
      minSim: Double = Double.NegativeInfinity): DataFrame =
    rerankExact(
      ivfPqShortlist(queries, candidates, nlist, nprobe, m, ksub, rerank),
      queries, candidates, k, minSim)

  /** Embedding-cosine near-duplicate pairs over one set: all pairs with
    * cosine >= threshold among LSH bucket collisions (no full cross
    * product, capped buckets, id-only dedup). Returns (id_a, id_b, sim).
    */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, tables: Int = 8, bits: Int = 12,
      maxBucket: Int = 1000): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // single-pass capped buckets → within-bucket pairs (the capped
    // self-join planned the hyperplane projection 4×; see BucketCap)
    val pairs = BucketCap.cappedPairs(
        explodedPostings(v, "id", "vec", tables, bits),
        maxBucket, "id", "t", "bucket")
      .distinct()
    pairs
      .join(v.select(col("id").as("id_a"), col("vec").as("va")), "id_a")
      .join(v.select(col("id").as("id_b"), col("vec").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 4).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Maximal-marginal-relevance diversification (Carbonell & Goldstein
    * 1998) — greedy re-ranking that trades query relevance against
    * redundancy with what was already picked:
    * `pick_i = argmax λ·sim(q,d) − (1−λ)·max_{p∈picked} sim(d,p)`.
    * The retrieval-side sibling of [[semDedup]]: instead of deleting
    * near-duplicates from the corpus, it keeps them but never SELECTS
    * two of them for the same query — the standard de-redundancy step
    * for RAG context assembly and per-query training-subset selection.
    * Beyond-reference.
    *
    * Scale shape: stage 1 is [[bruteForceKnn]]'s broadcast scoring
    * cut to a per-query `pool` (WindowGroupLimit — never a global
    * sort); the corpus-scale work ends there, fully relational and
    * codegen'd. The greedy selection then runs per query in ONE
    * `flatMapGroups` pass over the |Q|·pool pooled rows — pool² dot
    * products and k argmax scans per query, both CAPPED by the pool
    * parameter and independent of corpus size. The typed boundary
    * deserializes only the pooled rows, never the corpus (the
    * relational-loop alternative — k windows + 2k joins — plans
    * either 2^k growing trees or k eager checkpoint jobs; measured
    * 5-7 s on KB of pooled data against ~1 s for this shape).
    *
    * Determinism (the oracle contract): pool sims and pairwise sims
    * round to 4dp FIRST (pairwise via the same HALF_UP
    * `BigDecimal.valueOf` arithmetic Spark's `round` applies, and the
    * dot products accumulate left-to-right in double exactly like
    * [[graft.functions.VectorFns.dot]]); the mmr score is then one
    * multiply-subtract over identical doubles on any engine, ties
    * break by cid, and the running `maxdiv` starts at −1 (cosine's
    * floor) so the max chain is exact from the first update.
    *
    * @param queries    (qid, qvec) — small (broadcast side); qid must
    *                   be integral (cast to long in the output)
    * @param candidates (cid, cvec) — arbitrarily large; cid integral
    * @param k          picks per query
    * @param lam        relevance weight λ in [0, 1]
    * @param pool       relevance pool per query fed to the greedy stage
    * @return (qid, cid, sim, pick) — pick = 1-based selection order
    */
  def mmrDiversify(
      queries: DataFrame, candidates: DataFrame, k: Int,
      lam: Double, pool: Int, excludeSelf: Boolean = true): DataFrame = {
    require(k > 0 && pool >= k, s"mmr: need pool >= k > 0, got k=$k pool=$pool")
    require(lam >= 0 && lam <= 1, s"mmr: lambda must be in [0,1], got $lam")
    val spark = queries.sparkSession
    import spark.implicits._
    val pooled = bruteForceKnn(queries, candidates, pool, excludeSelf)
      .select("qid", "cid", "sim")
      .join(candidates.select(col("cid"), col("cvec")), "cid")
      .select(col("qid").cast("long"), col("cid").cast("long"),
        col("sim").cast("double"),
        col("cvec").cast("array<double>").as("vec"))
      .as[(Long, Long, Double, Array[Double])]
    pooled.groupByKey(_._1).flatMapGroups { (qid, it) =>
      val rows = it.toArray
      val n = rows.length
      val picksN = math.min(k, n)
      val maxdiv = Array.fill(n)(-1.0)
      val chosen = new Array[Boolean](n)
      val out = Array.newBuilder[(Long, Long, Double, Int)]
      var i = 1
      while (i <= picksN) {
        var best = -1
        var bestScore = 0.0
        var j = 0
        while (j < n) {
          if (!chosen(j)) {
            val s =
              if (i == 1) rows(j)._3
              else lam * rows(j)._3 - (1.0 - lam) * maxdiv(j)
            if (best == -1 || s > bestScore ||
                (s == bestScore && rows(j)._2 < rows(best)._2)) {
              best = j; bestScore = s
            }
          }
          j += 1
        }
        chosen(best) = true
        out += ((qid, rows(best)._2, rows(best)._3, i))
        if (i < picksN) {
          val bv = rows(best)._4
          var m = 0
          while (m < n) {
            if (!chosen(m)) {
              val d = round4(cosineLocal(rows(m)._4, bv))
              if (d > maxdiv(m)) maxdiv(m) = d
            }
            m += 1
          }
        }
        i += 1
      }
      out.result().iterator
    }.toDF("qid", "cid", "sim", "pick")
  }

  /** Greedy k-center (farthest-point traversal) diversity sample — the
    * "maximally spread subset" coreset: seed with the smallest md5(id)
    * (the k-means init rule), then repeatedly take the point FARTHEST
    * from everything already chosen. The classic 2-approximation to
    * the k-center objective, and the diversity-first complement of
    * [[KMeans.clusterSample]]'s density capping.
    *
    * Exactness: vectors are ×scale-quantized integers, so every
    * squared distance is an exact integer (computed as Σ(aᵢ−bᵢ)² in
    * Long; the oracle's |a|²+|b|²−2ab in double is the same value
    * exactly below 2⁵³) — the argmax chain is FP-free and ties break
    * on id, so any engine replays the pick sequence.
    *
    * Scale shape: inherently k rounds, but each round computes ONE new
    * distance (to the latest pick) and folds it into a running
    * `least(min_d2, new)` column that is localCheckpoint'd per round —
    * O(k·N) distance work with a constant-size plan, the same
    * carry-the-state pattern [[KMeans]] uses for Lloyd iterations
    * (vs the naive rebuild-`least(all chosen)` form, which is O(k²·N)
    * and grows a k-wide expression tree Catalyst must re-plan every
    * round). The chosen set lives on the driver (k·dim literals —
    * model-sized, the centroid-exchange budget).
    *
    * The id column is kept generic (any orderable type — ties break on
    * it); picking stops early when the max min-distance hits 0, i.e.
    * every remaining point coincides with a chosen one, so k larger
    * than the distinct-vector count yields fewer rows, never duplicate
    * picks.
    *
    * @return (idCol, pick (1-based), dist) — dist = distance to the
    *         previously-chosen set in original units, 0.0 for the seed
    */
  def kCenterSample(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      scale: Int = 100): DataFrame = {
    require(k >= 1, s"kCenterSample: k must be >= 1, got $k")
    val spark = df.sparkSession
    val q = df.select(col(idCol).as("__id"),
      KMeans.quantize(col(vecCol), scale).as("__qv"))
      .localCheckpoint()
    val seed = q.orderBy(md5(col("__id").cast("string")), col("__id"))
      .limit(1).collect()(0)
    var picks = Vector[(Any, Long)]((seed.get(0), 0L))
    var lastVec = seed.getSeq[Long](1)
    // Running min-distance-to-chosen-set; seeded at "infinity" so the
    // first fold reduces it to the distance-to-seed.
    var cur = q.withColumn("__md2", lit(Long.MaxValue))
    var done = false
    for (_ <- 2 to k if !done) {
      cur = kCenterRound(cur, lastVec).localCheckpoint()
      val top = cur.orderBy(desc("__md2"), col("__id")).limit(1).collect()(0)
      if (top.getLong(2) == 0L) done = true // all remaining coincide with chosen
      else {
        picks :+= ((top.get(0), top.getLong(2)))
        lastVec = top.getSeq[Long](1)
      }
    }
    val idType = q.schema("__id").dataType
    val rows = picks.zipWithIndex.map { case ((id, d2), i) =>
      org.apache.spark.sql.Row(id, i + 1, d2)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__id", idType),
        org.apache.spark.sql.types.StructField("pick",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__d2",
          org.apache.spark.sql.types.LongType, nullable = false))))
      .select(col("__id").as(idCol), col("pick"),
        round(sqrt(col("__d2").cast("double")) / scale.toDouble, 4)
          .as("dist"))
  }

  /** One k-center round: fold the distance to the newest chosen center
    * into the running `__md2` (min squared distance to the chosen set).
    * Exactly ONE zip_with/aggregate pair per round by construction —
    * DiversitySpec pins that shape on the analyzed plan.
    */
  private[graft] def kCenterRound(
      cur: DataFrame, center: Seq[Long]): DataFrame = {
    val d2 = aggregate(
      zip_with(col("__qv"), lit(center.toArray), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    cur.withColumn("__md2", least(col("__md2"), d2))
  }

  /** Spark `round(_, 4)` semantics (HALF_UP over the decimal string
    * form) — keeps the mapGroups arithmetic bit-identical to the
    * relational `round` the oracle mirrors.
    */
  private def round4(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Double cosine, left-to-right accumulation — the scalar twin of
    * [[graft.functions.VectorFns.dot]] / [[cosine]].
    */
  private def cosineLocal(a: Array[Double], b: Array[Double]): Double = {
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i)
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }
}
