package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Similarity search over the `embeddings` table (64-dim float vectors,
  * pre-normalized): exact brute-force kNN (oracle-checked against
  * DuckDB's list_cosine_similarity in double precision), LSH-bucketed
  * approximate kNN, and embedding-cosine near-dup pairs over planted
  * exact copies.
  */
object VectorQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact top-5 cosine neighbors for query vectors vec_id < 10.
    "qe01_knn_brute" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.bruteForceKnn(q, c, k = 5)
        .select("qid", "cid", "sim", "rank")
        .orderBy("qid", "rank")
    }),

    // Approximate NN via deterministic random-hyperplane LSH against a
    // corpus with planted NOISY copies (per-element double perturbation
    // the oracle reproduces): the query returns every neighbor with
    // cosine >= 0.99 — the dataset's max natural pair sim is ~0.51, so
    // the answer set is exactly the noisy copies, and a single LSH
    // recall miss breaks the hash match.
    "qe02_ann_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val noisy = e.where(col("vec_id") < 10)
        .select((col("vec_id") + 1000000).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x * (lit(1.0) + lit(0.01) * ((i % 5) - 2))).as("embedding"))
      val corpus = e.unionByName(noisy)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.annLsh(q, c, k = 5, tables = 8, bits = 8, minSim = 0.99)
        .select("qid", "cid", "sim", "rank")
        .orderBy("qid", "rank")
    }),

    // IVF (inverted-file) ANN over the same planted-noisy-copy corpus
    // as qe02: sampled coarse quantizer, map-side cell assignment,
    // nprobe=4 of nlist=32 cells probed. The answer set (every neighbor
    // with cosine >= 0.99) is index-independent, so the exact oracle is
    // a full recall gate: one IVF miss (query and its copy quantizing
    // to an unprobed cell) breaks the hash match.
    "qe05_ann_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val noisy = e.where(col("vec_id") < 10)
        .select((col("vec_id") + 1000000).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x * (lit(1.0) + lit(0.01) * ((i % 5) - 2))).as("embedding"))
      val corpus = e.unionByName(noisy)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.annIvf(q, c, k = 5, nlist = 32, nprobe = 4, minSim = 0.99)
        .select("qid", "cid", "sim", "rank")
        .orderBy("qid", "rank")
    }),

    // Product-quantization ANN (ADC scan + exact rerank) over the same
    // planted-noisy-copy corpus as qe02/qe05. The answer set (every
    // neighbor with cosine >= 0.99) is index-independent, so the exact
    // oracle is a full recall gate: a noisy copy falling out of the
    // top-`rerank` ADC candidates for its query breaks the hash match.
    "qe07_ann_pq" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val noisy = e.where(col("vec_id") < 10)
        .select((col("vec_id") + 1000000).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x * (lit(1.0) + lit(0.01) * ((i % 5) - 2))).as("embedding"))
      val corpus = e.unionByName(noisy)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.annPq(q, c, k = 5, m = 8, ksub = 16, rerank = 64,
          minSim = 0.99)
        .select("qid", "cid", "sim", "rank")
        .orderBy("qid", "rank")
    }),

    // IVF-PQ composition (coarse probe → ADC within probed cells only →
    // exact rerank) over the same planted-noisy-copy corpus. The answer
    // set (every neighbor with cosine >= 0.99) is index-independent, so
    // the exact oracle is a full recall gate across BOTH approximation
    // layers: a copy landing in an unprobed cell OR falling out of the
    // ADC top-`rerank` breaks the hash match.
    "qe08_ann_ivfpq" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val noisy = e.where(col("vec_id") < 10)
        .select((col("vec_id") + 1000000).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x * (lit(1.0) + lit(0.01) * ((i % 5) - 2))).as("embedding"))
      val corpus = e.unionByName(noisy)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.annIvfPq(q, c, k = 5, nlist = 32, nprobe = 4,
          m = 8, ksub = 16, rerank = 64, minSim = 0.99)
        .select("qid", "cid", "sim", "rank")
        .orderBy("qid", "rank")
    }),

    // Embedding-cosine near-duplicate pairs over planted exact copies,
    // LSH-bucketed with capped buckets and id-only pair dedup; the
    // oracle recomputes ALL pairs >= threshold exactly.
    "qe03_cosine_neardup" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      val copies = e.where(col("vec_id") < 20)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      Similarity.cosineNearDupPairs(
          e.unionByName(copies), "vec_id", "embedding",
          threshold = 0.95, tables = 8, bits = 8)
        .orderBy("id_a", "id_b")
    }),

    // Cluster-forming embedding dedup: the same pairs→groups composition
    // as qt18, on the vector side — LSH-bucketed cosine pairs feed
    // connected components, so transitively-linked near-copies form ONE
    // keep/drop group even when the endpoints never met in any bucket.
    // The oracle closes the exact pair list with a recursive CTE.
    "qe09_embed_cluster" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      val copies = e.where(col("vec_id") < 20)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      val pairs = Similarity.cosineNearDupPairs(
          e.unionByName(copies), "vec_id", "embedding",
          threshold = 0.95, tables = 8, bits = 8)
        .select("id_a", "id_b")
      val labeled = graft.operators.Components.connectedComponents(pairs)
      graft.operators.Components.componentStats(labeled)
        .select(col("component"), col("n_members"), col("n_dropped"))
        .orderBy("component")
    }),

    // Int8 symmetric quantization with per-vector audit stats
    // (operators/Quantize.scala) — pure map-side codegen'd array math;
    // the integer checksum + clamp count are exact, so the oracle
    // catches any rounding/clamping divergence element-wise.
    "qe06_quantize" -> ((s, dir) => {
      graft.operators.Quantize.int8Stats(emb(s, dir), "vec_id", "embedding")
        .orderBy("vec_id")
    }),

    // Binary (sign-bit) quantization ANN over the qe02/qe05 planted
    // corpus: 64-dim vectors collapse to ONE long each, the Hamming
    // sweep touches only signatures, and exact cosine reranks the
    // radius survivors. Noisy copies scale coordinates by positive
    // factors, so their signatures are IDENTICAL (Hamming 0) — the
    // exact oracle is a full recall gate like qe02/qe05/qe07/qe08.
    "qe10_ann_binary" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val noisy = e.where(col("vec_id") < 10)
        .select((col("vec_id") + 1000000).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x * (lit(1.0) + lit(0.01) * ((i % 5) - 2))).as("embedding"))
      val corpus = e.unionByName(noisy)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.annBinary(q, c, k = 5, maxHamming = 6, minSim = 0.99)
        .select("qid", "cid", "sim", "rank")
        .orderBy("qid", "rank")
    }),

    // Maximum-inner-product search via the norm-augmentation reduction
    // (Similarity.mipsBinary): copies of each unit query planted at
    // scales 10 and 9 are the only candidates with dot ≥ 6 (measured
    // max off-diagonal cosine in this corpus < 0.5 ⇒ max random dot
    // < 5), so the answer set is index-independent — and positive
    // scaling preserves every sign bit, so the signature stage recalls
    // the planted pair at Hamming ≤ 1 by construction.
    "qe11_mips" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"),
          transform(col("v"), x => x / Similarity.norm(col("v"))).as("qvec"))
      val planted = q.select((col("qid") + 1000000).as("cid"),
          transform(col("qvec"), x => x * 10.0).as("cvec"))
        .unionByName(q.select((col("qid") + 2000000).as("cid"),
          transform(col("qvec"), x => x * 9.0).as("cvec")))
      val c = e.select(col("vec_id").as("cid"), col("v").as("cvec"))
        .unionByName(planted)
      Similarity.mipsBinary(q, c, k = 5, maxHamming = 6, minDot = 6.0)
        .select("qid", "cid", "dot", "rank")
        .orderBy("qid", "rank")
    }),

    // Persisted IVF index lifecycle: build a cell-partitioned index
    // table once, then answer the batch with a partition-pruned probe
    // (Similarity.buildIvfIndex/probeIvfIndex). Same planted corpus and
    // index-independent answer set as qe05, so the exact oracle is a
    // full recall gate over the build→persist→probe round trip.
    "qe12_ivf_index" -> ((s, dir) => {
      val root = s"${sys.props("java.io.tmpdir")}/graft_work/" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "/qe12"
      val e = emb(s, dir)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val noisy = e.where(col("vec_id") < 10)
        .select((col("vec_id") + 1000000).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x * (lit(1.0) + lit(0.01) * ((i % 5) - 2))).as("embedding"))
      val corpus = e.unionByName(noisy)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.buildIvfIndex(s, c, nlist = 32, path = root)
      Similarity.probeIvfIndex(s, root, q, k = 5, nprobe = 4,
          minSim = 0.99)
        .select("qid", "cid", "sim", "rank")
        .orderBy("qid", "rank")
    }),

    // kNN label classification: every 5th vector plays "unlabeled" and
    // takes the majority label of its 5 nearest labeled neighbors
    // (Similarity.knnClassify) — the curated-seed label-propagation
    // step of a corpus-quality pipeline. Votes are integer counts over
    // the deterministic exact neighbor set (4dp sim, id tiebreak), so
    // the oracle replays the whole classification exactly.
    "qe13_knn_classify" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = e.where(col("vec_id") % 5 =!= 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"),
          col("label"))
      Similarity.knnClassify(q, c, k = 5)
        .orderBy("qid")
    }),

    // Distributed k-means (Lloyd): 2 unrolled iterations, k=8,
    // md5-ordered init, integer-quantized vectors with rational
    // (sum, count) centroids — every dot product an exact integer, so
    // the iterative float algorithm is engine-deterministic and the
    // oracle replays both iterations in SQL (KMeans scaladoc).
    "qe14_kmeans" -> ((s, dir) => {
      graft.operators.KMeans.assign(emb(s, dir), "vec_id", "embedding",
          k = 8, iters = 2)
        .orderBy("vec_id")
    }),

    // SemDeDup semantic dedup over the planted-noisy-copy corpus:
    // k-means cells confine the pairwise cosine to within-cluster
    // pairs; copies (sim >= 0.99 to their original, natural max ~0.51)
    // are dropped in favor of the smallest id. The oracle replays the
    // clustering AND the pair logic, so the check is exact even for
    // copies that land across a cell boundary (both engines then
    // agree the pair is invisible — the paper's approximation).
    "qe15_semdedup" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val noisy = e.where(col("vec_id") < 10)
        .select((col("vec_id") + 1000000).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x * (lit(1.0) + lit(0.01) * ((i % 5) - 2))).as("embedding"))
      val corpus = e.unionByName(noisy)
      Similarity.semDedup(corpus, "vec_id", "embedding",
          k = 8, iters = 2, tau = 0.99)
        .orderBy("vec_id")
    }),

    // Two-stage truncated-dim rerank (Matryoshka retrieval): stage 1
    // scores every pair on the first 32 of 64 components and keeps the
    // top-20 per query, stage 2 reranks only those survivors with the
    // exact full-dim cosine. Both cuts are deterministic (4dp, id
    // tiebreak), so the oracle reproduces the survivor set exactly —
    // including any stage-1 misses vs the true top-5, which both
    // engines then agree to miss (the approximation under test).
    "qe16_truncated_rerank" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.truncatedRerank(q, c, k = 5, prefixDim = 32, m = 20)
        .orderBy("qid", "rank")
    }),

    // Per-label embedding statistics (norms, first-component mean).
    "qe04_embedding_stats" -> ((s, dir) => {
      val e = emb(s, dir)
      e.select(col("label"),
          Similarity.norm(col("embedding")).as("nrm"),
          element_at(col("embedding"), 1).cast("double").as("d0"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(avg("nrm"), 4).as("avg_norm"),
          round(avg("d0"), 4).as("avg_d0"))
        .orderBy("label")
    }),

    // Out-of-distribution score: distance to the nearest k-means
    // centroid (same clustering as qe14) — far-from-every-centroid
    // rows are the off-domain/garbage outliers a curation pipeline
    // drops. The |v|² term omitted from the assignment argmin is
    // added back for the true distance; the oracle replays both Lloyd
    // rounds AND the distance tree (KMeans.assignDist scaladoc).
    "qe17_ood_distance" -> ((s, dir) => {
      graft.operators.KMeans.assignDist(emb(s, dir), "vec_id",
          "embedding", k = 8, iters = 2)
        .orderBy("vec_id")
    }),

    // Cluster-balanced sampling: ≤ 20 vectors per k-means cell in
    // md5(id) order — the coverage-preserving subsample (cap dense
    // clusters, keep rare ones whole). The oracle replays the
    // clustering and the per-cell draw; the rank filter compiles to
    // WindowGroupLimit (PlanAuditSpec).
    "qe18_cluster_sample" -> ((s, dir) => {
      graft.operators.KMeans.clusterSample(emb(s, dir), "vec_id",
          "embedding", k = 8, iters = 2, perCell = 20)
        .orderBy("vec_id")
    }),

    // Hard-negative mining for contrastive training: for each anchor
    // (vec_id < 20), the 5 most-similar vectors with a DIFFERENT
    // label — the wrong-label nearest neighbors an embedding trainer
    // pairs with each anchor (Similarity.hardNegatives scaladoc).
    "qe19_hard_negatives" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("label").as("qlabel"))
      val c = e.select(col("vec_id").as("cid"),
        col("embedding").as("cvec"), col("label").as("clabel"))
      Similarity.hardNegatives(q, c, k = 5)
        .select("qid", "qlabel", "cid", "clabel", "sim", "rank")
        .orderBy("qid", "rank")
    }),

    // MMR diversification: greedy λ-tradeoff between query relevance
    // and redundancy with prior picks, λ=0.5 over a 20-candidate pool
    // (Similarity.mmrDiversify scaladoc). The oracle replays the greedy
    // loop unrolled — one CTE pair per pick — so a single divergent
    // pick anywhere in the sequence breaks the hash.
    "qe20_mmr_diversify" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.mmrDiversify(q, c, k = 5, lam = 0.5, pool = 20)
        .orderBy("qid", "pick")
    }),

    // Cross-surface semantic filter: select documents by embedding
    // cosine against a probe vector (vec_id 0's embedding, broadcast
    // as the accepted 1-row pattern), then join BACK to the text table
    // for the text-side fields — the retrieve-then-read integration
    // every RAG/curation pipeline runs. Map-side scoring (codegen'd
    // dot), equi-join on id; the oracle replays with a scalar-subquery
    // probe.
    "qe21_semantic_filter" -> ((s, dir) => {
      val e = emb(s, dir)
      val probe = e.where(col("vec_id") === 0)
        .select(col("embedding").as("pvec"))
      val scored = e.crossJoin(broadcast(probe))
        .select(col("vec_id"),
          round(Similarity.cosine(col("embedding"), col("pvec")), 4)
            .as("sim"))
        .where(col("sim") >= 0.2 && col("vec_id") =!= 0)
      scored.join(graft.Tables.load(s, dir, "documents"),
          scored("vec_id") === col("doc_id"))
        .select(col("doc_id"), col("sim"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // Retrieval-quality harness: recall@10 of the Matryoshka
    // truncated-prefix retriever (stage-1 on 8 of 64 dims, m=15
    // survivors) against exact brute-force ground truth. The 8-dim
    // prefix is deliberately harsh — it loses real neighbors at the
    // survivor cut, so the recall column is a non-trivial measurement
    // (not identically 1.0), yet fully deterministic: both retrievers
    // round scores to 4dp and tiebreak on cid, so the oracle reproduces
    // the exact survivor cut and the exact hit set.
    "qe22_truncation_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val exact = Similarity.bruteForceKnn(q, c, k = 10)
      val approx = Similarity.truncatedRerank(q, c, k = 10,
        prefixDim = 8, m = 15)
      Similarity.retrievalRecall(exact, approx)
        .orderBy("qid")
    }),

    // Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    // 2009): a lexical leg (total occurrences of the query terms,
    // integer) and a vector leg (cosine to the probe embedding), each
    // cut to top-20 as TakeOrderedAndProject (driver k-bounded, never
    // a global sort), fused by rank only — rrf = 1/(60+r_lex) +
    // 1/(60+r_vec). Ranks are integers and the fusion adds exactly two
    // doubles, so the score is FP-order-invariant and the oracle
    // reproduces the exact top-10. The bare rank windows sit above the
    // 20-row cuts (metadata-sized — the HeavyHitters pattern).
    "qe23_hybrid_rrf" -> ((s, dir) => {
      val terms = Seq("join", "scan", "filter")
      val d = graft.Tables.load(s, dir, "documents")
      val lexTop = d.select(col("doc_id"),
          size(filter(graft.functions.TextFunctions.tokens(col("text")),
            t => t.isin(terms: _*))).as("matches"))
        .orderBy(col("matches").desc, col("doc_id")).limit(20)
      val wl = Window.orderBy(col("matches").desc, col("doc_id"))
      val lex = lexTop.withColumn("lex_rank", row_number().over(wl))
        .select("doc_id", "lex_rank")
      val e = emb(s, dir)
      val probe = e.where(col("vec_id") === 0)
        .select(col("embedding").as("pvec"))
      val vecTop = e.crossJoin(broadcast(probe))
        .where(col("vec_id") =!= 0)
        .select(col("vec_id").as("doc_id"),
          round(Similarity.cosine(col("embedding"), col("pvec")), 4)
            .as("sim"))
        .orderBy(col("sim").desc, col("doc_id")).limit(20)
      val wv = Window.orderBy(col("sim").desc, col("doc_id"))
      val vec = vecTop.withColumn("vec_rank", row_number().over(wv))
        .select("doc_id", "vec_rank")
      lex.join(vec, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
          round(
            coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)),
            6).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    }),

    // Filtered (metadata-constrained) ANN — "find neighbors among
    // label-eligible vectors only", the vector-database capability
    // every RAG stack needs for tenancy/recency/ACL constraints. The
    // predicate applies BEFORE scoring (filter-then-search): here it
    // prunes the scan; composed with the persisted IVF index the same
    // predicate prunes inside each probed cell, and recall is exact
    // w.r.t. the filtered corpus either way — never the post-filtered
    // top-k, which silently returns < k when the filter is selective.
    "qe24_filtered_ann" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = e.where(col("label") % 3 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.bruteForceKnn(q, c, k = 5)
        .select("qid", "cid", "sim", "rank")
        .orderBy("qid", "rank")
    }),

    // Late-interaction MaxSim retrieval (ColBERT-style): each 64-dim
    // row is a bag of four 16-dim subvectors; score = Σ_j max_c
    // cos(q_j, d_c). Token-level matching single-vector cosine
    // averages away — and the FP-order-pinned score chain
    // (Similarity.maxSim scaladoc) makes the exact top-5 reproducible
    // by the oracle.
    "qe25_maxsim" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = e.select(col("vec_id").as("cid"),
        col("embedding").as("cvec"))
      Similarity.maxSim(q, c, k = 5, m = 4, subDim = 16)
        .select("qid", "cid", "maxsim", "rank")
        .orderBy("qid", "rank")
    }),

    // External cluster evaluation: pair-counting Adjusted Rand Index +
    // purity of the qe14 clustering against the stored `label` column —
    // integer pair combinatorics over the k×L contingency table, so the
    // oracle replays both Lloyd rounds AND the exact ARI arithmetic
    // (KMeans.clusterEval scaladoc).
    "qe26_cluster_eval" -> ((s, dir) => {
      graft.operators.KMeans.clusterEval(emb(s, dir), "vec_id",
        "embedding", "label", k = 8, iters = 2)
    }),

    // Simplified silhouette over the qe14 clustering: per-point
    // (b − a)/max(a, b) against the nearest and second-nearest
    // centroids — O(n·k) map-side, no shuffle after training, and the
    // oracle replays both Lloyd rounds plus the full distance/ratio
    // operand tree (KMeans.silhouette scaladoc).
    "qe27_silhouette" -> ((s, dir) => {
      graft.operators.KMeans.silhouette(emb(s, dir), "vec_id",
          "embedding", k = 8, iters = 2)
        .orderBy("vec_id")
    }),

    // Greedy k-center diversity sample (farthest-point traversal,
    // k = 5): integer-quantized distances make every argmax FP-free,
    // so the oracle replays the exact pick sequence round by round
    // (Similarity.kCenterSample scaladoc).
    "qe28_kcenter_diverse" -> ((s, dir) => {
      Similarity.kCenterSample(emb(s, dir), "vec_id", "embedding",
          k = 5)
        .orderBy("pick")
    }),

    // Embedding-space geometry histogram: pairwise inner products of a
    // deterministic 100-vector sample (md5 order), binned — the
    // "is my embedding space collapsing/anisotropic" health check run
    // before trusting any cosine threshold. Vectors are ×100-quantized
    // integers and the dot/bin math is integer-exact (the vectors are
    // pre-normalized, so qdot ≈ cosine·10⁴ and bins read as 0.1-wide
    // cosine bands) — no FP boundary anywhere, and the 100×100 pair
    // square is a broadcast nested loop over a sample, not the corpus.
    "qe29_sim_histogram" -> ((s, dir) => {
      val q = emb(s, dir)
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(100)
        .select(col("vec_id"),
          transform(col("embedding"),
            x => round(x.cast("double") * 100).cast("long")).as("qv"))
      val a = q.select(col("vec_id").as("ia"), col("qv").as("qa"))
      val b = q.select(col("vec_id").as("ib"), col("qv").as("qb"))
      a.join(broadcast(b), col("ia") < col("ib"))
        .select(aggregate(zip_with(col("qa"), col("qb"),
          (x, y) => x * y), lit(0L), (acc, x) => acc + x).as("qdot"))
        .select(floor(col("qdot") / 1000).cast("int").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n_pairs"))
        .orderBy("bin")
    })
  )

  /** One unrolled MMR greedy step: pick CTE `p$i` from remaining
    * `r${i-1}`, then the updated remaining `r$i` (maxdiv folded with
    * the new pick's pairwise sim).
    */
  private def mmrStep(i: Int): String = {
    val score =
      if (i == 1) "sim" else "0.5 * sim - 0.5 * maxdiv"
    val pick = s"""
      p$i AS (SELECT qid, cid, sim, $i AS pick FROM (
          SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid
            ORDER BY ($score) DESC, cid) AS rn
          FROM r${i - 1}) WHERE rn = 1)"""
    val next = s"""
      r$i AS (SELECT r.qid, r.cid, r.sim,
                greatest(r.maxdiv, w.d) AS maxdiv
              FROM r${i - 1} r
              JOIN p$i p ON r.qid = p.qid AND r.cid <> p.cid
              JOIN pw w ON w.qid = r.qid AND w.a = r.cid
                AND w.b = p.cid)"""
    if (i < 5) pick + "," + next else pick
  }

  /** qe25's MaxSim score as explicit SQL: per query-subvector j the
    * greatest of the four candidate-subvector cosines rounded to 4dp,
    * then the left-associative `+` chain SQL guarantees — mirroring
    * the operator's pinned FP order term for term.
    */
  private def maxSimOracleScore: String = {
    def sl(v: String, j: Int) =
      s"list_slice($v, ${j * 16 + 1}, ${(j + 1) * 16})"
    (0 until 4).map { j =>
      "round(greatest(" + (0 until 4).map { c =>
        s"list_cosine_similarity(${sl("qv", j)}, ${sl("cv", c)})"
      }.mkString(", ") + "), 4)"
    }.mkString(" + ")
  }

  /** The qe14 k-means replay (2 Lloyd rounds, k=8, md5 init,
    * ×100-quantized integer vectors) through the final-round centroid
    * CTE `c1` — shared by the qe26/qe27 evaluation oracles.
    */
  private val kmeansC1Ctes = """
      WITH e AS (SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS v
             FROM embeddings),
      init AS (SELECT v,
                 row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                   vec_id) - 1 AS cell
               FROM e
               QUALIFY cell < 8),
      c0 AS (SELECT cell, v AS s, CAST(1 AS BIGINT) AS n,
               list_inner_product(
                 list_transform(v, x -> CAST(x AS DOUBLE)),
                 list_transform(v, x -> CAST(x AS DOUBLE))) AS ss
             FROM init),
      a1 AS (SELECT vec_id, v, cell FROM (
               SELECT e.vec_id, e.v, c.cell,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   c.ss / CAST(c.n * c.n AS DOUBLE)
                   - 2.0 * list_inner_product(
                       list_transform(e.v, x -> CAST(x AS DOUBLE)),
                       list_transform(c.s, x -> CAST(x AS DOUBLE)))
                     / CAST(c.n AS DOUBLE),
                   c.cell) AS rn
               FROM e CROSS JOIN c0 c) WHERE rn = 1),
      s1 AS (SELECT cell, pos, sum(x) AS sx, count(*) AS cnt
             FROM (SELECT cell, unnest(v) AS x,
                     unnest(generate_series(1, len(v))) AS pos
                   FROM a1)
             GROUP BY cell, pos),
      c1 AS (SELECT cell, s, n,
               list_inner_product(
                 list_transform(s, x -> CAST(x AS DOUBLE)),
                 list_transform(s, x -> CAST(x AS DOUBLE))) AS ss
             FROM (SELECT cell, list(sx ORDER BY pos) AS s,
                     max(cnt) AS n
                   FROM s1 GROUP BY cell))"""

  /** [[kmeansC1Ctes]] extended with the final assignment CTE `a2`. */
  private val kmeansA2Ctes = kmeansC1Ctes + """
      , a2 AS (SELECT vec_id, cell FROM (
               SELECT e.vec_id, c.cell,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   c.ss / CAST(c.n * c.n AS DOUBLE)
                   - 2.0 * list_inner_product(
                       list_transform(e.v, x -> CAST(x AS DOUBLE)),
                       list_transform(c.s, x -> CAST(x AS DOUBLE)))
                     / CAST(c.n AS DOUBLE),
                   c.cell) AS rn
               FROM e CROSS JOIN c1 c) WHERE rn = 1)"""

  /** One unrolled k-center round: `m$t` = per-point min squared
    * distance to the chosen set `ch${t-1}`, `p$t` = the farthest point
    * (id tiebreak), `ch$t` = chosen ∪ pick. Distances are exact
    * integers in double form (quantized vectors), so the argmax chain
    * is FP-free.
    */
  private def kcRound(t: Int): String = s"""
      m$t AS (SELECT e.vec_id, min(
            list_inner_product(e.dv, e.dv) + list_inner_product(c.dv, c.dv)
            - 2.0 * list_inner_product(e.dv, c.dv)) AS md2
          FROM ed e CROSS JOIN ch${t - 1} c GROUP BY e.vec_id),
      p$t AS (SELECT vec_id, md2 FROM m$t ORDER BY md2 DESC, vec_id LIMIT 1),
      ch$t AS (SELECT * FROM ch${t - 1} UNION ALL
               SELECT e.vec_id, e.dv FROM ed e
               WHERE e.vec_id = (SELECT vec_id FROM p$t))"""

  val oracle: Map[String, String] = Map(
    "qe29_sim_histogram" -> """
      WITH e AS (SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS v
             FROM embeddings),
      s AS (SELECT vec_id, v FROM e
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 100),
      p AS (SELECT list_inner_product(
               list_transform(a.v, x -> CAST(x AS DOUBLE)),
               list_transform(b.v, x -> CAST(x AS DOUBLE))) AS qdot
            FROM s a JOIN s b ON a.vec_id < b.vec_id)
      SELECT cast(floor(qdot / 1000) AS int) AS bin,
             cast(count(*) AS bigint) AS n_pairs
      FROM p GROUP BY 1 ORDER BY bin""",
    "qe28_kcenter_diverse" -> ("""
      WITH ed AS (SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(CAST(round(CAST(x AS DOUBLE) * 100) AS BIGINT)
                   AS DOUBLE)) AS dv
             FROM embeddings),
      ch1 AS (SELECT vec_id, dv FROM ed
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1),""" +
      (2 to 5).map(kcRound).mkString(",") + """
      SELECT vec_id, 1 AS pick, 0.0 AS dist FROM ch1
      UNION ALL SELECT vec_id, 2 AS pick, round(sqrt(md2) / 100.0, 4) FROM p2
      UNION ALL SELECT vec_id, 3 AS pick, round(sqrt(md2) / 100.0, 4) FROM p3
      UNION ALL SELECT vec_id, 4 AS pick, round(sqrt(md2) / 100.0, 4) FROM p4
      UNION ALL SELECT vec_id, 5 AS pick, round(sqrt(md2) / 100.0, 4) FROM p5
      ORDER BY pick"""),
    "qe27_silhouette" -> (kmeansC1Ctes + """
      , sc AS (SELECT e.vec_id, c.cell,
                 c.ss / CAST(c.n * c.n AS DOUBLE)
                   - 2.0 * list_inner_product(
                       list_transform(e.v, x -> CAST(x AS DOUBLE)),
                       list_transform(c.s, x -> CAST(x AS DOUBLE)))
                     / CAST(c.n AS DOUBLE) AS score,
                 list_inner_product(
                   list_transform(e.v, x -> CAST(x AS DOUBLE)),
                   list_transform(e.v, x -> CAST(x AS DOUBLE))) AS vv
               FROM e CROSS JOIN c1 c),
      r AS (SELECT vec_id, cell, score, vv,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY score, cell) AS rn
            FROM sc),
      d AS (SELECT a.vec_id, a.cell,
              round(sqrt(greatest(a.vv + a.score, 0)) / 100.0, 4)
                AS dist_own,
              round(sqrt(greatest(b.vv + b.score, 0)) / 100.0, 4)
                AS dist_next
            FROM r a JOIN r b ON a.vec_id = b.vec_id
              AND a.rn = 1 AND b.rn = 2)
      SELECT vec_id, CAST(cell AS INT) AS cell, dist_own, dist_next,
             round(CASE WHEN greatest(dist_own, dist_next) = 0.0 THEN 0.0
               ELSE (dist_next - dist_own) / greatest(dist_own, dist_next)
               END, 4) AS sil
      FROM d ORDER BY vec_id"""),
    "qe26_cluster_eval" -> (kmeansA2Ctes + """
      , cont AS (SELECT a2.cell, t.label, count(*) AS nij
                 FROM a2 JOIN embeddings t USING (vec_id)
                 GROUP BY 1, 2),
      rc AS (SELECT cell, sum(nij) AS ai, max(nij) AS mx
             FROM cont GROUP BY cell),
      lc AS (SELECT label, sum(nij) AS bj FROM cont GROUP BY label),
      s AS (SELECT
              (SELECT sum(nij * (nij - 1)) FROM cont) AS cp2,
              (SELECT sum(ai * (ai - 1)) FROM rc) AS ap2,
              (SELECT sum(bj * (bj - 1)) FROM lc) AS bp2,
              (SELECT sum(nij) FROM cont) AS n,
              (SELECT count(*) FROM rc) AS n_cells,
              (SELECT sum(mx) FROM rc) AS mxs),
      f AS (SELECT *, n * (n - 1) AS t2 FROM s)
      SELECT cast(n AS bigint) AS n_points, cast(n_cells AS int) AS n_cells,
             round(mxs::DOUBLE / n::DOUBLE, 4) AS purity,
             round(2.0 * (cp2::DOUBLE * t2::DOUBLE - ap2::DOUBLE * bp2::DOUBLE)
               / (t2::DOUBLE * (ap2 + bp2)::DOUBLE
                  - 2.0 * ap2::DOUBLE * bp2::DOUBLE), 4) AS ari
      FROM f"""),
    "qe25_maxsim" -> s"""
      WITH q AS (SELECT vec_id AS qid,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
                 FROM embeddings WHERE vec_id < 3),
      c AS (SELECT vec_id AS cid,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
            FROM embeddings),
      s AS (SELECT qid, cid,
              round($maxSimOracleScore, 4) AS maxsim
            FROM q, c WHERE qid <> cid),
      r AS (SELECT qid, cid, maxsim,
              cast(row_number() OVER (PARTITION BY qid
                ORDER BY maxsim DESC, cid) AS int) AS rank
            FROM s)
      SELECT qid, cid, maxsim, rank FROM r WHERE rank <= 5
      ORDER BY qid, rank""",
    "qe24_filtered_ann" -> """
      WITH q AS (SELECT vec_id AS qid,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
                 FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id AS cid,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
            FROM embeddings WHERE label % 3 = 0),
      s AS (SELECT qid, cid,
              round(list_cosine_similarity(qv, cv), 4) AS sim
            FROM q, c WHERE qid <> cid),
      r AS (SELECT qid, cid, sim,
              cast(row_number() OVER (PARTITION BY qid
                ORDER BY sim DESC, cid) AS int) AS rank
            FROM s)
      SELECT qid, cid, sim, rank FROM r WHERE rank <= 5
      ORDER BY qid, rank""",
    "qe23_hybrid_rrf" -> """
      WITH toks AS (SELECT doc_id, string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+') AS t
                    FROM documents),
      lexall AS (SELECT doc_id,
                   len(list_filter(t, x -> x IN ('join', 'scan', 'filter')))
                     AS matches
                 FROM toks),
      lex AS (SELECT doc_id, cast(row_number() OVER (
                  ORDER BY matches DESC, doc_id) AS int) AS lex_rank
              FROM lexall ORDER BY matches DESC, doc_id LIMIT 20),
      e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
      p AS (SELECT v AS pv FROM e WHERE vec_id = 0),
      simall AS (SELECT vec_id AS doc_id,
                   round(list_cosine_similarity(v, pv), 4) AS sim
                 FROM e, p WHERE vec_id <> 0),
      vec AS (SELECT doc_id, cast(row_number() OVER (
                  ORDER BY sim DESC, doc_id) AS int) AS vec_rank
              FROM simall ORDER BY sim DESC, doc_id LIMIT 20),
      f AS (SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
              l.lex_rank, v.vec_rank,
              round(coalesce(1.0::DOUBLE / (60 + l.lex_rank), 0.0::DOUBLE)
                + coalesce(1.0::DOUBLE / (60 + v.vec_rank), 0.0::DOUBLE),
                6) AS rrf
            FROM lex l FULL JOIN vec v ON l.doc_id = v.doc_id)
      SELECT doc_id, lex_rank, vec_rank, rrf FROM f
      ORDER BY rrf DESC, doc_id LIMIT 10""",
    "qe22_truncation_recall" -> """
      WITH q AS (SELECT vec_id AS qid,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
                 FROM embeddings WHERE vec_id < 10),
      c AS (SELECT vec_id AS cid,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
            FROM embeddings),
      s AS (SELECT qid, cid,
              round(list_cosine_similarity(qv, cv), 4) AS sim
            FROM q, c WHERE qid <> cid),
      exact AS (SELECT qid, cid FROM (
                  SELECT qid, cid, row_number() OVER (PARTITION BY qid
                    ORDER BY sim DESC, cid) AS rn
                  FROM s) WHERE rn <= 10),
      p AS (SELECT qid, cid,
              round(list_cosine_similarity(
                list_slice(qv, 1, 8), list_slice(cv, 1, 8)), 4) AS psim
            FROM q, c WHERE qid <> cid),
      surv AS (SELECT qid, cid FROM (
                 SELECT qid, cid, row_number() OVER (PARTITION BY qid
                   ORDER BY psim DESC, cid) AS pr
                 FROM p) WHERE pr <= 15),
      rer AS (SELECT s2.qid, s2.cid,
                round(list_cosine_similarity(q.qv, c.cv), 4) AS sim
              FROM surv s2 JOIN q ON q.qid = s2.qid
              JOIN c ON c.cid = s2.cid),
      approx AS (SELECT qid, cid FROM (
                   SELECT qid, cid, row_number() OVER (PARTITION BY qid
                     ORDER BY sim DESC, cid) AS rn
                   FROM rer) WHERE rn <= 10)
      SELECT e.qid AS qid, count(*) AS n_exact, count(a.cid) AS n_hit,
             round(count(a.cid)::DOUBLE / count(*), 4) AS recall
      FROM exact e LEFT JOIN approx a
        ON a.qid = e.qid AND a.cid = e.cid
      GROUP BY e.qid
      ORDER BY e.qid""",
    "qe21_semantic_filter" -> """
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      p AS (SELECT v AS pv FROM e WHERE vec_id = 0),
      s AS (SELECT vec_id,
              round(list_cosine_similarity(v, (SELECT pv FROM p)), 4)
                AS sim
            FROM e)
      SELECT d.doc_id, s.sim, d.lang, d.n_chars
      FROM s JOIN documents d ON d.doc_id = s.vec_id
      WHERE s.sim >= 0.2 AND s.vec_id <> 0
      ORDER BY d.doc_id""",
    "qe20_mmr_diversify" -> ("""
      WITH q AS (SELECT vec_id AS qid,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
                 FROM embeddings WHERE vec_id < 3),
      c AS (SELECT vec_id AS cid,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
            FROM embeddings),
      s AS (SELECT qid, cid,
              round(list_cosine_similarity(qv, cv), 4) AS sim
            FROM q, c WHERE qid <> cid),
      pool AS (SELECT qid, cid, sim FROM (
          SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid
            ORDER BY sim DESC, cid) AS rn FROM s) WHERE rn <= 20),
      pv AS (SELECT pool.qid, pool.cid, pool.sim, c.cv
             FROM pool JOIN c USING (cid)),
      pw AS (SELECT x.qid, x.cid AS a, y.cid AS b,
               round(list_cosine_similarity(x.cv, y.cv), 4) AS d
             FROM pv x JOIN pv y ON x.qid = y.qid AND x.cid <> y.cid),
      r0 AS (SELECT qid, cid, sim, -1.0 AS maxdiv FROM pool),""" +
      (1 to 5).map(mmrStep).mkString(",") + """
      SELECT qid, cid, sim, pick FROM (
        SELECT * FROM p1 UNION ALL SELECT * FROM p2
        UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4
        UNION ALL SELECT * FROM p5)
      ORDER BY qid, pick"""),
    "qe19_hard_negatives" -> """
      WITH q AS (SELECT vec_id AS qid, label AS qlabel,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
                 FROM embeddings WHERE vec_id < 20),
      c AS (SELECT vec_id AS cid, label AS clabel,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
            FROM embeddings),
      s AS (SELECT qid, qlabel, cid, clabel,
              round(list_cosine_similarity(qv, cv), 4) AS sim
            FROM q, c WHERE qid <> cid AND clabel <> qlabel),
      r AS (SELECT qid, qlabel, cid, clabel, sim,
              cast(row_number() OVER (PARTITION BY qid
                ORDER BY sim DESC, cid) AS int) AS rank
            FROM s)
      SELECT qid, qlabel, cid, clabel, sim, rank FROM r WHERE rank <= 5
      ORDER BY qid, rank""",
    "qe15_semdedup" -> """
      WITH e0 AS (SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
             FROM embeddings),
      noisy AS (
        SELECT vec_id + 1000000 AS vec_id,
               list(x * (1.0 + 0.01 * (((i - 1) % 5) - 2)) ORDER BY i) AS dv
        FROM (SELECT vec_id, unnest(dv) AS x,
                generate_subscripts(dv, 1) AS i
              FROM e0 WHERE vec_id < 10)
        GROUP BY vec_id),
      corpus AS (SELECT * FROM e0 UNION ALL SELECT * FROM noisy),
      e AS (SELECT vec_id, dv,
              list_transform(dv,
                x -> CAST(round(x * 100) AS BIGINT)) AS v
            FROM corpus),
      init AS (SELECT v,
                 row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                   vec_id) - 1 AS cell
               FROM e
               QUALIFY cell < 8),
      c0 AS (SELECT cell, v AS s, CAST(1 AS BIGINT) AS n,
               list_inner_product(
                 list_transform(v, x -> CAST(x AS DOUBLE)),
                 list_transform(v, x -> CAST(x AS DOUBLE))) AS ss
             FROM init),
      a1 AS (SELECT vec_id, v, cell FROM (
               SELECT e.vec_id, e.v, c.cell,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   c.ss / CAST(c.n * c.n AS DOUBLE)
                   - 2.0 * list_inner_product(
                       list_transform(e.v, x -> CAST(x AS DOUBLE)),
                       list_transform(c.s, x -> CAST(x AS DOUBLE)))
                     / CAST(c.n AS DOUBLE),
                   c.cell) AS rn
               FROM e CROSS JOIN c0 c) WHERE rn = 1),
      s1 AS (SELECT cell, pos, sum(x) AS sx, count(*) AS cnt
             FROM (SELECT cell, unnest(v) AS x,
                     unnest(generate_series(1, len(v))) AS pos
                   FROM a1)
             GROUP BY cell, pos),
      c1 AS (SELECT cell, s, n,
               list_inner_product(
                 list_transform(s, x -> CAST(x AS DOUBLE)),
                 list_transform(s, x -> CAST(x AS DOUBLE))) AS ss
             FROM (SELECT cell, list(sx ORDER BY pos) AS s,
                     max(cnt) AS n
                   FROM s1 GROUP BY cell)),
      a2 AS (SELECT vec_id, cell FROM (
               SELECT e.vec_id, c.cell,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   c.ss / CAST(c.n * c.n AS DOUBLE)
                   - 2.0 * list_inner_product(
                       list_transform(e.v, x -> CAST(x AS DOUBLE)),
                       list_transform(c.s, x -> CAST(x AS DOUBLE)))
                     / CAST(c.n AS DOUBLE),
                   c.cell) AS rn
               FROM e CROSS JOIN c1 c) WHERE rn = 1),
      dropped AS (SELECT DISTINCT b.vec_id
                  FROM a2 a JOIN a2 b ON a.cell = b.cell
                    AND a.vec_id < b.vec_id
                  JOIN e ea ON ea.vec_id = a.vec_id
                  JOIN e eb ON eb.vec_id = b.vec_id
                  WHERE round(list_cosine_similarity(ea.dv, eb.dv), 4)
                    >= 0.99)
      SELECT a2.vec_id, CAST(a2.cell AS INT) AS cell,
             (d.vec_id IS NULL) AS keep
      FROM a2 LEFT JOIN dropped d ON a2.vec_id = d.vec_id
      ORDER BY a2.vec_id""",
    "qe14_kmeans" -> """
      WITH e AS (SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS v
             FROM embeddings),
      init AS (SELECT v,
                 row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                   vec_id) - 1 AS cell
               FROM e
               QUALIFY cell < 8),
      c0 AS (SELECT cell, v AS s, CAST(1 AS BIGINT) AS n,
               list_inner_product(
                 list_transform(v, x -> CAST(x AS DOUBLE)),
                 list_transform(v, x -> CAST(x AS DOUBLE))) AS ss
             FROM init),
      a1 AS (SELECT vec_id, v, cell FROM (
               SELECT e.vec_id, e.v, c.cell,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   c.ss / CAST(c.n * c.n AS DOUBLE)
                   - 2.0 * list_inner_product(
                       list_transform(e.v, x -> CAST(x AS DOUBLE)),
                       list_transform(c.s, x -> CAST(x AS DOUBLE)))
                     / CAST(c.n AS DOUBLE),
                   c.cell) AS rn
               FROM e CROSS JOIN c0 c) WHERE rn = 1),
      s1 AS (SELECT cell, pos, sum(x) AS sx, count(*) AS cnt
             FROM (SELECT cell, unnest(v) AS x,
                     unnest(generate_series(1, len(v))) AS pos
                   FROM a1)
             GROUP BY cell, pos),
      c1 AS (SELECT cell, s, n,
               list_inner_product(
                 list_transform(s, x -> CAST(x AS DOUBLE)),
                 list_transform(s, x -> CAST(x AS DOUBLE))) AS ss
             FROM (SELECT cell, list(sx ORDER BY pos) AS s,
                     max(cnt) AS n
                   FROM s1 GROUP BY cell)),
      a2 AS (SELECT vec_id, cell FROM (
               SELECT e.vec_id, c.cell,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   c.ss / CAST(c.n * c.n AS DOUBLE)
                   - 2.0 * list_inner_product(
                       list_transform(e.v, x -> CAST(x AS DOUBLE)),
                       list_transform(c.s, x -> CAST(x AS DOUBLE)))
                     / CAST(c.n AS DOUBLE),
                   c.cell) AS rn
               FROM e CROSS JOIN c1 c) WHERE rn = 1)
      SELECT vec_id, CAST(cell AS INT) AS cell FROM a2
      ORDER BY vec_id""",
    "qe18_cluster_sample" -> """
      WITH e AS (SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS v
             FROM embeddings),
      init AS (SELECT v,
                 row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                   vec_id) - 1 AS cell
               FROM e
               QUALIFY cell < 8),
      c0 AS (SELECT cell, v AS s, CAST(1 AS BIGINT) AS n,
               list_inner_product(
                 list_transform(v, x -> CAST(x AS DOUBLE)),
                 list_transform(v, x -> CAST(x AS DOUBLE))) AS ss
             FROM init),
      a1 AS (SELECT vec_id, v, cell FROM (
               SELECT e.vec_id, e.v, c.cell,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   c.ss / CAST(c.n * c.n AS DOUBLE)
                   - 2.0 * list_inner_product(
                       list_transform(e.v, x -> CAST(x AS DOUBLE)),
                       list_transform(c.s, x -> CAST(x AS DOUBLE)))
                     / CAST(c.n AS DOUBLE),
                   c.cell) AS rn
               FROM e CROSS JOIN c0 c) WHERE rn = 1),
      s1 AS (SELECT cell, pos, sum(x) AS sx, count(*) AS cnt
             FROM (SELECT cell, unnest(v) AS x,
                     unnest(generate_series(1, len(v))) AS pos
                   FROM a1)
             GROUP BY cell, pos),
      c1 AS (SELECT cell, s, n,
               list_inner_product(
                 list_transform(s, x -> CAST(x AS DOUBLE)),
                 list_transform(s, x -> CAST(x AS DOUBLE))) AS ss
             FROM (SELECT cell, list(sx ORDER BY pos) AS s,
                     max(cnt) AS n
                   FROM s1 GROUP BY cell)),
      a2 AS (SELECT vec_id, cell FROM (
               SELECT e.vec_id, c.cell,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   c.ss / CAST(c.n * c.n AS DOUBLE)
                   - 2.0 * list_inner_product(
                       list_transform(e.v, x -> CAST(x AS DOUBLE)),
                       list_transform(c.s, x -> CAST(x AS DOUBLE)))
                     / CAST(c.n AS DOUBLE),
                   c.cell) AS rn
               FROM e CROSS JOIN c1 c) WHERE rn = 1)
      SELECT vec_id, CAST(cell AS INT) AS cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY cell
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
        FROM a2) WHERE rk <= 20
      ORDER BY vec_id""",
    "qe17_ood_distance" -> """
      WITH e AS (SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS v
             FROM embeddings),
      init AS (SELECT v,
                 row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                   vec_id) - 1 AS cell
               FROM e
               QUALIFY cell < 8),
      c0 AS (SELECT cell, v AS s, CAST(1 AS BIGINT) AS n,
               list_inner_product(
                 list_transform(v, x -> CAST(x AS DOUBLE)),
                 list_transform(v, x -> CAST(x AS DOUBLE))) AS ss
             FROM init),
      a1 AS (SELECT vec_id, v, cell FROM (
               SELECT e.vec_id, e.v, c.cell,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   c.ss / CAST(c.n * c.n AS DOUBLE)
                   - 2.0 * list_inner_product(
                       list_transform(e.v, x -> CAST(x AS DOUBLE)),
                       list_transform(c.s, x -> CAST(x AS DOUBLE)))
                     / CAST(c.n AS DOUBLE),
                   c.cell) AS rn
               FROM e CROSS JOIN c0 c) WHERE rn = 1),
      s1 AS (SELECT cell, pos, sum(x) AS sx, count(*) AS cnt
             FROM (SELECT cell, unnest(v) AS x,
                     unnest(generate_series(1, len(v))) AS pos
                   FROM a1)
             GROUP BY cell, pos),
      c1 AS (SELECT cell, s, n,
               list_inner_product(
                 list_transform(s, x -> CAST(x AS DOUBLE)),
                 list_transform(s, x -> CAST(x AS DOUBLE))) AS ss
             FROM (SELECT cell, list(sx ORDER BY pos) AS s,
                     max(cnt) AS n
                   FROM s1 GROUP BY cell)),
      a2 AS (SELECT vec_id, cell, score, vv FROM (
               SELECT e.vec_id, c.cell,
                 c.ss / CAST(c.n * c.n AS DOUBLE)
                   - 2.0 * list_inner_product(
                       list_transform(e.v, x -> CAST(x AS DOUBLE)),
                       list_transform(c.s, x -> CAST(x AS DOUBLE)))
                     / CAST(c.n AS DOUBLE) AS score,
                 list_inner_product(
                   list_transform(e.v, x -> CAST(x AS DOUBLE)),
                   list_transform(e.v, x -> CAST(x AS DOUBLE))) AS vv,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   c.ss / CAST(c.n * c.n AS DOUBLE)
                   - 2.0 * list_inner_product(
                       list_transform(e.v, x -> CAST(x AS DOUBLE)),
                       list_transform(c.s, x -> CAST(x AS DOUBLE)))
                     / CAST(c.n AS DOUBLE),
                   c.cell) AS rn
               FROM e CROSS JOIN c1 c) WHERE rn = 1)
      SELECT vec_id, CAST(cell AS INT) AS cell,
             round(sqrt(greatest(vv + score, 0)) / 100.0, 4) AS dist
      FROM a2 ORDER BY vec_id""",
    "qe13_knn_classify" -> """
      WITH q AS (SELECT vec_id AS qid,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
                 FROM embeddings WHERE vec_id % 5 = 0),
      c AS (SELECT vec_id AS cid, label,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
            FROM embeddings WHERE vec_id % 5 <> 0),
      s AS (SELECT qid, cid, label,
              round(list_cosine_similarity(qv, cv), 4) AS sim
            FROM q, c WHERE qid <> cid),
      r AS (SELECT qid, cid, label,
              row_number() OVER (PARTITION BY qid
                ORDER BY sim DESC, cid) AS rank
            FROM s),
      v AS (SELECT qid, label, count(*) AS n_votes
            FROM r WHERE rank <= 5 GROUP BY qid, label),
      p AS (SELECT qid, label, n_votes,
              row_number() OVER (PARTITION BY qid
                ORDER BY n_votes DESC, label) AS pr
            FROM v)
      SELECT qid, cast(label AS int) AS pred_label,
             cast(n_votes AS bigint) AS n_votes
      FROM p WHERE pr = 1 ORDER BY qid""",
    "qe16_truncated_rerank" -> """
      WITH q AS (SELECT vec_id AS qid,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
                 FROM embeddings WHERE vec_id < 10),
      c AS (SELECT vec_id AS cid,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
            FROM embeddings),
      p AS (SELECT qid, cid,
              round(list_cosine_similarity(
                list_slice(qv, 1, 32), list_slice(cv, 1, 32)), 4) AS psim
            FROM q, c WHERE qid <> cid),
      surv AS (SELECT qid, cid FROM (
                 SELECT qid, cid, row_number() OVER (PARTITION BY qid
                   ORDER BY psim DESC, cid) AS pr
                 FROM p) WHERE pr <= 20),
      r AS (SELECT s.qid, s.cid,
              round(list_cosine_similarity(q.qv, c.cv), 4) AS sim
            FROM surv s JOIN q ON q.qid = s.qid JOIN c ON c.cid = s.cid),
      f AS (SELECT qid, cid, sim,
              cast(row_number() OVER (PARTITION BY qid
                ORDER BY sim DESC, cid) AS int) AS rank
            FROM r)
      SELECT qid, cid, sim, rank FROM f WHERE rank <= 5
      ORDER BY qid, rank""",
    "qe01_knn_brute" -> """
      WITH q AS (SELECT vec_id AS qid,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
                 FROM embeddings WHERE vec_id < 10),
      c AS (SELECT vec_id AS cid,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
            FROM embeddings),
      s AS (SELECT qid, cid,
              round(list_cosine_similarity(qv, cv), 4) AS sim
            FROM q, c WHERE qid <> cid),
      r AS (SELECT qid, cid, sim,
              cast(row_number() OVER (PARTITION BY qid
                ORDER BY sim DESC, cid) AS int) AS rank
            FROM s)
      SELECT qid, cid, sim, rank FROM r WHERE rank <= 5
      ORDER BY qid, rank""",
    "qe11_mips" -> """
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      q AS (SELECT vec_id AS qid,
                   list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS qv
            FROM e WHERE vec_id < 10),
      planted AS (
        SELECT qid + 1000000 AS cid,
               list_transform(qv, x -> x * 10.0) AS cv FROM q
        UNION ALL
        SELECT qid + 2000000 AS cid,
               list_transform(qv, x -> x * 9.0) AS cv FROM q),
      c AS (SELECT vec_id AS cid, v AS cv FROM e
            UNION ALL SELECT cid, cv FROM planted),
      s AS (SELECT qid, cid, round(list_inner_product(qv, cv), 4) AS dot
            FROM q, c WHERE qid <> cid),
      hits AS (SELECT * FROM s WHERE dot >= 6.0),
      r AS (SELECT qid, cid, dot,
              cast(row_number() OVER (PARTITION BY qid
                ORDER BY dot DESC, cid) AS int) AS rank
            FROM hits)
      SELECT qid, cid, dot, rank FROM r WHERE rank <= 5
      ORDER BY qid, rank""",
    // identical answer set to qe02 (index-independent by construction)
    "qe10_ann_binary" -> """
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      noisy AS (
        SELECT vec_id + 1000000 AS vec_id,
               list(x * (1.0 + 0.01 * (((i - 1) % 5) - 2)) ORDER BY i) AS v
        FROM (SELECT vec_id, unnest(v) AS x,
                generate_subscripts(v, 1) AS i
              FROM e WHERE vec_id < 10)
        GROUP BY vec_id),
      corpus AS (SELECT * FROM e UNION ALL SELECT * FROM noisy),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
      s AS (SELECT qid, c.vec_id AS cid,
              round(list_cosine_similarity(qv, c.v), 4) AS sim
            FROM q, corpus c WHERE qid <> c.vec_id),
      hits AS (SELECT qid, cid, sim FROM s WHERE sim >= 0.99),
      r AS (SELECT qid, cid, sim,
              cast(row_number() OVER (PARTITION BY qid
                ORDER BY sim DESC, cid) AS int) AS rank
            FROM hits)
      SELECT qid, cid, sim, rank FROM r WHERE rank <= 5
      ORDER BY qid, rank""",
    "qe02_ann_lsh" -> """
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      noisy AS (
        SELECT vec_id + 1000000 AS vec_id,
               list(x * (1.0 + 0.01 * (((i - 1) % 5) - 2)) ORDER BY i) AS v
        FROM (SELECT vec_id, unnest(v) AS x,
                generate_subscripts(v, 1) AS i
              FROM e WHERE vec_id < 10)
        GROUP BY vec_id),
      corpus AS (SELECT * FROM e UNION ALL SELECT * FROM noisy),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
      s AS (SELECT qid, c.vec_id AS cid,
              round(list_cosine_similarity(qv, c.v), 4) AS sim
            FROM q, corpus c WHERE qid <> c.vec_id),
      hits AS (SELECT qid, cid, sim FROM s WHERE sim >= 0.99),
      r AS (SELECT qid, cid, sim,
              cast(row_number() OVER (PARTITION BY qid
                ORDER BY sim DESC, cid) AS int) AS rank
            FROM hits)
      SELECT qid, cid, sim, rank FROM r WHERE rank <= 5
      ORDER BY qid, rank""",
    // identical answer set to qe02 (index-independent by construction)
    // identical answer set to qe05 (index-independent by construction)
    "qe12_ivf_index" -> """
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      noisy AS (
        SELECT vec_id + 1000000 AS vec_id,
               list(x * (1.0 + 0.01 * (((i - 1) % 5) - 2)) ORDER BY i) AS v
        FROM (SELECT vec_id, unnest(v) AS x,
                generate_subscripts(v, 1) AS i
              FROM e WHERE vec_id < 10)
        GROUP BY vec_id),
      corpus AS (SELECT * FROM e UNION ALL SELECT * FROM noisy),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
      s AS (SELECT qid, c.vec_id AS cid,
              round(list_cosine_similarity(qv, c.v), 4) AS sim
            FROM q, corpus c WHERE qid <> c.vec_id),
      hits AS (SELECT qid, cid, sim FROM s WHERE sim >= 0.99),
      r AS (SELECT qid, cid, sim,
              cast(row_number() OVER (PARTITION BY qid
                ORDER BY sim DESC, cid) AS int) AS rank
            FROM hits)
      SELECT qid, cid, sim, rank FROM r WHERE rank <= 5
      ORDER BY qid, rank""",
    "qe05_ann_ivf" -> """
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      noisy AS (
        SELECT vec_id + 1000000 AS vec_id,
               list(x * (1.0 + 0.01 * (((i - 1) % 5) - 2)) ORDER BY i) AS v
        FROM (SELECT vec_id, unnest(v) AS x,
                generate_subscripts(v, 1) AS i
              FROM e WHERE vec_id < 10)
        GROUP BY vec_id),
      corpus AS (SELECT * FROM e UNION ALL SELECT * FROM noisy),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
      s AS (SELECT qid, c.vec_id AS cid,
              round(list_cosine_similarity(qv, c.v), 4) AS sim
            FROM q, corpus c WHERE qid <> c.vec_id),
      hits AS (SELECT qid, cid, sim FROM s WHERE sim >= 0.99),
      r AS (SELECT qid, cid, sim,
              cast(row_number() OVER (PARTITION BY qid
                ORDER BY sim DESC, cid) AS int) AS rank
            FROM hits)
      SELECT qid, cid, sim, rank FROM r WHERE rank <= 5
      ORDER BY qid, rank""",
    "qe07_ann_pq" -> """
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      noisy AS (
        SELECT vec_id + 1000000 AS vec_id,
               list(x * (1.0 + 0.01 * (((i - 1) % 5) - 2)) ORDER BY i) AS v
        FROM (SELECT vec_id, unnest(v) AS x,
                generate_subscripts(v, 1) AS i
              FROM e WHERE vec_id < 10)
        GROUP BY vec_id),
      corpus AS (SELECT * FROM e UNION ALL SELECT * FROM noisy),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
      s AS (SELECT qid, c.vec_id AS cid,
              round(list_cosine_similarity(qv, c.v), 4) AS sim
            FROM q, corpus c WHERE qid <> c.vec_id),
      hits AS (SELECT qid, cid, sim FROM s WHERE sim >= 0.99),
      r AS (SELECT qid, cid, sim,
              cast(row_number() OVER (PARTITION BY qid
                ORDER BY sim DESC, cid) AS int) AS rank
            FROM hits)
      SELECT qid, cid, sim, rank FROM r WHERE rank <= 5
      ORDER BY qid, rank""",
    // identical answer set to qe02/qe05/qe07 (index-independent)
    "qe08_ann_ivfpq" -> """
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      noisy AS (
        SELECT vec_id + 1000000 AS vec_id,
               list(x * (1.0 + 0.01 * (((i - 1) % 5) - 2)) ORDER BY i) AS v
        FROM (SELECT vec_id, unnest(v) AS x,
                generate_subscripts(v, 1) AS i
              FROM e WHERE vec_id < 10)
        GROUP BY vec_id),
      corpus AS (SELECT * FROM e UNION ALL SELECT * FROM noisy),
      q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
      s AS (SELECT qid, c.vec_id AS cid,
              round(list_cosine_similarity(qv, c.v), 4) AS sim
            FROM q, corpus c WHERE qid <> c.vec_id),
      hits AS (SELECT qid, cid, sim FROM s WHERE sim >= 0.99),
      r AS (SELECT qid, cid, sim,
              cast(row_number() OVER (PARTITION BY qid
                ORDER BY sim DESC, cid) AS int) AS rank
            FROM hits)
      SELECT qid, cid, sim, rank FROM r WHERE rank <= 5
      ORDER BY qid, rank""",
    "qe03_cosine_neardup" -> """
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      corpus AS (
        SELECT vec_id, v FROM e
        UNION ALL
        SELECT vec_id + 1000000, v FROM e WHERE vec_id < 20),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              round(list_cosine_similarity(a.v, b.v), 4) AS sim
            FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
      SELECT id_a, id_b, sim FROM p WHERE sim >= 0.95
      ORDER BY id_a, id_b""",
    "qe09_embed_cluster" -> """
      WITH RECURSIVE e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      corpus AS (
        SELECT vec_id, v FROM e
        UNION ALL
        SELECT vec_id + 1000000, v FROM e WHERE vec_id < 20),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              round(list_cosine_similarity(a.v, b.v), 4) AS sim
            FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id),
      pairs AS (SELECT id_a, id_b FROM p WHERE sim >= 0.95),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT src AS id FROM edges),
      reach AS (
        SELECT id, id AS r FROM nodes
        UNION
        SELECT reach.id AS id, ed.dst AS r
        FROM reach JOIN edges ed ON ed.src = reach.r),
      comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
      SELECT cast(component AS BIGINT) AS component,
             cast(count(*) AS BIGINT) AS n_members,
             cast(sum(CASE WHEN id <> component THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped
      FROM comp GROUP BY component ORDER BY component""",
    "qe06_quantize" -> """
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      s AS (SELECT vec_id, v,
              greatest(list_max(list_transform(v, x -> abs(x))), 1e-30)
                / 127 AS scale
            FROM e),
      q AS (SELECT vec_id, v, scale,
              list_transform(v, x -> CAST(least(greatest(
                round(x / scale), -127), 127) AS INTEGER)) AS qv
            FROM s)
      SELECT vec_id,
             round(scale, 6) AS scale,
             CAST(list_aggregate(qv, 'sum') AS BIGINT) AS sum_q,
             CAST(len(list_filter(qv, x -> abs(x) = 127)) AS INTEGER) AS n_sat,
             round(sqrt(list_aggregate(list_transform(v, x ->
               pow(x - CAST(least(greatest(round(x / scale), -127), 127)
                 AS DOUBLE) * scale, 2)), 'sum') / len(v)), 6) AS rmse
      FROM q ORDER BY vec_id""",
    "qe04_embedding_stats" -> """
      WITH m AS (SELECT label,
                   sqrt(list_aggregate(
                     list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
                     'sum')) AS nrm,
                   CAST(embedding[1] AS DOUBLE) AS d0
                 FROM embeddings)
      SELECT label, count(*) AS n, round(avg(nrm), 4) AS avg_norm,
             round(avg(d0), 4) AS avg_d0
      FROM m GROUP BY label ORDER BY label"""
  )
}
