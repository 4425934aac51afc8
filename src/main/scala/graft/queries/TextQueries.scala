package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFunctions => TF}
import graft.operators.Dedup

/** Text-analysis + deduplication surface over the `documents` table:
  * token/quality/language statistics, exact & normalized dedup, and the
  * sketch family (MinHash+LSH, SimHash, exact n-gram Jaccard,
  * winnowing fingerprints).
  *
  * Sketch queries run over a planted corpus: `documents` plus
  * deterministic near-duplicate copies (doc_id + 1_000_000, text +
  * a short tail). Every sketch query is sketch-then-verify: the sketch
  * generates candidates, EXACT n-gram Jaccard filters them, and the
  * DuckDB oracle recomputes the exact measure over all pairs — so a
  * recall miss in any candidate generator fails the hash-match gate.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Persisted corpus-LM count tables for the documents table —
    * trained once per corpus (build-if-stale), shared by
    * qt34/qt36/qt39/qt53 instead of each query rebuilding them.
    */
  private def lmArtifact(s: SparkSession, dir: String): String =
    graft.operators.Perplexity.ensureLm(docs(s, dir), "text",
      graft.lake.Artifacts.workRoot(dir) + "/lm_documents",
      graft.lake.Artifacts.sourceFingerprint(s"$dir/documents.parquet"))

  /** Persisted 3-round BPE tokenizer for the documents table — trained
    * once per corpus, shared by qt35/qt48 (qt32 IS the training query
    * and stays a from-scratch run).
    */
  private def bpeArtifact(
      s: SparkSession, dir: String): graft.operators.BpeMerges.Trained =
    graft.operators.BpeMerges.ensureTrained(docs(s, dir), "text",
      rounds = 3,
      graft.lake.Artifacts.workRoot(dir) + "/tokenizer_documents_r3",
      graft.lake.Artifacts.sourceFingerprint(s"$dir/documents.parquet"))

  /** Persisted verified near-dup pairs of the planted corpus — the
    * LSH(128/32/3) → exact-Jaccard(n=3) ≥ 0.8 chain that qt07, qt18,
    * qt52 and qt56 all start from, computed ONCE per corpus (the same
    * build-if-stale artifact discipline as the tokenizer/LM): the
    * first chain query pays the sketch-and-verify cost, the rest load
    * the pairs-sized parquet. Stored jaccard doubles round-trip
    * bit-exact, so every downstream oracle is unchanged.
    */
  private def verifiedPairsArtifact(
      s: SparkSession, dir: String): DataFrame = {
    val path = graft.lake.Artifacts.workRoot(dir) + "/verified_pairs_planted"
    graft.lake.Artifacts.ensure(path,
      "pairs;mh128;b32;sh3;n3;j0.8;src=" +
        graft.lake.Artifacts.sourceFingerprint(s"$dir/documents.parquet")) {
      val corpus = planted(s, dir)
      val cands = Dedup.minhashLshCandidates(corpus, "doc_id", "text",
        numHashes = 128, bands = 32, shingle = 3)
      Dedup.exactJaccardFor(cands, corpus, "doc_id", "text", n = 3,
          minJaccard = 0.8)
        .where(col("jaccard") >= 0.8)
        .write.mode("overwrite").parquet(s"$path/pairs")
    }
    s.read.parquet(s"$path/pairs")
  }

  /** documents ∪ near-duplicate copies of doc_id < 100. */
  private def planted(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).where(col("doc_id") < 2000)
      .select("doc_id", "text")
    val dupes = base.where(col("doc_id") < 100)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" near duplicate tail marker")).as("text"))
    base.unionByName(dupes)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace + BPE-ish subword proxy.
    "qt01_token_stats" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        TF.tokenCount(col("text")).as("n_tokens"),
        TF.wordPieceCount(col("text")).as("n_pieces"),
        round(length(regexp_replace(col("text"), "\\s", ""))
          .cast("double") / TF.tokenCount(col("text")), 4).as("mean_tok_len"))
        .orderBy("doc_id")
    }),

    // Quality scoring: stopword density, punctuation ratio, composite.
    "qt02_quality" -> ((s, dir) => {
      docs(s, dir).select(
        col("doc_id"),
        round(TF.stopwordRatio(col("text"), TF.EnStopwords), 4).as("stop_ratio"),
        round(TF.punctRatio(col("text")), 4).as("punct_ratio"),
        round(TF.qualityScore(col("text")), 4).as("quality"))
        .orderBy("doc_id")
    }),

    // Language ID (stopword-density argmax) vs the labeled lang column.
    "qt03_langid" -> ((s, dir) => {
      docs(s, dir)
        .select(col("lang"), TF.langId(col("text")).as("pred"))
        .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred")
    }),

    // Exact dedup: one shuffle on the md5 digest.
    "qt04_dedup_exact" -> ((s, dir) => {
      Dedup.exact(planted(s, dir), "doc_id", "text")
        .orderBy("content_hash")
    }),

    // Normalized dedup (lower/trim/collapse-whitespace first).
    "qt05_dedup_norm" -> ((s, dir) => {
      Dedup.normalized(
        planted(s, dir).withColumn("text",
          when(col("doc_id") % 2 === 0, upper(col("text")))
            .otherwise(concat(lit("  "), col("text")))),
        "doc_id", "text")
        .orderBy("content_hash")
    }),

    // Winnowing fingerprints (custom codegen'd Catalyst expression) as
    // the candidate generator, verified by EXACT n-gram Jaccard — the
    // sketch-then-verify shape every 100 TB dedup pipeline uses. The
    // output is exact set math, so the DuckDB oracle reproduces it
    // fully; the fingerprint stage must recall every >= 0.8 pair for
    // the hashes to match (a real recall gate, not rows-only).
    "qt06_fingerprint" -> ((s, dir) => {
      val corpus = planted(s, dir)
      // maxDf=50 measured against exact truth on the LARGEST corpus
      // this query can see (planted() clamps doc_id < 2000, so sf0.1's
      // 2100 docs is the worst case): 0 recall misses, 4x fewer
      // candidate pairs than df=100. The small-vocabulary corpus makes
      // winnowing over-produce — common fingerprints carry no signal.
      val cands = Dedup.winnowCandidates(corpus, "doc_id", "text",
        k = 8, w = 16, maxDf = 50)
      Dedup.exactJaccardFor(cands, corpus, "doc_id", "text", n = 3,
          minJaccard = 0.8)
        .where(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // MinHash + LSH banding as the candidate generator (128 hashes × 32
    // bands: P(miss at j=0.8) = (1-0.8^4)^32 ≈ 5e-8), verified by exact
    // n-gram Jaccard — same recall-gated oracle design as qt06.
    "qt07_minhash_lsh" -> ((s, dir) => {
      verifiedPairsArtifact(s, dir)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // SimHash + pigeonhole (8 blocks ⇒ exhaustive for Hamming <= 7) as
    // the candidate generator, verified by exact n-gram Jaccard at the
    // 0.95 threshold the Hamming-7 ball safely covers (measured: max
    // hamming among j>=0.95 pairs is 6 at sf0.01).
    "qt08_simhash" -> ((s, dir) => {
      val corpus = planted(s, dir)
      val cands = Dedup.simhashPairs(corpus, "doc_id", "text",
          maxHamming = 7, blocks = 8)
        .select("id_a", "id_b")
      Dedup.exactJaccardFor(cands, corpus, "doc_id", "text", n = 3,
          minJaccard = 0.95)
        .where(col("jaccard") >= 0.95)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // Benchmark decontamination: flag corpus documents containing
    // >= 80% of a "benchmark" doc's 3-grams (bench = base docs
    // doc_id < 50; the planted near-dup copies MUST be flagged at
    // containment 1.0). Bench postings broadcast; corpus streams
    // map-side — the 100 TB decontamination shape.
    "qt13_decontaminate" -> ((s, dir) => {
      val corpus = planted(s, dir)
      val bench = docs(s, dir).where(col("doc_id") < 50)
        .select("doc_id", "text")
      Dedup.containmentPairs(corpus, bench, "doc_id", "text",
          n = 3, threshold = 0.8)
        .select(col("corpus_id"), col("bench_id"),
          round(col("containment"), 4).as("containment"))
        .orderBy("corpus_id", "bench_id")
    }),

    // Contamination audit (GPT-3 appx C "dirty" fraction): per eval
    // doc, the share of its distinct 3-grams present anywhere in the
    // training corpus. The corpus keeps planted near-copies of eval
    // docs 25-49 (those audit fully dirty, 1.0) but NOT of 0-24,
    // whose fractions fall to the honest template-overlap level — the
    // split a real audit is run to find. Counts are integers over the
    // corpus-wide distinct-gram join, so the oracle replays exactly.
    "qt38_contamination" -> ((s, dir) => {
      val corpus = planted(s, dir).where(col("doc_id") >= 50 &&
        (col("doc_id") < 1000000 || col("doc_id") >= 1000025))
      val bench = docs(s, dir).where(col("doc_id") < 50)
        .select("doc_id", "text")
      graft.operators.Dedup.contaminationReport(corpus, bench,
          "doc_id", "text", n = 3)
        .orderBy("bench_id")
    }),

    // Repetition-quality metrics (Gopher-style): most-frequent-token
    // and most-frequent-bigram counts per document via the sorted-run
    // trick — everything is row-local higher-order-function work inside
    // the scan projection (no explode, no shuffle), which is the only
    // shape that survives a 100 TB corpus. The oracle recomputes the
    // mode counts the expensive way (unnest + group by).
    "qt17_repetition" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"),
        TF.tokens(col("text")).as("t"))
        .select(col("doc_id"), col("t"), TF.bigrams(col("t")).as("b"))
        .select(col("doc_id"),
          size(col("t")).as("nt"),
          size(array_distinct(col("t"))).as("nd"),
          TF.topElementCount(col("t")).as("toptok"),
          TF.topElementCount(col("b")).as("topbg"))
      base.select(col("doc_id"),
          col("nt").cast("bigint").as("n_tokens"),
          col("nd").cast("bigint").as("n_distinct"),
          col("toptok").cast("bigint").as("top_token_n"),
          col("topbg").cast("bigint").as("top_bigram_n"),
          round(col("nd").cast("double") / col("nt"), 4).as("distinct_ratio"),
          round(col("toptok").cast("double") / col("nt"), 4).as("top_token_frac"))
        .orderBy("doc_id")
    }),

    // Bloom-prefiltered decontamination: same semantics as qt13 but at
    // 4-grams/0.7, with the corpus pass reduced to a zero-shuffle
    // map-side bloom probe before the exact containment join. The
    // oracle recomputes containment exactly with NO bloom — a bloom
    // false NEGATIVE (impossible) or an unsound prefilter bound would
    // break the hash match.
    "qt16_bloom_decontam" -> ((s, dir) => {
      val corpus = planted(s, dir)
      val bench = docs(s, dir).where(col("doc_id") < 50)
        .select("doc_id", "text")
      Dedup.bloomDecontaminate(s, corpus, bench, "doc_id", "text",
          n = 4, threshold = 0.7)
        .select(col("corpus_id"), col("bench_id"),
          round(col("containment"), 4).as("containment"))
        .orderBy("corpus_id", "bench_id")
    }),

    // PII scrubbing: plant a deterministic email + IPv4 per document,
    // redact with the standard regex classes, report counts + the
    // digest of the redacted text. DuckDB recomputes with the same
    // RE2-compatible patterns — a single missed or extra redaction
    // anywhere in 500 documents breaks the hash.
    "qt12_pii_redact" -> ((s, dir) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
      val t = concat(col("text"),
        lit(" user"), col("doc_id"), lit("@example.com contact 10."),
        col("doc_id") % 256, lit("."),
        floor(col("doc_id") / 256).cast("int") % 256, lit(".7"))
      docs(s, dir).select(col("doc_id"), t.as("t"))
        .select(col("doc_id"),
          regexp_count(col("t"), lit(email)).cast("bigint").as("n_emails"),
          regexp_count(
            regexp_replace(col("t"), email, "<EMAIL>"), lit(ip))
            .cast("bigint").as("n_ips"),
          md5(regexp_replace(
            regexp_replace(col("t"), email, "<EMAIL>"), ip, "<IP>"))
            .as("redacted_digest"))
        .orderBy("doc_id")
    }),

    // Unicode NFC canonicalization (custom codegen'd Expression —
    // Spark has no normalizer). Input is text + a planted NFD suffix
    // (e + combining acute); the oracle is DuckDB's own nfc_normalize,
    // so composition, byte length, and digest must all agree exactly.
    "qt11_unicode_nfc" -> ((s, dir) => {
      val normed = graft.functions.UnicodeFns.nfcNormalize(s,
        concat(col("text"), lit(" cafe\u0301")))
      docs(s, dir).select(col("doc_id"),
          md5(normed).as("digest"),
          octet_length(normed).cast("bigint").as("n_bytes"))
        .orderBy("doc_id")
    }),

    // Deterministic stratified sampling + frozen train/eval split
    // (operators/Sampling.scala): membership is a pure function of
    // md5(id), so the DuckDB oracle reproduces the EXACT row set —
    // the property seeded-RNG sampling cannot give. Thresholds are
    // picked power-of-two so both engines compare exactly.
    "qt10_stratified_sample" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id", "lang")
      val sampled = graft.operators.Sampling.stratified(
        d, "doc_id", "lang", Map("en" -> 0.5, "de" -> 0.25), default = 1.0)
      graft.operators.Sampling.withSplit(sampled, "doc_id", 0.25)
        .select(col("doc_id"), col("lang"), col("is_eval"))
        .orderBy("doc_id")
    }),

    // TF-IDF characteristic terms: top-3 per document, ranked by the
    // rounded score with an integer (tf, df, term) tiebreak so the
    // top-k is platform-exact (see operators/TfIdf.scala); the oracle
    // recomputes term/document frequencies and scores from scratch.
    "qt14_tfidf" -> ((s, dir) => {
      graft.operators.TfIdf.topTerms(docs(s, dir), "doc_id", "text", k = 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          round(col("score"), 4).as("score"))
        .orderBy("doc_id", "term")
    }),

    // Sequence packing: global prefix sum of token counts (two-pass
    // range-partitioned — operators/Packing.scala, NO single-partition
    // window) cut into 2048-token training blocks. The oracle
    // reproduces it with an ordinary window sum, so partition-offset
    // bookkeeping must be exact to the row.
    "qt15_seq_pack" -> ((s, dir) => {
      val d = docs(s, dir)
        .select(col("doc_id"), TF.tokenCount(col("text")).as("n_tokens"))
      graft.operators.Packing.pack(d, "doc_id", "n_tokens", budget = 2048)
        .select(col("doc_id"), col("n_tokens"), col("tokens_before"),
          col("block_id").cast("bigint").as("block_id"), col("n_blocks"))
        .orderBy("doc_id")
    }),

    // Cluster-forming dedup: the END of the sketch pipeline. LSH emits
    // candidate PAIRS, exact Jaccard verifies them, and connected
    // components (operators/Components.scala — iterative min-label
    // propagation over the id-only verified edge list) turns pairs
    // into keep/drop GROUPS: a chain a–b, b–c is ONE cluster even
    // though (a,c) never collided in any band. Output is one row per
    // cluster: representative (min id), size, and drop count. The
    // oracle recomputes the exact pair list and closes it transitively
    // with a recursive CTE — a label-propagation bug (missed merge,
    // early exit before convergence) breaks the hash.
    "qt18_cluster_dedup" -> ((s, dir) => {
      val verified = verifiedPairsArtifact(s, dir).select("id_a", "id_b")
      val labeled = graft.operators.Components.connectedComponents(verified)
      graft.operators.Components.componentStats(labeled)
        .select(col("component"), col("n_members"), col("n_dropped"))
        .orderBy("component")
    }),

    // Exact n-gram Jaccard pairs — fully oracle-checkable (exact set
    // math, no sketching).
    "qt09_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(planted(s, dir), "doc_id", "text",
          n = 3, threshold = 0.5, maxDf = 100)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // Unigram corpus-frequency score (the vocab-free stand-in for
    // CCNet's KenLM perplexity filter): integer-only aggregates plus
    // one final division, so the oracle matches bit-for-bit.
    "qt20_unigram_freq" -> ((s, dir) => {
      graft.operators.TfIdf.unigramFreqScore(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Deterministic global corpus shuffle: md5(seed‖id) permutation,
    // globally numbered by the two-pass distributed rank (no single-
    // partition window). The oracle's plain row_number() over the same
    // key must agree position-for-position — any offset bookkeeping
    // error in DistributedRank breaks the hash.
    "qt21_corpus_shuffle" -> ((s, dir) => {
      graft.operators.Sampling.shuffled(
          docs(s, dir).select("doc_id"), "doc_id", seed = "42")
        .select(col("doc_id"), col("shuffle_pos"))
        .orderBy("doc_id")
    }),

    // Passage-level dedup (CCNet/Gopher duplicate-passage-fraction
    // filter): 20-word windows hashed and matched across documents.
    // Planted near-copies share every passage but the mutated tail, so
    // their dup_ratio is high while unrelated docs stay near zero —
    // the oracle recomputes the exact chunking, a window-boundary bug
    // breaks the hash.
    "qt19_passage_dedup" -> ((s, dir) => {
      Dedup.passageDuplication(planted(s, dir), "doc_id", "text",
          window = 20)
        .select(col("doc_id"), col("n_passages"), col("n_dup_passages"),
          col("dup_ratio"))
        .orderBy("doc_id")
    }),

    // Sliding-window chunking (training sequences / RAG passages):
    // row-local posexplode over window starts, chunk content pinned by
    // md5 — the oracle re-chunks from scratch, so an off-by-one in
    // window starts, tail length, or slice bounds breaks the hash.
    "qt22_chunking" -> ((s, dir) => {
      graft.operators.Chunking.slidingChunks(docs(s, dir), "doc_id",
          "text", chunkSize = 32, stride = 16)
        .orderBy("doc_id", "chunk_id")
    }),

    // Content-defined chunking: boundaries anchored to token-hash
    // content (1/16 bucket → ~16-token chunks), so edits shift only
    // their own chunk — the dedup-robust complement of qt22's fixed
    // stride. The oracle recomputes boundary flags, running chunk ids,
    // and position-ordered chunk hashes from scratch.
    "qt29_cdc_chunking" -> ((s, dir) => {
      graft.operators.Chunking.contentDefinedChunks(docs(s, dir),
          "doc_id", "text", divisor = 16)
        .orderBy("doc_id", "chunk_id")
    }),

    // Corpus-LM perplexity scoring (CCNet-style quality filter; add-1
    // unigram LM trained on the corpus itself, so the operator is
    // closed over its input). All counts are exact integers — only the
    // final mean/exp are floating point, so the 4dp round is engine-
    // stable and the oracle reproduces every score. The LM count
    // tables are a persisted lake artifact (Perplexity.ensureLm):
    // qt34/qt36/qt39/qt53 share ONE training pass per corpus instead
    // of each rebuilding the counts.
    "qt34_perplexity" -> ((s, dir) => {
      graft.operators.Perplexity.applyWith(docs(s, dir), "doc_id",
          "text", lmArtifact(s, dir))
        .orderBy("doc_id")
    }),

    // Bigram-LM scoring: the second-order companion to qt34 —
    // transitions built map-side from each doc's token array (no
    // window), model = the persisted transition counts + their
    // re-aggregate, scores reproduced exactly by the oracle from the
    // same counts.
    "qt39_bigram_lm" -> ((s, dir) => {
      graft.operators.Perplexity.bigramWith(docs(s, dir), "doc_id",
          "text", lmArtifact(s, dir))
        .orderBy("doc_id")
    }),

    // Topic cells over hashed document vectors: feature-hashed
    // bag-of-tokens (TextVectors.hashed, md5-bucket counts — exact
    // integers) fed to distributed k-means — the embedding-free
    // corpus-clustering chain. The oracle rebuilds the vectors and
    // replays both Lloyd rounds in SQL.
    "qt37_topic_cells" -> ((s, dir) => {
      val v = graft.operators.TextVectors.hashed(docs(s, dir),
        "doc_id", "text", dim = 64)
      graft.operators.KMeans.assign(v, "doc_id", "vector",
          k = 8, iters = 2, scale = 1)
        .orderBy("doc_id")
    }),

    // CCNet head/middle/tail split: per-language perplexity terciles
    // via the grouped distributed ntile (DistributedRank.ntileBy — one
    // global range-partitioned rank, never a per-language task). Ties
    // rank by doc_id, so the exact tercile boundaries are engine-
    // stable and the oracle replays the whole split with SQL ntile.
    "qt36_ccnet_buckets" -> ((s, dir) => {
      graft.operators.Perplexity.buckets(docs(s, dir), "doc_id",
          "text", "lang", lmPath = Some(lmArtifact(s, dir)))
        .orderBy("doc_id")
    }),

    // Weighted sampling without replacement (Efraimidis–Spirakis
    // A-ES): length-weighted per-source top-10, deterministic keys
    // from md5(id) so the oracle reproduces the exact draw. The
    // grouped rank filter compiles to WindowGroupLimit (per-mapper
    // partial top-k — plan pinned by PlanAuditSpec).
    "qt33_weighted_sample" -> ((s, dir) => {
      graft.operators.Sampling.weightedSample(
          docs(s, dir), "doc_id", "n_chars", k = 10,
          strataCol = Some("source"))
        .select("doc_id", "source", "n_chars")
        .orderBy("source", "doc_id")
    }),

    // Distributed BPE merge training (Sennrich et al.): one corpus
    // pass to the word-frequency vocabulary, then vocabulary-sized
    // merge rounds — pair-count aggregate, one-row argmax, literal
    // replace over double-separator-joined symbol strings (boundary-
    // safe AND leftmost-greedy, identical semantics in DuckDB, which
    // is what lets the oracle replay all 3 rounds unrolled).
    "qt32_bpe_merges" -> ((s, dir) => {
      graft.operators.BpeMerges(docs(s, dir), "text", rounds = 3)
        .orderBy("merge_rank")
    }),

    // BPE corpus encoding: apply qt32's trained merges back to the
    // corpus for per-document token counts — the tokenize step between
    // quality filtering and sequence packing. Greedy merge application
    // runs once per DISTINCT word (the trained vocabulary already
    // carries every merge applied); the corpus side only explodes to
    // (doc, word) and joins the vocabulary-sized lookup. The oracle
    // replays the 3 merge rounds on the vocabulary exactly like qt32,
    // then reproduces the join + roll-up.
    "qt35_bpe_encode" -> ((s, dir) => {
      graft.operators.BpeEncode(docs(s, dir), "doc_id", "text",
          bpeArtifact(s, dir))
        .orderBy("doc_id")
    }),

    // C4 + Gopher quality rule pack: every published web-corpus gate
    // as a named column with its published threshold, plus the papers'
    // keep conjunctions — one codegen'd projection over the scan. The
    // oracle recomputes every rule from scratch in SQL. On the
    // synthetic word-soup corpus the per-gate columns split (n_words
    // passes 55%, mean_word_len varies 3.7-5.3) while both
    // conjunctions are honestly all-false (vocabulary contains only
    // 'the' from Gopher's 8 required stopwords; no terminal
    // punctuation for C4) — published thresholds are not bent to
    // manufacture a prettier split.
    "qt31_quality_rules" -> ((s, dir) => {
      graft.functions.QualityRules(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Exact substring dedup (Lee et al. ExactSubstr, distributed as
    // hash-shuffled k-gram postings instead of a monolithic suffix
    // array): every non-first occurrence of a duplicated 8-token span
    // is cut from its document. The planted full-doc copies lose their
    // entire base text (the originals keep theirs); template-repeated
    // sentences across base docs are cut too. The oracle recomputes
    // first-occurrence ranks and coverage from scratch and must
    // reproduce the exact cleaned strings.
    "qt30_substring_dedup" -> ((s, dir) => {
      graft.operators.Dedup.substringDedup(planted(s, dir),
          "doc_id", "text", k = 8)
        .orderBy("doc_id")
    }),

    // Temperature-scaled source mixing (α-sampling): the uniform
    // synthetic sources are folded into a skewed 3-domain split so the
    // per-domain rates genuinely differ and the min(1, ·) cap fires for
    // the small domains. Membership is the deterministic md5 unit, and
    // the weight total is an ORDERED sum, so the oracle reproduces the
    // exact row set (see Sampling.temperatureMixture).
    "qt23_mixture_sample" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("dom",
        when(col("source").isin("src0", "src1"), col("source"))
          .otherwise(lit("tail")))
      graft.operators.Sampling.temperatureMixture(d, "doc_id", "dom",
          alpha = 0.5, budget = 250)
        .select(col("doc_id"), col("dom"))
        .orderBy("doc_id")
    }),

    // Character-entropy quality metric (gibberish / byte-noise
    // detector): row-local sorted-run aggregate, no character explode.
    // The oracle recomputes H from the per-character frequency table —
    // the two derivations agree only if the run-length accumulation is
    // exactly the frequency table, so an off-by-one in run flushing
    // breaks the hash.
    "qt27_char_entropy" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
          length(col("text")).as("n_chars"),
          round(TF.charEntropy(col("text")), 4).as("entropy"))
        .orderBy("doc_id")
    }),

    // Corpus-wide top-k terms, sketch-then-verify: Misra–Gries bounds
    // every shuffle at sketch-capacity rows, exact counting of the
    // candidate superset makes the ranking sketch-independent — the
    // oracle computes the full exact top-k, so a recall miss in the
    // sketch (a top-20 term absent from the candidates) breaks the
    // match, same gate design as the dedup sketches.
    "qt24_heavy_hitters" -> ((s, dir) => {
      graft.operators.HeavyHitters.topK(docs(s, dir), "text",
          k = 20, capacity = 256)
        .orderBy("rank")
    }),

    // DSIR importance weights: target = the English subset, raw = the
    // whole corpus. Every distribution statistic is an integer count,
    // so the per-bucket log-ratios are engine-exact; the oracle
    // re-derives grams, buckets, and smoothing from scratch — a
    // tokenizer, hash, or smoothing mismatch breaks the hash.
    "qt25_dsir_weights" -> ((s, dir) => {
      graft.operators.Dsir.importanceWeights(docs(s, dir), "doc_id",
          "text", targetPred = col("lang") === "en", buckets = 256)
        .orderBy("doc_id")
    }),

    // Per-source KL divergence over hashed-unigram buckets: the corpus
    // drift monitor. Integer counts → smoothed grid-complete KL; the
    // oracle rebuilds the full source×bucket grid, so dropping
    // zero-count buckets (understating divergence) breaks the hash.
    "qt28_source_divergence" -> ((s, dir) => {
      graft.operators.Dsir.sourceDivergence(docs(s, dir), "source",
          "text", buckets = 128)
        .orderBy("source")
    }),

    // End-to-end export manifest: deterministic corpus shuffle →
    // distributed prefix-sum pack in shuffle order → per-block
    // manifest. Composes three oracle-gated operators in series; the
    // oracle replays the whole chain with plain window SQL, so an
    // ordering or offset bug anywhere in the pipeline breaks the hash.
    "qt26_export_manifest" -> ((s, dir) => {
      val toks = docs(s, dir).select(col("doc_id"),
        TF.tokenCount(col("text")).as("n_tokens"))
      val ordered = graft.operators.Sampling.shuffled(toks, "doc_id",
        seed = "42")
      val packed = graft.operators.Packing.pack(ordered, "shuffle_pos",
        "n_tokens", budget = 2048)
      packed.groupBy("block_id").agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").as("block_tokens"),
          min("shuffle_pos").as("first_pos"),
          max("shuffle_pos").as("last_pos"))
        .orderBy("block_id")
    }),

    // Seed-labeled Naive Bayes quality classifier: src0–src2 as the
    // curated seed corpus, multinomial NB with add-1 smoothing over
    // whitespace tokens, per-doc log-odds. Every count is an exact
    // integer; only the final ln/sum are floating point, so the 4dp
    // round is engine-stable (NaiveBayes scaladoc).
    "qt40_nb_quality" -> ((s, dir) => {
      graft.operators.NaiveBayes.scoreBySeed(docs(s, dir), "doc_id",
          "text", col("source").isin("src0", "src1", "src2"))
        .orderBy("doc_id")
    }),

    // Padding-waste report for pad-to-bucket-max batching: width-32
    // token buckets per language, exact integer waste arithmetic
    // (Batching scaladoc). One map-side length pass + one shuffle.
    "qt41_length_buckets" -> ((s, dir) => {
      graft.operators.Batching.lengthBuckets(
          docs(s, dir), TF.tokenCount(col("text")), col("lang"),
          width = 32)
        .withColumnRenamed("group", "lang")
        .orderBy("lang", "bucket_lo")
    }),

    // Lexical-diversity corpus health: type-token ratio and hapax
    // share per source (TfIdf.vocabStats scaladoc). The per-token
    // shuffle is the map-side-combined (group, term) count.
    "qt42_vocab_growth" -> ((s, dir) => {
      graft.operators.TfIdf.vocabStats(docs(s, dir), "doc_id", "text",
          "source")
        .withColumnRenamed("group", "source")
        .orderBy("source")
    }),

    // Cross-source 3-gram overlap matrix: distinct-gram Jaccard per
    // source pair — which sources are the same data
    // (Dsir.sourceOverlap scaladoc).
    "qt43_source_overlap" -> ((s, dir) => {
      graft.operators.Dsir.sourceOverlap(docs(s, dir), "source", "text")
        .orderBy("s1", "s2")
    }),

    // Incremental dedup against a persisted digest index: accept only
    // rows whose content digest is new relative to the already-indexed
    // history (Dedup.buildDigestIndex scaladoc) — the near-dup copies
    // survive (tail-modified text), exact re-sends do not.
    "qt44_incremental_dedup" -> ((s, dir) => {
      val root = s"${sys.props("java.io.tmpdir")}/graft_work/" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "/qt44_idx"
      Dedup.buildDigestIndex(
        docs(s, dir).where(col("doc_id") < 300), "text", root)
      Dedup.filterAgainstIndex(planted(s, dir), "text", root)
        .select(col("doc_id"), md5(col("text")).as("content_hash"))
        .orderBy("doc_id")
    }),

    // RefinedWeb-style per-domain cap: each (source, lang) stratum
    // keeps its 3 longest documents (n_chars desc, doc_id tiebreak).
    // WindowGroupLimit prunes to 3 per mapper before the shuffle —
    // PlanAuditSpec pins it.
    "qt45_domain_cap" -> ((s, dir) => {
      graft.operators.Sampling.groupCap(docs(s, dir),
          Seq("source", "lang"),
          Seq(col("n_chars").desc, col("doc_id").asc), n = 3)
        .select(col("doc_id"), col("source"), col("lang"),
          col("n_chars"), col("cap_rank"))
        .orderBy("source", "lang", "cap_rank")
    }),

    // Length-based curriculum order: global training positions sorted
    // by length band (short documents first), pseudo-randomly shuffled
    // within a band by md5 — integer-exact banding (n_chars div 200,
    // capped at 4), global numbering via the two-pass DistributedRank
    // (never a single-partition window).
    "qt46_curriculum" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        least(lit(4L), floor(col("n_chars") / 200)).as("band"),
        substring(md5(concat(lit("cur:"), col("doc_id").cast("string"))),
          1, 8).as("__hx"))
      graft.operators.DistributedRank.withGlobalRowNumber(d,
          Seq(col("band").asc, col("__hx").asc, col("doc_id").asc))
        .select(col("doc_id"), col("band"), col("__rn").as("pos"))
        .orderBy("doc_id")
    }),

    // Per-document 3-gram novelty: fraction of a doc's distinct grams
    // that exist nowhere else in the corpus (df = 1). Two streaming
    // map-side evaluations of the postings projection — the
    // substringDedup trade, pinned at 2 scans by PlanAuditSpec.
    "qt47_ngram_novelty" -> ((s, dir) => {
      Dedup.noveltyScore(docs(s, dir), "doc_id", "text", n = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Tokenizer fertility per language: BPE tokens per word and the
    // corpus-level token counts, from the SAME persisted 3-round
    // tokenizer as qt35 (bpeArtifact — encode-only cost here, no
    // retraining) — the "how expensive is each language to train on"
    // report multilingual recipes start from.
    "qt48_fertility" -> ((s, dir) => {
      graft.operators.BpeEncode(docs(s, dir), "doc_id", "text",
          bpeArtifact(s, dir))
        .join(docs(s, dir).select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(sum("n_words").as("n_words"),
          sum("n_tokens").as("n_tokens"),
          round(sum("n_tokens").cast("double") / sum("n_words"), 4)
            .as("fertility"))
        .orderBy("lang")
    }),

    // Epoch mixing with fractional repeats (LLaMA-recipe style):
    // even-numbered sources run 1.5 epochs, odd 0.75 — copies =
    // floor(w) + a deterministic md5 coin for the fraction. Reported
    // as per-source realized expansion (dyadic weights make the coin
    // threshold integer-exact in 32-bit hash space, so the oracle
    // reproduces every copy decision).
    "qt49_source_epochs" -> ((s, dir) => {
      val d = docs(s, dir)
      val weighted = d.withColumn("__w",
        when(regexp_extract(col("source"), "(\\d+)", 1).cast("int")
          % 2 === 0, lit(1.5)).otherwise(lit(0.75)))
      val mixed = graft.operators.Sampling.epochMix(
        weighted, "doc_id", "__w")
      val emitted = mixed.groupBy("source")
        .agg(count(lit(1)).as("n_emitted"))
      d.groupBy("source").agg(count(lit(1)).as("n_docs"))
        .join(emitted, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_emitted"), lit(0L)).as("n_emitted"),
          round(coalesce(col("n_emitted"), lit(0L)).cast("double")
            / col("n_docs"), 4).as("realized_ratio"))
        .orderBy("source")
    }),

    // Budget-constrained greedy selection: the highest-quality
    // documents whose cumulative whitespace-token count fits an 8k
    // training budget — quality desc (encoded monotonically as
    // 1.0 − quality asc), doc_id tiebreak, running total from the
    // two-pass range-partitioned prefix sum (Sampling.budgetSelect;
    // never a single-partition window).
    "qt50_token_budget" -> ((s, dir) => {
      // budgetSelect is two-pass by contract — checkpoint the small
      // score projection so the quality/token expressions tokenize
      // the corpus once (the qt51 pattern)
      val d = docs(s, dir).select(col("doc_id"),
        TF.tokenCount(col("text")).as("n_tokens"),
        round(TF.qualityScore(col("text")), 4).as("quality"))
        .localCheckpoint()
      graft.operators.Sampling.budgetSelect(d,
          Seq(lit(1.0) - col("quality"), col("doc_id")), "n_tokens",
          budget = 8000L)
        .select(col("doc_id"), col("quality"), col("n_tokens"),
          col("cum_tokens"))
        .orderBy("doc_id")
    }),

    // Selection-bias audit for the qt50 budget cut: KL divergence of
    // the kept and dropped populations against the full-corpus token
    // mixture over the same smoothed hashed-unigram buckets as qt28 —
    // the "did quality filtering skew the language distribution" check
    // every aggressive curation step should close with. Pure
    // composition of two oracle-gated operators (budgetSelect →
    // sourceDivergence with the keep flag as the group key).
    "qt51_selection_bias" -> ((s, dir) => {
      // the scored corpus feeds budgetSelect's two prefix-sum passes,
      // the kept/dropped join's left side AND the divergence read —
      // without a cut, the quality/token expressions re-ran over the
      // corpus 3–4× (r14 verdict: the only top-five bench row with
      // recoverable plan cost). localCheckpoint ONLY the score
      // columns (the qi25 pattern, minus the text payload: the
      // checkpoint materializes what budgetSelect's two passes and
      // the join probe re-read, and `text` would multiply its size
      // ~50× for a single consumer); the divergence side streams
      // text straight from parquet exactly once and picks the
      // checkpointed scores up by join.
      val scores = docs(s, dir).select(col("doc_id"),
        TF.tokenCount(col("text")).as("n_tokens"),
        round(TF.qualityScore(col("text")), 4).as("quality"))
        .localCheckpoint()
      val kept = graft.operators.Sampling.budgetSelect(scores,
          Seq(lit(1.0) - col("quality"), col("doc_id")), "n_tokens",
          budget = 8000L)
        .select(col("doc_id"), lit(1).as("__k"))
      graft.operators.Dsir.sourceDivergence(
          docs(s, dir).select(col("doc_id"), col("text"))
            .join(kept, Seq("doc_id"), "left")
            .withColumn("grp",
              when(col("__k").isNotNull, lit("kept"))
                .otherwise(lit("dropped"))),
          "grp", "text", buckets = 128)
        .withColumnRenamed("source", "grp")
        .orderBy("grp")
    }),

    // Quality-canonical cluster dedup: same verified-pair components
    // as qt18, but the keeper is the HIGHEST-QUALITY member (id
    // tiebreak), not the smallest id — the policy real pipelines use
    // (keep the cleanest copy, drop the rest). The per-cluster argmax
    // compiles to WindowGroupLimit; the oracle recomputes exact pairs,
    // closes them transitively, and replays the quality argmax.
    "qt52_canonical_dedup" -> ((s, dir) => {
      val corpus = planted(s, dir)
      val verified = verifiedPairsArtifact(s, dir).select("id_a", "id_b")
      val labeled = graft.operators.Components.connectedComponents(verified)
      val quality = corpus.select(col("doc_id").as("id"),
        round(TF.qualityScore(col("text")), 4).as("quality"))
      graft.operators.Components.canonicalBy(labeled, quality)
        .orderBy("component")
    }),

    // Jelinek–Mercer interpolated bigram perplexity (λ = 0.75): the
    // MLE bigram backed off into the add-1 unigram — qt39's pure
    // bigram with real smoothing, scored per document. The operand
    // tree is pinned (Perplexity.interpolatedBigram scaladoc), so the
    // oracle replays the model joins and the score chain exactly.
    "qt53_interp_lm" -> ((s, dir) => {
      graft.operators.Perplexity.interpolatedBigramWith(
          docs(s, dir), "doc_id", "text", lmArtifact(s, dir),
          lambda = 0.75)
        .orderBy("doc_id")
    }),

    // Span-level decontamination APPLY (the fix behind qt13/qt38's
    // detection): corpus = the 100 planted near-copies, bench = docs
    // < 50. Copies of bench docs redact to almost nothing (only the
    // mutated tail survives); copies of non-bench docs lose only their
    // honest template-overlap spans. Exact set math end to end — the
    // oracle rebuilds every redacted string token-for-token.
    "qt55_decontam_apply" -> ((s, dir) => {
      val corpus = planted(s, dir).where(col("doc_id") >= 1000000)
      val bench = docs(s, dir).where(col("doc_id") < 50)
        .select("doc_id", "text")
      Dedup.redactContaminated(corpus, bench, "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),

    // Leakage-free train/eval split: near-duplicate CLUSTERS are the
    // split unit, not documents — a near-copy of a training doc landing
    // in eval is silent contamination, so every verified cluster hashes
    // to one side via its component root (singletons via their own id).
    // Composition of three oracle-gated operators (LSH candidates →
    // exact verify → components → frozen hash split).
    "qt56_leakage_split" -> ((s, dir) => {
      val corpus = planted(s, dir)
      val verified = verifiedPairsArtifact(s, dir).select("id_a", "id_b")
      val labeled = graft.operators.Components
        .connectedComponents(verified)
        .withColumnRenamed("id", "doc_id")
      val grouped = corpus.select("doc_id")
        .join(labeled, Seq("doc_id"), "left")
        .withColumn("group_key", coalesce(col("component"), col("doc_id")))
      graft.operators.Sampling.withSplit(grouped, "group_key", 0.2)
        .select(col("doc_id"), col("group_key"), col("is_eval"))
        .orderBy("doc_id")
    }),

    // Length↔quality Pearson correlation — the "is my quality score
    // secretly a length detector" audit every learned-or-heuristic
    // quality gate needs. Both variables are EXACT integers (n_chars;
    // quality re-scaled to 4dp units), so the five sufficient
    // statistics are exact longs from ONE map-side-combined aggregate,
    // and the Pearson formula is a single pinned double tree over them
    // — no FP accumulation anywhere.
    "qt57_len_quality_corr" -> ((s, dir) => {
      val d = docs(s, dir).select(
        col("n_chars").cast("long").as("x"),
        round(round(TF.qualityScore(col("text")), 4) * 10000)
          .cast("long").as("y"))
      def D(c: org.apache.spark.sql.Column) = c.cast("double")
      d.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("n").as("n_docs"),
          TF.trunc4((D(col("n")) * D(col("sxy")) - D(col("sx")) * D(col("sy")))
            / sqrt((D(col("n")) * D(col("sxx")) - D(col("sx")) * D(col("sx")))
              * (D(col("n")) * D(col("syy")) - D(col("sy")) * D(col("sy")))))
            .as("r"))
    }),

    // Readability metrics (Flesch ease + Flesch–Kincaid grade) from
    // dictionary-free sentence/syllable heuristics — pure per-row
    // integer counting plus two pinned double formulas, so the whole
    // query is map-side (no shuffle but the presentation sort) and
    // the oracle replays it exactly.
    "qt54_readability" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        TF.tokenCount(col("text")).as("n_words"),
        TF.sentenceCount(col("text")).as("n_sentences"),
        TF.syllableCount(col("text")).as("n_syllables"))
      d.select(col("doc_id"), col("n_words"), col("n_sentences"),
          col("n_syllables"),
          TF.trunc4(TF.fleschEase(col("n_words"), col("n_sentences"),
            col("n_syllables"))).as("flesch"),
          TF.trunc4(TF.fkGrade(col("n_words"), col("n_sentences"),
            col("n_syllables"))).as("fk_grade"))
        .orderBy("doc_id")
    })
  )

  /** Oracle corpus CTE mirroring [[planted]]. */
  private val P =
    """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 2000),
      | corpus AS (
      |   SELECT doc_id, text FROM base
      |   UNION ALL
      |   SELECT doc_id + 1000000 AS doc_id,
      |          text || ' near duplicate tail marker' AS text
      |   FROM base WHERE doc_id < 100)""".stripMargin

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString(", ")

  private val stopRatio =
    s"""(CASE WHEN len(toks) = 0 THEN 0.0 ELSE
       | len(list_filter(toks, t -> t IN (${inList(graft.functions.TextFunctions.EnStopwords)})))::DOUBLE / len(toks) END)""".stripMargin

  /** EXACT (uncapped) word-3-gram Jaccard pairs over the planted corpus
    * at threshold `t` — the shared truth for the sketch-then-verify
    * queries (qt06/qt07/qt08 differ only in candidate generator, which
    * must achieve full recall at the threshold for the hash to match).
    */
  private def exactJaccardOracle(t: Double): String = P + s"""
      , toks AS (SELECT doc_id, string_split_regex(regexp_replace(lower(text), '(^\\s+)|(\\s+$$)', '', 'g'), '\\s+') AS t
                 FROM corpus),
      idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 2))) AS i FROM toks),
      grams AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(t, i, i + 2), ' ') AS g
                FROM idx),
      sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b,
             round(inter::DOUBLE / (sa.sz + sb.sz - inter), 4) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= $t
      ORDER BY id_a, id_b"""

  /** Shared BPE-tokenizer oracle CTEs (3 merge rounds, corpus-trained):
    * `tok` = per-word token count under the learned merges, `dw` = the
    * (doc_id, word) instance relation. qt35 aggregates per doc,
    * qt48 per language.
    */
  private val bpeCtes = """
      WITH words AS (
        SELECT w, count(*) AS freq FROM (
          SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
          FROM documents)
        WHERE w <> '' GROUP BY w),
      v0 AS (SELECT w, chr(1) || chr(1) || array_to_string(
               list_append(string_split(w, ''), '</w>'),
               chr(1) || chr(1)) || chr(1) || chr(1) AS seq, freq
             FROM words),
      p1 AS (SELECT pr[1] AS l, pr[2] AS r, sum(freq) AS n
             FROM (SELECT freq, unnest(list_zip(
                     syms[1:len(syms)-1], syms[2:len(syms)])) AS pr
                   FROM (SELECT freq, list_filter(
                           string_split(seq, chr(1) || chr(1)),
                           x -> x <> '') AS syms FROM v0))
             GROUP BY 1, 2),
      t1 AS (SELECT l, r FROM p1 ORDER BY n DESC, l, r LIMIT 1),
      v1 AS (SELECT w, replace(seq,
               chr(1) || t1.l || chr(1) || chr(1) || t1.r || chr(1),
               chr(1) || t1.l || t1.r || chr(1)) AS seq, freq
             FROM v0, t1),
      p2 AS (SELECT pr[1] AS l, pr[2] AS r, sum(freq) AS n
             FROM (SELECT freq, unnest(list_zip(
                     syms[1:len(syms)-1], syms[2:len(syms)])) AS pr
                   FROM (SELECT freq, list_filter(
                           string_split(seq, chr(1) || chr(1)),
                           x -> x <> '') AS syms FROM v1))
             GROUP BY 1, 2),
      t2 AS (SELECT l, r FROM p2 ORDER BY n DESC, l, r LIMIT 1),
      v2 AS (SELECT w, replace(seq,
               chr(1) || t2.l || chr(1) || chr(1) || t2.r || chr(1),
               chr(1) || t2.l || t2.r || chr(1)) AS seq, freq
             FROM v1, t2),
      p3 AS (SELECT pr[1] AS l, pr[2] AS r, sum(freq) AS n
             FROM (SELECT freq, unnest(list_zip(
                     syms[1:len(syms)-1], syms[2:len(syms)])) AS pr
                   FROM (SELECT freq, list_filter(
                           string_split(seq, chr(1) || chr(1)),
                           x -> x <> '') AS syms FROM v2))
             GROUP BY 1, 2),
      t3 AS (SELECT l, r FROM p3 ORDER BY n DESC, l, r LIMIT 1),
      v3 AS (SELECT w, replace(seq,
               chr(1) || t3.l || chr(1) || chr(1) || t3.r || chr(1),
               chr(1) || t3.l || t3.r || chr(1)) AS seq
             FROM v2, t3),
      tok AS (SELECT w, len(list_filter(
                string_split(seq, chr(1) || chr(1)),
                x -> x <> '')) AS n_tok FROM v3),
      dw AS (SELECT doc_id, w FROM (
               SELECT doc_id,
                 unnest(string_split_regex(trim(text), '\s+')) AS w
               FROM documents)
             WHERE w <> '')"""

  val oracle: Map[String, String] = Map(
    "qt15_seq_pack" -> """
      WITH d AS (SELECT doc_id,
                   cast(len(string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+'))
                     AS int) AS n_tokens
                 FROM documents),
      p AS (SELECT doc_id, n_tokens,
              cast(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS bigint) AS tokens_before
            FROM d)
      SELECT doc_id, n_tokens, tokens_before,
             cast(floor(tokens_before / 2048.0) AS bigint) AS block_id,
             cast(floor((tokens_before + n_tokens - 1) / 2048.0)
               - floor(tokens_before / 2048.0) + 1 AS int) AS n_blocks
      FROM p ORDER BY doc_id""",
    "qt14_tfidf" -> """
      WITH toks AS (
        SELECT doc_id, t AS term FROM (
          SELECT doc_id,
                 unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
          FROM documents) WHERE t <> ''),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
      ranked AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
               tf.tf * ln(n.n_docs::DOUBLE / dfreq.df) AS score,
               row_number() OVER (PARTITION BY tf.doc_id
                 ORDER BY round(tf.tf * ln(n.n_docs::DOUBLE / dfreq.df), 4)
                   DESC, tf.tf DESC, dfreq.df ASC, tf.term ASC) AS rn
        FROM tf JOIN dfreq USING (term) CROSS JOIN n)
      SELECT doc_id, term, tf, df, round(score, 4) AS score
      FROM ranked WHERE rn <= 3 ORDER BY doc_id, term""",
    "qt06_fingerprint" -> exactJaccardOracle(0.8),
    // Exact >=0.8-Jaccard pairs closed transitively (recursive CTE
    // reachability == connected components), then per-cluster stats.
    "qt18_cluster_dedup" -> (P.replaceFirst("WITH ", "WITH RECURSIVE ") + s"""
      , toks AS (SELECT doc_id, string_split_regex(regexp_replace(lower(text), '(^\\s+)|(\\s+$$)', '', 'g'), '\\s+') AS t
                 FROM corpus),
      idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 2))) AS i FROM toks),
      grams AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(t, i, i + 2), ' ') AS g
                FROM idx),
      sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.8),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT src AS id FROM edges),
      reach AS (
        SELECT id, id AS r FROM nodes
        UNION
        SELECT reach.id AS id, e.dst AS r
        FROM reach JOIN edges e ON e.src = reach.r),
      comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
      SELECT cast(component AS bigint) AS component,
             cast(count(*) AS bigint) AS n_members,
             cast(sum(CASE WHEN id <> component THEN 1 ELSE 0 END) AS bigint)
               AS n_dropped
      FROM comp GROUP BY component ORDER BY component"""),
    "qt07_minhash_lsh" -> exactJaccardOracle(0.8),
    "qt08_simhash" -> exactJaccardOracle(0.95),
    "qt01_token_stats" -> """
      WITH d AS (SELECT doc_id, text,
                   string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+') AS toks
                 FROM documents)
      SELECT doc_id, cast(len(toks) AS int) AS n_tokens,
             cast(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS int) AS n_pieces,
             round(length(regexp_replace(text, '\s', '', 'g'))::DOUBLE / len(toks), 4) AS mean_tok_len
      FROM d ORDER BY doc_id""",
    "qt02_quality" -> s"""
      WITH d AS (SELECT doc_id, text,
                   string_split_regex(regexp_replace(lower(text), '(^\\s+)|(\\s+$$)', '', 'g'), '\\s+') AS toks
                 FROM documents),
      m AS (SELECT doc_id,
              $stopRatio AS stop_r,
              (CASE WHEN length(text) = 0 THEN 0.0 ELSE
                len(regexp_extract_all(lower(text), '[^a-z0-9\\s]'))::DOUBLE / length(text) END) AS punct_r,
              len(toks) AS n_tok
            FROM d)
      SELECT doc_id, round(stop_r, 4) AS stop_ratio,
             round(punct_r, 4) AS punct_ratio,
             round(least(1.0, greatest(0.0,
               0.4 * (CASE WHEN n_tok >= 10 AND n_tok <= 10000 THEN 1.0 ELSE 0.0 END)
               + 0.4 * least(1.0, stop_r * 4)
               + 0.2 * (1.0 - least(1.0, punct_r * 5)))), 4) AS quality
      FROM m ORDER BY doc_id""",
    "qt50_token_budget" -> s"""
      WITH d AS (SELECT doc_id, text,
                   string_split_regex(regexp_replace(lower(text), '(^\\s+)|(\\s+$$)', '', 'g'), '\\s+') AS toks
                 FROM documents),
      m AS (SELECT doc_id,
              $stopRatio AS stop_r,
              (CASE WHEN length(text) = 0 THEN 0.0 ELSE
                len(regexp_extract_all(lower(text), '[^a-z0-9\\s]'))::DOUBLE / length(text) END) AS punct_r,
              len(toks) AS n_tok
            FROM d),
      q AS (SELECT doc_id, cast(n_tok AS int) AS n_tokens,
              round(least(1.0, greatest(0.0,
                0.4 * (CASE WHEN n_tok >= 10 AND n_tok <= 10000 THEN 1.0 ELSE 0.0 END)
                + 0.4 * least(1.0, stop_r * 4)
                + 0.2 * (1.0 - least(1.0, punct_r * 5)))), 4) AS quality
            FROM m),
      c AS (SELECT doc_id, quality, n_tokens,
              cast(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
                ROWS UNBOUNDED PRECEDING) AS bigint) AS cum_tokens
            FROM q)
      SELECT doc_id, quality, n_tokens, cum_tokens FROM c
      WHERE cum_tokens <= 8000 ORDER BY doc_id""",
    "qt51_selection_bias" -> s"""
      WITH d AS (SELECT doc_id, text,
                   string_split_regex(regexp_replace(lower(text), '(^\\s+)|(\\s+$$)', '', 'g'), '\\s+') AS toks
                 FROM documents),
      m AS (SELECT doc_id,
              $stopRatio AS stop_r,
              (CASE WHEN length(text) = 0 THEN 0.0 ELSE
                len(regexp_extract_all(lower(text), '[^a-z0-9\\s]'))::DOUBLE / length(text) END) AS punct_r,
              len(toks) AS n_tok
            FROM d),
      q AS (SELECT doc_id, cast(n_tok AS int) AS n_tokens,
              round(least(1.0, greatest(0.0,
                0.4 * (CASE WHEN n_tok >= 10 AND n_tok <= 10000 THEN 1.0 ELSE 0.0 END)
                + 0.4 * least(1.0, stop_r * 4)
                + 0.2 * (1.0 - least(1.0, punct_r * 5)))), 4) AS quality
            FROM m),
      c AS (SELECT doc_id,
              cast(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
                ROWS UNBOUNDED PRECEDING) AS bigint) AS cum
            FROM q),
      kept AS (SELECT doc_id FROM c WHERE cum <= 8000),
      tagged AS (SELECT dd.doc_id, dd.text,
                   CASE WHEN k.doc_id IS NOT NULL THEN 'kept'
                        ELSE 'dropped' END AS grp
                 FROM documents dd LEFT JOIN kept k USING (doc_id)),
      tk AS (SELECT grp,
               unnest(string_split_regex(regexp_replace(lower(text), '(^\\s+)|(\\s+$$)', '', 'g'), '\\s+')) AS g
             FROM tagged),
      bkt AS (SELECT grp,
                ('0x' || substr(md5(g), 1, 8))::BIGINT % 128 AS bucket
              FROM tk),
      counts AS (SELECT grp, bucket, count(*) AS n FROM bkt GROUP BY 1, 2),
      grid AS (SELECT s.grp, r.bucket
               FROM (SELECT DISTINCT grp FROM counts) s
               CROSS JOIN (SELECT unnest(range(0, 128)) AS bucket) r),
      fl AS (SELECT g.grp, g.bucket, coalesce(cc.n, 0) AS n
             FROM grid g LEFT JOIN counts cc USING (grp, bucket)),
      nb AS (SELECT bucket, cast(sum(n) AS BIGINT) AS nb FROM fl GROUP BY 1),
      ts AS (SELECT grp, cast(sum(n) AS BIGINT) AS ts FROM fl GROUP BY 1),
      t AS (SELECT cast(sum(nb) AS BIGINT) AS t FROM nb)
      SELECT f.grp, ts.ts AS n_tokens,
             round(sum(((f.n + 1.0) / (ts.ts + 128.0))
               * ln(((f.n + 1.0) / (ts.ts + 128.0))
                    / ((nb.nb + 1.0) / (t.t + 128.0)))), 4) AS kl
      FROM fl f JOIN nb USING (bucket) JOIN ts USING (grp) CROSS JOIN t
      GROUP BY 1, 2 ORDER BY grp""",
    "qt52_canonical_dedup" -> (P.replaceFirst("WITH ", "WITH RECURSIVE ") + s"""
      , toks AS (SELECT doc_id, string_split_regex(regexp_replace(lower(text), '(^\\s+)|(\\s+$$)', '', 'g'), '\\s+') AS t
                 FROM corpus),
      idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 2))) AS i FROM toks),
      grams AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(t, i, i + 2), ' ') AS g
                FROM idx),
      sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.8),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT src AS id FROM edges),
      reach AS (
        SELECT id, id AS r FROM nodes
        UNION
        SELECT reach.id AS id, e.dst AS r
        FROM reach JOIN edges e ON e.src = reach.r),
      comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
      qd AS (SELECT doc_id, string_split_regex(regexp_replace(lower(text), '(^\\s+)|(\\s+$$)', '', 'g'), '\\s+') AS toks,
               text
             FROM corpus),
      qm AS (SELECT doc_id,
               $stopRatio AS stop_r,
               (CASE WHEN length(text) = 0 THEN 0.0 ELSE
                 len(regexp_extract_all(lower(text), '[^a-z0-9\\s]'))::DOUBLE / length(text) END) AS punct_r,
               len(toks) AS n_tok
             FROM qd),
      qq AS (SELECT doc_id AS id, round(least(1.0, greatest(0.0,
                 0.4 * (CASE WHEN n_tok >= 10 AND n_tok <= 10000 THEN 1.0 ELSE 0.0 END)
                 + 0.4 * least(1.0, stop_r * 4)
                 + 0.2 * (1.0 - least(1.0, punct_r * 5)))), 4) AS quality
             FROM qm),
      j AS (SELECT comp.component, comp.id, qq.quality
            FROM comp JOIN qq USING (id)),
      agg AS (SELECT component, cast(count(*) AS bigint) AS n_members
              FROM j GROUP BY 1),
      k AS (SELECT component, id AS keep_id, quality AS keep_quality
            FROM (SELECT j.*, row_number() OVER (PARTITION BY component
                    ORDER BY quality DESC, id) AS rn FROM j) x
            WHERE rn = 1)
      SELECT cast(a.component AS bigint) AS component, a.n_members,
             k.keep_id, k.keep_quality
      FROM agg a JOIN k USING (component) ORDER BY component"""),
    "qt03_langid" -> s"""
      WITH d AS (SELECT lang, string_split_regex(regexp_replace(lower(text), '(^\\s+)|(\\s+$$)', '', 'g'), '\\s+') AS toks
                 FROM documents),
      sc AS (SELECT lang,
               $stopRatio AS en,
               (CASE WHEN len(toks) = 0 THEN 0.0 ELSE
                 len(list_filter(toks, t -> t IN (${inList(graft.functions.TextFunctions.DeStopwords)})))::DOUBLE / len(toks) END) AS de,
               (CASE WHEN len(toks) = 0 THEN 0.0 ELSE
                 len(list_filter(toks, t -> t IN (${inList(graft.functions.TextFunctions.FrStopwords)})))::DOUBLE / len(toks) END) AS fr
             FROM d)
      SELECT lang,
             CASE WHEN en = 0.0 AND de = 0.0 AND fr = 0.0 THEN 'und'
                  WHEN en >= de AND en >= fr THEN 'en'
                  WHEN de >= fr THEN 'de' ELSE 'fr' END AS pred,
             count(*) AS n
      FROM sc GROUP BY 1, 2 ORDER BY lang, pred""",
    "qt04_dedup_exact" -> (P + """
      SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
             count(*) AS n_copies
      FROM corpus GROUP BY md5(text) ORDER BY content_hash"""),
    "qt05_dedup_norm" -> (P + """
      , mutated AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN upper(text)
                    ELSE '  ' || text END AS text
        FROM corpus),
      normed AS (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text
        FROM mutated)
      SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
             count(*) AS n_copies
      FROM normed GROUP BY md5(text) ORDER BY content_hash"""),
    "qt21_corpus_shuffle" -> """
      SELECT doc_id,
             cast(row_number() OVER (
               ORDER BY md5('42:' || cast(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS shuffle_pos
      FROM documents ORDER BY doc_id""",
    "qt20_unigram_freq" -> """
      WITH toks AS (
        SELECT doc_id, t AS term FROM (
          SELECT doc_id,
                 unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
          FROM documents) WHERE t <> ''),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      cnt AS (SELECT term, cast(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),
      tot AS (SELECT cast(sum(cnt) AS BIGINT) AS total FROM cnt),
      agg AS (
        SELECT doc_id, cast(sum(tf) AS BIGINT) AS n_tokens,
               cast(sum(tf * cnt) AS BIGINT) AS sum_freq
        FROM tf JOIN cnt USING (term) GROUP BY doc_id)
      SELECT doc_id, n_tokens, sum_freq,
             sum_freq::DOUBLE / (n_tokens::DOUBLE * total::DOUBLE)
               AS mean_freq
      FROM agg, tot ORDER BY doc_id""",
    "qt19_passage_dedup" -> (P + """
      , toks AS (SELECT doc_id,
                   string_split_regex(trim(text), '\s+') AS t
                 FROM corpus),
      idx AS (SELECT doc_id, t,
                unnest(range(0, greatest(cast(ceil(len(t) / 20.0) AS BIGINT), 1))) AS p
              FROM toks),
      pas AS (SELECT doc_id,
                md5(array_to_string(list_slice(t, p * 20 + 1, p * 20 + 20), ' ')) AS ph
              FROM idx),
      spread AS (SELECT ph, count(DISTINCT doc_id) AS docs
                 FROM pas GROUP BY ph)
      SELECT doc_id,
             count(*) AS n_passages,
             cast(sum(CASE WHEN docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_passages,
             round(sum(CASE WHEN docs >= 2 THEN 1 ELSE 0 END)::DOUBLE
               / count(*), 4) AS dup_ratio
      FROM pas JOIN spread USING (ph)
      GROUP BY doc_id ORDER BY doc_id"""),
    "qt09_ngram_jaccard" -> (P + """
      , toks AS (SELECT doc_id, string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+') AS t
                 FROM corpus),
      idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 2))) AS i FROM toks),
      grams AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(t, i, i + 2), ' ') AS g
                FROM idx),
      sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
      capped AS (SELECT * FROM (
          SELECT doc_id, g, count(*) OVER (PARTITION BY g) AS df FROM grams)
        WHERE df <= 100),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b,
             round(inter::DOUBLE / (sa.sz + sb.sz - inter), 4) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.5
      ORDER BY id_a, id_b"""),
    "qt13_decontaminate" -> (P + """
      , toks AS (SELECT doc_id, string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+') AS t
                 FROM corpus),
      idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 2))) AS i FROM toks),
      grams AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(t, i, i + 2), ' ') AS g
                FROM idx),
      bench AS (SELECT doc_id AS bench_id, g FROM grams WHERE doc_id < 50),
      bsizes AS (SELECT bench_id, count(*) AS bsz FROM bench GROUP BY 1),
      inter AS (
        SELECT c.doc_id AS corpus_id, b.bench_id, count(*) AS inter
        FROM grams c JOIN bench b ON c.g = b.g AND c.doc_id <> b.bench_id
        GROUP BY 1, 2)
      SELECT corpus_id, bench_id,
             round(inter::DOUBLE / bsz, 4) AS containment
      FROM inter JOIN bsizes USING (bench_id)
      WHERE inter::DOUBLE / bsz >= 0.8
      ORDER BY corpus_id, bench_id"""),
    "qt38_contamination" -> (P + """
      , csub AS (SELECT doc_id, text FROM corpus WHERE doc_id >= 50
                 AND (doc_id < 1000000 OR doc_id >= 1000025)),
      ct AS (SELECT doc_id, string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+') AS t
             FROM csub),
      cg AS (SELECT DISTINCT array_to_string(list_slice(t, i, i + 2), ' ') AS g
             FROM (SELECT t, unnest(range(1, greatest(len(t) - 1, 2))) AS i
                   FROM ct)),
      bt AS (SELECT doc_id, string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+') AS t
             FROM documents WHERE doc_id < 50),
      bg AS (SELECT DISTINCT doc_id AS bench_id,
               array_to_string(list_slice(t, i, i + 2), ' ') AS g
             FROM (SELECT doc_id, t,
                     unnest(range(1, greatest(len(t) - 1, 2))) AS i
                   FROM bt)),
      r AS (SELECT b.bench_id, count(*) AS n_grams, count(c.g) AS n_hit
            FROM bg b LEFT JOIN cg c ON b.g = c.g
            GROUP BY b.bench_id)
      SELECT bench_id, cast(n_grams AS bigint) AS n_grams,
             cast(n_hit AS bigint) AS n_hit,
             round(n_hit::DOUBLE / n_grams, 4) AS dirty_frac
      FROM r ORDER BY bench_id"""),
    "qt17_repetition" -> ("""
      WITH toks AS (SELECT doc_id, string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+') AS t
                    FROM documents),
      tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
      tcnt AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
      tstats AS (SELECT doc_id, cast(sum(c) AS BIGINT) AS n,
                   count(*) AS nd, max(c) AS topn
                 FROM tcnt GROUP BY 1),
      bidx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t), 1))) AS i FROM toks),
      bg AS (SELECT doc_id, array_to_string(list_slice(t, i, i + 1), ' ') AS g FROM bidx),
      bcnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      bstats AS (SELECT doc_id, max(c) AS topb FROM bcnt GROUP BY 1)
      SELECT t.doc_id,
             n AS n_tokens, nd AS n_distinct,
             topn AS top_token_n,
             coalesce(topb, 0) AS top_bigram_n,
             round(nd::DOUBLE / n, 4) AS distinct_ratio,
             round(topn::DOUBLE / n, 4) AS top_token_frac
      FROM tstats t LEFT JOIN bstats b USING (doc_id)
      ORDER BY doc_id"""),
    "qt16_bloom_decontam" -> (P + """
      , toks AS (SELECT doc_id, string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+') AS t
                 FROM corpus),
      idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 2))) AS i FROM toks),
      grams AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(t, i, i + 3), ' ') AS g
                FROM idx),
      bench AS (SELECT doc_id AS bench_id, g FROM grams WHERE doc_id < 50),
      bsizes AS (SELECT bench_id, count(*) AS bsz FROM bench GROUP BY 1),
      inter AS (
        SELECT c.doc_id AS corpus_id, b.bench_id, count(*) AS inter
        FROM grams c JOIN bench b ON c.g = b.g AND c.doc_id <> b.bench_id
        GROUP BY 1, 2)
      SELECT corpus_id, bench_id,
             round(inter::DOUBLE / bsz, 4) AS containment
      FROM inter JOIN bsizes USING (bench_id)
      WHERE inter::DOUBLE / bsz >= 0.7
      ORDER BY corpus_id, bench_id"""),
    "qt12_pii_redact" -> ("""
      WITH p AS (
        SELECT doc_id,
               text || ' user' || doc_id || '@example.com contact 10.'
                    || (doc_id % 256) || '.' || ((doc_id // 256) % 256)
                    || '.7' AS t
        FROM documents),
      r AS (
        SELECT doc_id, t,
               regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g') AS t1
        FROM p)
      SELECT doc_id,
             cast(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS bigint)
               AS n_emails,
             cast(len(regexp_extract_all(t1,
               '\b(\d{1,3}\.){3}\d{1,3}\b')) AS bigint) AS n_ips,
             md5(regexp_replace(t1, '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'))
               AS redacted_digest
      FROM r ORDER BY doc_id"""),
    "qt11_unicode_nfc" -> ("""
      WITH n AS (
        SELECT doc_id,
               nfc_normalize(text || ' cafe' || chr(769)) AS nt
        FROM documents)
      SELECT doc_id, md5(nt) AS digest,
             cast(strlen(nt) AS bigint) AS n_bytes
      FROM n ORDER BY doc_id"""),
    // thresholds: 0.5→80000000, 0.25→40000000 of the first 8 md5 hex
    // chars; lexicographic compare on lowercase hex == numeric compare
    "qt22_chunking" -> """
      WITH toks AS (
        SELECT doc_id,
               string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+') AS t
        FROM documents),
      st AS (SELECT doc_id, t, len(t) AS n,
                    unnest(range(0, len(t), 16)) AS s
             FROM toks)
      SELECT doc_id,
             cast(s // 16 AS int) AS chunk_id,
             cast(s AS int) AS start_tok,
             cast(least(32, n - s) AS int) AS chunk_tokens,
             md5(array_to_string(list_slice(t, s + 1, s + 32), ' ')) AS chunk_hash
      FROM st ORDER BY doc_id, chunk_id""",
    "qt29_cdc_chunking" -> """
      WITH toks AS (
        SELECT doc_id,
               string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+') AS t
        FROM documents),
      tk AS (SELECT doc_id, unnest(t) AS tok,
                    generate_subscripts(t, 1) - 1 AS pos
             FROM toks),
      b AS (SELECT doc_id, tok, pos,
                   CASE WHEN ('0x' || substr(md5(tok), 1, 8))::BIGINT % 16 = 0
                        THEN 1 ELSE 0 END AS bd
            FROM tk),
      c AS (SELECT doc_id, tok, pos,
                   cast(coalesce(sum(bd) OVER (PARTITION BY doc_id
                     ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS int) AS chunk_id
            FROM b)
      SELECT doc_id, chunk_id, cast(min(pos) AS int) AS start_tok,
             cast(count(*) AS int) AS chunk_tokens,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
      FROM c GROUP BY 1, 2 ORDER BY doc_id, chunk_id""",
    "qt34_perplexity" -> """
      WITH toks AS (SELECT doc_id, tok FROM (
               SELECT doc_id, unnest(string_split_regex(
                 regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'),
                 '\s+')) AS tok
               FROM documents) WHERE tok <> ''),
      c AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
      s AS (SELECT sum(c) AS n, count(*) AS v FROM c)
      SELECT t.doc_id, cast(count(*) AS bigint) AS n_tokens,
             round(exp(-avg(ln((c.c + 1)::DOUBLE / (s.n + s.v)))), 4) AS ppl,
             cast(sum(CASE WHEN c.c IS NULL THEN 1 ELSE 0 END) AS bigint)
               AS n_oov
      FROM toks t LEFT JOIN c USING (tok) CROSS JOIN s
      GROUP BY t.doc_id ORDER BY t.doc_id""",
    "qt40_nb_quality" -> """
      WITH toks AS (SELECT doc_id, seed, tok FROM (
               SELECT doc_id, source IN ('src0','src1','src2') AS seed,
                      unnest(string_split_regex(
                 regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'),
                 '\s+')) AS tok
               FROM documents) WHERE tok <> ''),
      c AS (SELECT tok,
              sum(CASE WHEN seed THEN 1 ELSE 0 END) AS cpos,
              sum(CASE WHEN seed THEN 0 ELSE 1 END) AS cneg
            FROM toks GROUP BY 1),
      t AS (SELECT sum(cpos) AS tpos, sum(cneg) AS tneg,
                   count(*) AS v FROM c),
      d AS (SELECT sum(CASE WHEN source IN ('src0','src1','src2')
                       THEN 1 ELSE 0 END) AS npos,
                   sum(CASE WHEN source IN ('src0','src1','src2')
                       THEN 0 ELSE 1 END) AS nneg FROM documents),
      w AS (SELECT tok,
              ln((cpos + 1)::DOUBLE / (t.tpos + t.v))
                - ln((cneg + 1)::DOUBLE / (t.tneg + t.v)) AS w
            FROM c CROSS JOIN t),
      g AS (SELECT tk.doc_id, cast(count(*) AS bigint) AS n_tokens,
              round(ln(d.npos::DOUBLE / d.nneg) + sum(w.w), 4) AS log_odds
            FROM toks tk JOIN w USING (tok) CROSS JOIN d
            GROUP BY tk.doc_id, d.npos, d.nneg)
      SELECT doc_id, n_tokens, log_odds, log_odds > 0 AS pred
      FROM g ORDER BY doc_id""",
    "qt41_length_buckets" -> """
      WITH d AS (SELECT lang,
                   cast(len(string_split_regex(
                     regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'),
                     '\s+')) AS int) AS n_tokens
                 FROM documents),
      b AS (SELECT lang,
              cast(floor(n_tokens / 32) * 32 AS int) AS bucket_lo,
              n_tokens
            FROM d)
      SELECT lang, bucket_lo,
             count(*) AS n_docs,
             cast(sum(n_tokens) AS bigint) AS sum_tokens,
             cast(max(n_tokens) AS int) AS max_tokens,
             round((count(*) * max(n_tokens) - sum(n_tokens))::DOUBLE
               / (count(*) * max(n_tokens)), 4) AS pad_waste_pct
      FROM b GROUP BY lang, bucket_lo ORDER BY lang, bucket_lo""",
    "qt42_vocab_growth" -> """
      WITH toks AS (
        SELECT source, t AS term FROM (
          SELECT source,
                 unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
          FROM documents) WHERE t <> ''),
      tc AS (SELECT source, term, count(*) AS cnt
             FROM toks GROUP BY 1, 2),
      g AS (SELECT source,
              cast(sum(cnt) AS bigint) AS n_tokens,
              count(*) AS n_types,
              cast(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS bigint)
                AS n_hapax
            FROM tc GROUP BY source),
      d AS (SELECT source, count(DISTINCT doc_id) AS n_docs
            FROM documents GROUP BY source)
      SELECT g.source, d.n_docs, g.n_tokens, g.n_types, g.n_hapax,
             round(g.n_types::DOUBLE / g.n_tokens, 4) AS ttr,
             round(g.n_hapax::DOUBLE / g.n_types, 4) AS hapax_ratio
      FROM g JOIN d USING (source) ORDER BY g.source""",
    "qt43_source_overlap" -> """
      WITH toks AS (SELECT source,
                      string_split_regex(regexp_replace(lower(text),
                        '(^\s+)|(\s+$)', '', 'g'), '\s+') AS t
                    FROM documents),
      idx AS (SELECT source, t,
                unnest(range(1, greatest(len(t) - 1, 2))) AS i
              FROM toks),
      grams AS (SELECT DISTINCT source,
                  array_to_string(list_slice(t, i, i + 2), ' ') AS g
                FROM idx),
      sizes AS (SELECT source, count(*) AS sz FROM grams GROUP BY source),
      inter AS (
        SELECT a.source AS s1, b.source AS s2, count(*) AS n_common
        FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
        GROUP BY 1, 2)
      SELECT s1, s2, sa.sz AS n1, sb.sz AS n2, n_common,
             round(n_common::DOUBLE / (sa.sz + sb.sz - n_common), 4)
               AS jaccard
      FROM inter
      JOIN sizes sa ON sa.source = s1
      JOIN sizes sb ON sb.source = s2
      ORDER BY s1, s2""",
    "qt44_incremental_dedup" -> (P + """
      , idx AS (SELECT DISTINCT text FROM documents WHERE doc_id < 300)
      SELECT doc_id, md5(text) AS content_hash FROM corpus
      WHERE text NOT IN (SELECT text FROM idx)
      ORDER BY doc_id"""),
    "qt57_len_quality_corr" -> s"""
      WITH d AS (SELECT doc_id, text, n_chars,
                   string_split_regex(regexp_replace(lower(text), '(^\\s+)|(\\s+$$)', '', 'g'), '\\s+') AS toks
                 FROM documents),
      m AS (SELECT doc_id, n_chars,
              $stopRatio AS stop_r,
              (CASE WHEN length(text) = 0 THEN 0.0 ELSE
                len(regexp_extract_all(lower(text), '[^a-z0-9\\s]'))::DOUBLE / length(text) END) AS punct_r,
              len(toks) AS n_tok
            FROM d),
      q AS (SELECT cast(n_chars AS bigint) AS x,
              cast(round(round(least(1.0, greatest(0.0,
                0.4 * (CASE WHEN n_tok >= 10 AND n_tok <= 10000 THEN 1.0 ELSE 0.0 END)
                + 0.4 * least(1.0, stop_r * 4)
                + 0.2 * (1.0 - least(1.0, punct_r * 5)))), 4) * 10000)
                AS bigint) AS y
            FROM m),
      s AS (SELECT cast(count(*) AS bigint) AS n,
              cast(sum(x) AS bigint) AS sx, cast(sum(y) AS bigint) AS sy,
              cast(sum(x * x) AS bigint) AS sxx,
              cast(sum(y * y) AS bigint) AS syy,
              cast(sum(x * y) AS bigint) AS sxy
            FROM q)
      SELECT n AS n_docs,
             floor((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
               / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                 * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
               * 10000) / 10000 AS r
      FROM s""",
    "qt56_leakage_split" -> (P.replaceFirst("WITH ", "WITH RECURSIVE ") + s"""
      , toks AS (SELECT doc_id, string_split_regex(regexp_replace(lower(text), '(^\\s+)|(\\s+$$)', '', 'g'), '\\s+') AS t
                 FROM corpus),
      idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 2))) AS i FROM toks),
      grams AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(t, i, i + 2), ' ') AS g
                FROM idx),
      sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.8),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT src AS id FROM edges),
      reach AS (
        SELECT id, id AS r FROM nodes
        UNION
        SELECT reach.id AS id, e.dst AS r
        FROM reach JOIN edges e ON e.src = reach.r),
      comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
      grouped AS (SELECT c.doc_id,
                    coalesce(comp.component, c.doc_id) AS group_key
                  FROM corpus c LEFT JOIN comp ON comp.id = c.doc_id)
      SELECT doc_id, cast(group_key AS bigint) AS group_key,
             ('0x' || substr(md5(cast(group_key AS varchar)), 1, 8))::BIGINT
               / 4294967296.0 < 0.2 AS is_eval
      FROM grouped ORDER BY doc_id"""),
    "qt55_decontam_apply" -> (P + """
      , c AS (SELECT doc_id, text FROM corpus WHERE doc_id >= 1000000),
      ct AS (SELECT doc_id, string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+') AS t
             FROM c),
      cg AS (SELECT doc_id, i,
               array_to_string(list_slice(t, i, i + 2), ' ') AS g
             FROM (SELECT doc_id, t,
                     unnest(range(1, len(t) - 1)) AS i
                   FROM ct)),
      bt AS (SELECT string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+') AS t
             FROM documents WHERE doc_id < 50),
      bg AS (SELECT DISTINCT array_to_string(list_slice(t, i, i + 2), ' ') AS g
             FROM (SELECT t, unnest(range(1, len(t) - 1)) AS i
                   FROM bt)),
      dirty AS (SELECT DISTINCT doc_id, pos FROM (
                  SELECT cg.doc_id, unnest(range(cg.i, cg.i + 3)) AS pos
                  FROM cg JOIN bg USING (g))),
      toks AS (SELECT doc_id, unnest(t) AS tok,
                 unnest(generate_series(1, len(t))) AS pos
               FROM ct),
      kept AS (SELECT t.doc_id, t.pos, t.tok FROM toks t
               WHERE NOT EXISTS (SELECT 1 FROM dirty d
                 WHERE d.doc_id = t.doc_id AND d.pos = t.pos)),
      agg AS (SELECT doc_id, count(*) AS n_kept,
                array_to_string(list(tok ORDER BY pos), ' ') AS clean_text
              FROM kept GROUP BY doc_id),
      o AS (SELECT doc_id, len(t) AS n_tokens FROM ct)
      SELECT o.doc_id, cast(o.n_tokens AS int) AS n_tokens,
             cast(o.n_tokens - coalesce(a.n_kept, 0) AS int) AS n_dirty,
             coalesce(a.clean_text, '') AS clean_text
      FROM o LEFT JOIN agg a USING (doc_id) ORDER BY o.doc_id"""),
    "qt54_readability" -> """
      WITH d AS (SELECT doc_id, text,
                   string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+') AS toks
                 FROM documents),
      m AS (SELECT doc_id,
              cast(len(toks) AS int) AS n_words,
              cast(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
                AS int) AS n_sentences,
              cast(coalesce(list_sum(list_transform(
                list_filter(toks, w -> w <> ''),
                w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))),
                0) AS int) AS n_syllables
            FROM d)
      SELECT doc_id, n_words, n_sentences, n_syllables,
             floor((206.835::DOUBLE
               - 1.015::DOUBLE * n_words / n_sentences
               - 84.6::DOUBLE * n_syllables / n_words) * 10000) / 10000
               AS flesch,
             floor((0.39::DOUBLE * n_words / n_sentences
               + 11.8::DOUBLE * n_syllables / n_words
               - 15.59::DOUBLE) * 10000) / 10000 AS fk_grade
      FROM m ORDER BY doc_id""",
    "qt53_interp_lm" -> """
      WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(
                 regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'),
                 '\s+'), x -> x <> '') AS t
        FROM documents),
      bg AS (SELECT doc_id,
                    unnest(list_slice(t, 1, len(t) - 1)) AS p,
                    unnest(list_slice(t, 2, len(t))) AS c
             FROM toks WHERE len(t) >= 2),
      c2 AS (SELECT p, c, count(*) AS c2 FROM bg GROUP BY 1, 2),
      c1 AS (SELECT p, cast(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
      uni AS (SELECT tok AS c, count(*) AS cu FROM
                (SELECT unnest(t) AS tok FROM toks WHERE len(t) >= 2)
              GROUP BY 1),
      tv AS (SELECT cast(sum(cu) AS BIGINT) AS t, count(*) AS v FROM uni)
      SELECT bg.doc_id, cast(count(*) AS bigint) AS n_bigrams,
             round(exp(-avg(ln(0.75 * c2.c2 / c1.c1
               + 0.25 * (uni.cu + 1) / (tv.t + tv.v)))), 4) AS ppl_jm,
             cast(sum(CASE WHEN c2.c2 IS NULL THEN 1 ELSE 0 END) AS bigint)
               AS n_oov
      FROM bg LEFT JOIN c2 USING (p, c) LEFT JOIN c1 USING (p)
      LEFT JOIN uni USING (c) CROSS JOIN tv
      GROUP BY bg.doc_id ORDER BY doc_id""",
    "qt39_bigram_lm" -> """
      WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(
                 regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'),
                 '\s+'), x -> x <> '') AS t
        FROM documents),
      bg AS (SELECT doc_id,
                    unnest(list_slice(t, 1, len(t) - 1)) AS p,
                    unnest(list_slice(t, 2, len(t))) AS c
             FROM toks WHERE len(t) >= 2),
      c2 AS (SELECT p, c, count(*) AS c2 FROM bg GROUP BY 1, 2),
      c1 AS (SELECT p, sum(c2) AS c1 FROM c2 GROUP BY 1),
      v AS (SELECT count(DISTINCT tok) AS v FROM
              (SELECT unnest(t) AS tok FROM toks WHERE len(t) >= 2))
      SELECT bg.doc_id, cast(count(*) AS bigint) AS n_bigrams,
             round(exp(-avg(ln((c2.c2 + 1)::DOUBLE
               / (c1.c1 + v.v)::DOUBLE))), 4) AS ppl2,
             cast(sum(CASE WHEN c2.c2 IS NULL THEN 1 ELSE 0 END) AS bigint)
               AS n_oov
      FROM bg LEFT JOIN c2 USING (p, c) LEFT JOIN c1 USING (p) CROSS JOIN v
      GROUP BY bg.doc_id ORDER BY doc_id""",
    "qt37_topic_cells" -> """
      WITH toks AS (SELECT doc_id, tok FROM (
               SELECT doc_id, unnest(string_split_regex(
                 regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'),
                 '\s+')) AS tok
               FROM documents) WHERE tok <> ''),
      b AS (SELECT doc_id,
              CAST(('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS INT)
                AS bk,
              count(*) AS c
            FROM toks GROUP BY doc_id, bk),
      e AS (SELECT doc_id AS vec_id, list(coalesce(c, 0) ORDER BY pos) AS v
            FROM (SELECT d.doc_id, p.pos, b.c
                  FROM (SELECT DISTINCT doc_id FROM toks) d
                  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS pos) p
                  LEFT JOIN b ON b.doc_id = d.doc_id AND b.bk = p.pos)
            GROUP BY doc_id),
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
      SELECT vec_id AS doc_id, CAST(cell AS INT) AS cell FROM a2
      ORDER BY doc_id""",
    "qt36_ccnet_buckets" -> """
      WITH toks AS (SELECT doc_id, tok FROM (
               SELECT doc_id, unnest(string_split_regex(
                 regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'),
                 '\s+')) AS tok
               FROM documents) WHERE tok <> ''),
      c AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
      s AS (SELECT sum(c) AS n, count(*) AS v FROM c),
      p AS (SELECT t.doc_id,
              round(exp(-avg(ln((c.c + 1)::DOUBLE / (s.n + s.v)))), 4)
                AS ppl
            FROM toks t JOIN c USING (tok) CROSS JOIN s
            GROUP BY t.doc_id),
      j AS (SELECT d.doc_id, d.lang, p.ppl
            FROM p JOIN documents d ON p.doc_id = d.doc_id),
      t AS (SELECT doc_id, lang, ppl,
              ntile(3) OVER (PARTITION BY lang
                ORDER BY ppl, doc_id) AS tl
            FROM j)
      SELECT doc_id, lang, ppl,
             CASE tl WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
               ELSE 'tail' END AS bucket
      FROM t ORDER BY doc_id""",
    "qt33_weighted_sample" -> """
      WITH w AS (SELECT doc_id, source, n_chars,
               pow(('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8))::BIGINT
                     / 4294967296.0,
                   1.0 / n_chars) AS k
             FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
      r AS (SELECT doc_id, source, n_chars,
                   row_number() OVER (PARTITION BY source
                     ORDER BY k DESC, doc_id) AS rn
            FROM w)
      SELECT doc_id, source, n_chars FROM r WHERE rn <= 10
      ORDER BY source, doc_id""",
    "qt32_bpe_merges" -> """
      WITH words AS (
        SELECT w, count(*) AS freq FROM (
          SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
          FROM documents)
        WHERE w <> '' GROUP BY w),
      v0 AS (SELECT chr(1) || chr(1) || array_to_string(
               list_append(string_split(w, ''), '</w>'),
               chr(1) || chr(1)) || chr(1) || chr(1) AS seq, freq
             FROM words),
      p1 AS (SELECT pr[1] AS l, pr[2] AS r, sum(freq) AS n
             FROM (SELECT freq, unnest(list_zip(
                     syms[1:len(syms)-1], syms[2:len(syms)])) AS pr
                   FROM (SELECT freq, list_filter(
                           string_split(seq, chr(1) || chr(1)),
                           x -> x <> '') AS syms FROM v0))
             GROUP BY 1, 2),
      t1 AS (SELECT l, r, n FROM p1 ORDER BY n DESC, l, r LIMIT 1),
      v1 AS (SELECT replace(seq,
               chr(1) || t1.l || chr(1) || chr(1) || t1.r || chr(1),
               chr(1) || t1.l || t1.r || chr(1)) AS seq, freq
             FROM v0, t1),
      p2 AS (SELECT pr[1] AS l, pr[2] AS r, sum(freq) AS n
             FROM (SELECT freq, unnest(list_zip(
                     syms[1:len(syms)-1], syms[2:len(syms)])) AS pr
                   FROM (SELECT freq, list_filter(
                           string_split(seq, chr(1) || chr(1)),
                           x -> x <> '') AS syms FROM v1))
             GROUP BY 1, 2),
      t2 AS (SELECT l, r, n FROM p2 ORDER BY n DESC, l, r LIMIT 1),
      v2 AS (SELECT replace(seq,
               chr(1) || t2.l || chr(1) || chr(1) || t2.r || chr(1),
               chr(1) || t2.l || t2.r || chr(1)) AS seq, freq
             FROM v1, t2),
      p3 AS (SELECT pr[1] AS l, pr[2] AS r, sum(freq) AS n
             FROM (SELECT freq, unnest(list_zip(
                     syms[1:len(syms)-1], syms[2:len(syms)])) AS pr
                   FROM (SELECT freq, list_filter(
                           string_split(seq, chr(1) || chr(1)),
                           x -> x <> '') AS syms FROM v2))
             GROUP BY 1, 2),
      t3 AS (SELECT l, r, n FROM p3 ORDER BY n DESC, l, r LIMIT 1)
      SELECT cast(merge_rank AS int) AS merge_rank, lhs, rhs,
             cast(freq AS bigint) AS freq
      FROM (SELECT 1 AS merge_rank, l AS lhs, r AS rhs, n AS freq FROM t1
            UNION ALL
            SELECT 2, l, r, n FROM t2
            UNION ALL
            SELECT 3, l, r, n FROM t3)
      ORDER BY merge_rank""",
    "qt45_domain_cap" -> """
      WITH r AS (SELECT doc_id, source, lang, n_chars,
               cast(row_number() OVER (PARTITION BY source, lang
                 ORDER BY n_chars DESC, doc_id) AS int) AS cap_rank
             FROM documents)
      SELECT doc_id, source, lang, n_chars, cap_rank
      FROM r WHERE cap_rank <= 3
      ORDER BY source, lang, cap_rank""",
    "qt46_curriculum" -> """
      WITH b AS (SELECT doc_id,
               least(4, n_chars // 200) AS band,
               substr(md5('cur:' || cast(doc_id AS varchar)), 1, 8) AS hx
             FROM documents)
      SELECT doc_id, band,
             row_number() OVER (ORDER BY band, hx, doc_id) AS pos
      FROM b ORDER BY doc_id""",
    "qt47_ngram_novelty" -> """
      WITH toks AS (SELECT doc_id, string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+') AS t
                    FROM documents),
      idx AS (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 2))) AS i FROM toks),
      grams AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(t, i, i + 2), ' ') AS g
                FROM idx),
      dfreq AS (SELECT g, count(*) AS df FROM grams GROUP BY g)
      SELECT doc_id,
             count(*) AS n_grams,
             cast(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS bigint) AS n_novel,
             round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::DOUBLE
               / count(*), 4) AS novelty
      FROM grams JOIN dfreq USING (g)
      GROUP BY doc_id
      ORDER BY doc_id""",
    "qt48_fertility" -> (bpeCtes + """
      , per AS (SELECT doc_id, count(*) AS n_words, sum(n_tok) AS n_tokens
                FROM dw JOIN tok USING (w)
                GROUP BY doc_id)
      SELECT d.lang,
             cast(sum(per.n_words) AS bigint) AS n_words,
             cast(sum(per.n_tokens) AS bigint) AS n_tokens,
             round(sum(per.n_tokens)::DOUBLE / sum(per.n_words), 4)
               AS fertility
      FROM per JOIN documents d USING (doc_id)
      GROUP BY d.lang
      ORDER BY d.lang"""),
    "qt49_source_epochs" -> """
      WITH h AS (SELECT doc_id, source,
               substr(md5(cast(doc_id AS varchar)), 1, 8) AS hx,
               CASE WHEN CAST(regexp_extract(source, '(\d+)', 1) AS int)
                 % 2 = 0 THEN 1.5 ELSE 0.75 END AS w
             FROM documents),
      c AS (SELECT source,
              CAST(floor(w) AS int)
              + (CASE WHEN hx < (CASE WHEN w = 1.5
                   THEN '80000000' ELSE 'c0000000' END)
                 THEN 1 ELSE 0 END) AS copies
            FROM h)
      SELECT source,
             count(*) AS n_docs,
             cast(sum(copies) AS bigint) AS n_emitted,
             round(sum(copies)::DOUBLE / count(*), 4) AS realized_ratio
      FROM c GROUP BY source
      ORDER BY source""",
    "qt35_bpe_encode" -> (bpeCtes + """
      SELECT doc_id,
             cast(count(*) AS bigint) AS n_words,
             cast(sum(n_tok) AS bigint) AS n_tokens
      FROM dw JOIN tok USING (w)
      GROUP BY doc_id
      ORDER BY doc_id"""),
    "qt31_quality_rules" -> """
      WITH w AS (SELECT doc_id, text,
               string_split_regex(trim(text), '\s+') AS words,
               list_filter(string_split(text, chr(10)),
                 l -> trim(l) <> '') AS lines
             FROM documents),
      m AS (SELECT doc_id, text, words, lines,
              len(words) AS nw, len(lines) AS nl,
              list_sum(list_transform(words, x -> length(x)))::DOUBLE
                / len(words) AS mean_len,
              ((len(string_split(text, '#')) - 1)
               + (len(string_split_regex(text, '\.\.\.')) - 1)
               + (len(string_split(text, '…')) - 1))::DOUBLE
                / len(words) AS sym_ratio,
              len(list_filter(words,
                x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                / len(words) AS alpha_frac,
              len(list_filter(
                ['the','be','to','of','and','that','have','with'],
                sw -> list_contains(
                  list_transform(words, x -> lower(x)), sw))) AS hits,
              CASE WHEN len(lines) = 0 THEN 0.0 ELSE
                len(list_filter(lines,
                  l -> regexp_matches(ltrim(l), '^[-*•]')))::DOUBLE
                  / len(lines) END AS bullet_frac,
              CASE WHEN len(lines) = 0 THEN 0.0 ELSE
                len(list_filter(lines,
                  l -> regexp_matches(rtrim(l), '(\.\.\.|…)$')))::DOUBLE
                  / len(lines) END AS ellipsis_frac,
              CASE WHEN len(lines) = 0 THEN 0.0 ELSE
                len(list_filter(lines,
                  l -> regexp_matches(rtrim(l), '[.!?]$')))::DOUBLE
                  / len(lines) END AS tp_frac,
              length(regexp_replace(text, '[^.!?]', '', 'g')) AS nsent,
              contains(text, '{') AS has_brace,
              contains(lower(text), 'lorem ipsum') AS has_lorem
            FROM w)
      SELECT doc_id,
             cast(nw AS int) AS n_words,
             round(mean_len, 4) AS mean_word_len,
             round(sym_ratio, 4) AS symbol_ratio,
             round(alpha_frac, 4) AS alpha_word_frac,
             cast(hits AS int) AS stopword_hits,
             round(bullet_frac, 4) AS bullet_line_frac,
             round(ellipsis_frac, 4) AS ellipsis_line_frac,
             round(tp_frac, 4) AS term_punct_line_frac,
             cast(nsent AS int) AS n_sentences,
             has_brace, has_lorem,
             (nw BETWEEN 50 AND 100000 AND mean_len BETWEEN 3.0 AND 10.0
              AND sym_ratio < 0.1 AND alpha_frac > 0.8 AND hits >= 2
              AND bullet_frac < 0.9 AND ellipsis_frac < 0.3) AS keep_gopher,
             (nsent >= 3 AND NOT has_brace AND NOT has_lorem) AS keep_c4
      FROM m ORDER BY doc_id""",
    "qt30_substring_dedup" -> (P + """,
      toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
               FROM corpus),
      g AS (SELECT doc_id, i AS pos,
                   array_to_string(list_slice(t, i, i + 7), ' ') AS gram
            FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
            WHERE len(t) >= 8),
      occ AS (SELECT doc_id, pos,
                     row_number() OVER (PARTITION BY gram
                       ORDER BY doc_id, pos) AS rn
              FROM g),
      cov AS (SELECT DISTINCT doc_id, p
              FROM occ, unnest(range(pos, pos + 8)) AS v(p)
              WHERE rn > 1),
      agg AS (SELECT doc_id, cast(count(*) AS int) AS n_removed
              FROM cov GROUP BY 1),
      tk AS (SELECT doc_id, unnest(t) AS tok,
                    generate_subscripts(t, 1) AS pos
             FROM toks),
      kept AS (SELECT k.doc_id, k.tok, k.pos
               FROM tk k LEFT JOIN cov c
                 ON c.doc_id = k.doc_id AND c.p = k.pos
               WHERE c.doc_id IS NULL),
      cl AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS cleaned
             FROM kept GROUP BY 1)
      SELECT t.doc_id, cast(len(t.t) AS int) AS n_tokens,
             coalesce(a.n_removed, 0) AS n_removed,
             coalesce(cl.cleaned, '') AS cleaned
      FROM toks t LEFT JOIN agg a USING (doc_id)
                  LEFT JOIN cl USING (doc_id)
      ORDER BY doc_id"""),
    "qt23_mixture_sample" -> """
      WITH d AS (SELECT doc_id,
                   CASE WHEN source IN ('src0', 'src1') THEN source
                        ELSE 'tail' END AS dom
                 FROM documents),
      c AS (SELECT dom, count(*) AS n,
                   pow(count(*)::DOUBLE, 0.5) AS w
            FROM d GROUP BY 1),
      r AS (SELECT dom,
                   least(1.0, 250.0 * w /
                     ((SELECT sum(w ORDER BY dom) FROM c) * n::DOUBLE)) AS rate
            FROM c)
      SELECT d.doc_id, d.dom
      FROM d JOIN r USING (dom)
      WHERE ('0x' || substr(md5(cast(d.doc_id AS varchar)), 1, 8))::BIGINT
              / 4294967296.0 < r.rate
      ORDER BY d.doc_id""",
    "qt27_char_entropy" -> """
      WITH ch AS (SELECT doc_id, c FROM (
               SELECT doc_id, unnest(string_split(lower(text), '')) AS c
               FROM documents) WHERE c <> ''),
      cc AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
      tot AS (SELECT doc_id, cast(sum(n) AS BIGINT) AS nc,
                     sum(n * ln(n)) AS s
              FROM cc GROUP BY 1)
      SELECT d.doc_id, cast(length(d.text) AS int) AS n_chars,
             round(CASE WHEN tot.nc IS NULL OR tot.nc = 0 THEN 0.0
                        ELSE (ln(nc) - s / nc) / ln(2) END, 4) AS entropy
      FROM documents d LEFT JOIN tot USING (doc_id)
      ORDER BY d.doc_id""",
    "qt24_heavy_hitters" -> """
      WITH t AS (SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
                 FROM documents),
      c AS (SELECT term, count(*) AS cnt FROM t WHERE term <> '' GROUP BY 1),
      r AS (SELECT term, cnt,
                   row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank
            FROM c)
      SELECT term, cnt, cast(rank AS int) AS rank
      FROM r WHERE rank <= 20 ORDER BY rank""",
    "qt28_source_divergence" -> """
      WITH toks AS (
        SELECT source,
               unnest(string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+')) AS g
        FROM documents),
      bkt AS (SELECT source,
                     ('0x' || substr(md5(g), 1, 8))::BIGINT % 128 AS bucket
              FROM toks),
      counts AS (SELECT source, bucket, count(*) AS n FROM bkt GROUP BY 1, 2),
      grid AS (SELECT s.source, r.bucket
               FROM (SELECT DISTINCT source FROM counts) s
               CROSS JOIN (SELECT unnest(range(0, 128)) AS bucket) r),
      fl AS (SELECT g.source, g.bucket, coalesce(c.n, 0) AS n
             FROM grid g LEFT JOIN counts c USING (source, bucket)),
      nb AS (SELECT bucket, cast(sum(n) AS BIGINT) AS nb FROM fl GROUP BY 1),
      ts AS (SELECT source, cast(sum(n) AS BIGINT) AS ts FROM fl GROUP BY 1),
      t AS (SELECT cast(sum(nb) AS BIGINT) AS t FROM nb)
      SELECT f.source, ts.ts AS n_tokens,
             round(sum(((f.n + 1.0) / (ts.ts + 128.0))
               * ln(((f.n + 1.0) / (ts.ts + 128.0))
                    / ((nb.nb + 1.0) / (t.t + 128.0)))), 4) AS kl
      FROM fl f JOIN nb USING (bucket) JOIN ts USING (source) CROSS JOIN t
      GROUP BY 1, 2 ORDER BY source""",
    "qt25_dsir_weights" -> """
      WITH toks AS (
        SELECT doc_id, lang,
               string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+') AS t
        FROM documents),
      grams AS (
        SELECT doc_id, lang, unnest(t) AS g FROM toks
        UNION ALL
        SELECT doc_id, lang, array_to_string(list_slice(t, i, i + 1), ' ') AS g
        FROM (SELECT doc_id, lang, t, unnest(range(1, len(t))) AS i
              FROM toks WHERE len(t) >= 2)),
      b AS (SELECT doc_id, lang,
                   ('0x' || substr(md5(g), 1, 8))::BIGINT % 256 AS bucket
            FROM grams),
      stats AS (SELECT bucket, count(*) AS cr,
                       count(*) FILTER (WHERE lang = 'en') AS ct
                FROM b GROUP BY 1),
      tot AS (SELECT cast(sum(cr) AS BIGINT) AS tr,
                     cast(sum(ct) AS BIGINT) AS tt FROM stats),
      lam AS (SELECT bucket,
                     ln((ct + 1.0) / (tt + 256.0))
                       - ln((cr + 1.0) / (tr + 256.0)) AS lam
              FROM stats, tot),
      db AS (SELECT doc_id, bucket, count(*) AS n FROM b GROUP BY 1, 2)
      SELECT doc_id, cast(sum(n) AS BIGINT) AS n_grams,
             round(sum(n * lam), 4) AS weight
      FROM db JOIN lam USING (bucket)
      GROUP BY doc_id ORDER BY doc_id""",
    "qt26_export_manifest" -> """
      WITH d AS (
        SELECT doc_id,
               cast(len(string_split_regex(regexp_replace(lower(text), '(^\s+)|(\s+$)', '', 'g'), '\s+')) AS int) AS n_tokens,
               md5('42:' || cast(doc_id AS VARCHAR)) AS skey
        FROM documents),
      o AS (SELECT doc_id, n_tokens,
                   row_number() OVER (ORDER BY skey, doc_id) AS pos
            FROM d),
      p AS (SELECT pos, n_tokens,
                   cast(coalesce(sum(n_tokens) OVER (ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT) AS tb
            FROM o)
      SELECT cast(floor(tb / 2048.0) AS BIGINT) AS block_id,
             count(*) AS n_docs,
             cast(sum(n_tokens) AS BIGINT) AS block_tokens,
             cast(min(pos) AS BIGINT) AS first_pos,
             cast(max(pos) AS BIGINT) AS last_pos
      FROM p GROUP BY 1 ORDER BY 1""",
    "qt10_stratified_sample" -> ("""
      WITH h AS (
        SELECT doc_id, lang,
               substr(md5(cast(doc_id AS varchar)), 1, 8) AS hx
        FROM documents)
      SELECT doc_id, lang, hx < '40000000' AS is_eval
      FROM h
      WHERE hx < (CASE lang WHEN 'en' THEN '80000000'
                            WHEN 'de' THEN '40000000'
                            ELSE 'ffffffffz' END)
      ORDER BY doc_id""")
  )

}
