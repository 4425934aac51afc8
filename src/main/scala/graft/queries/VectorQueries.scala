package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

    // Approximate kNN via deterministic random-hyperplane LSH; planted
    // exact copies (vec_id+1000000) must come back rank 1 (spec-checked;
    // rows-only for the driver).
    "qe02_ann_lsh" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      val copies = e.where(col("vec_id") < 10)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      val corpus = e.unionByName(copies)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.annLsh(q, c, k = 5, tables = 8, bits = 8)
        .select("qid", "cid", "sim", "rank")
        .orderBy("qid", "rank")
    }),

    // Embedding-cosine near-duplicate pairs over planted exact copies.
    "qe03_cosine_neardup" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      val copies = e.where(col("vec_id") < 20)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      Similarity.cosineNearDupPairs(
          e.unionByName(copies), "vec_id", "embedding",
          threshold = 0.99, tables = 8, bits = 8)
        .orderBy("id_a", "id_b")
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
    })
  )

  val oracle: Map[String, String] = Map(
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
