package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Seed-labeled quality classifier — multinomial Naive Bayes with
  * add-1 smoothing over whitespace tokens, the exactly-reproducible
  * stand-in for the fastText/logistic quality classifiers every
  * published pretraining pipeline runs (GPT-3's WebText-vs-crawl
  * filter, LLaMA's Wikipedia-reference classifier, DCLM's fastText
  * gate). The caller marks a seed set of "looks like quality" rows
  * (a curated source, a hand-labeled sample); the model scores every
  * document by log-odds of membership. Beyond-reference.
  *
  * Train and score are closed over the input corpus (the
  * [[Perplexity]] contract): one pass builds the model, one join
  * scores, and every count is an exact integer, so the score is
  * reproducible to the 4dp round on any engine.
  *
  * Scale shape:
  *  - model build is ONE map-side-combined aggregate over exploded
  *    (token, is_seed) postings → a vocabulary-sized count table
  *    (cpos, cneg per token), never corpus-sized;
  *  - four scalars (seed/other token totals, seed/other doc counts)
  *    come from the same pass's re-aggregate — driver-side,
  *    metadata-sized;
  *  - per-token log-likelihood-ratio weights are computed IN the
  *    count table (vocabulary-sized projection), so scoring is a
  *    postings→weights join — both sides already partitioned by
  *    token; AQE broadcasts the weight table when small and
  *    skew-splits the hot-token sort-merge when not (same join
  *    geometry as [[Perplexity]]) — then an ordinary per-doc
  *    aggregate.
  *
  * score(d) = ln(Nseed/Nother) + Σ_t∈d [ln p(t|seed) − ln p(t|other)]
  * with p(t|c) = (c(t,c)+1) / (T_c + V). Positive ⇒ the document
  * looks more like the seed corpus than the rest.
  *
  * @param seed boolean column over `df` marking the positive class
  * @return (idCol, n_tokens, log_odds 4dp, pred boolean)
  */
object NaiveBayes {

  def scoreBySeed(
      df: DataFrame, idCol: String, textCol: String,
      seed: Column): DataFrame = {
    val toks = df.select(col(idCol).as("__id"), seed.as("__seed"),
      explode(TF.tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
    val counts = toks.groupBy("tok").agg(
      sum(when(col("__seed"), 1L).otherwise(0L)).as("cpos"),
      sum(when(col("__seed"), 0L).otherwise(1L)).as("cneg"))
    // five scalars: class token totals, vocabulary size, class doc
    // counts — the model normalizers (driver-side, metadata-sized)
    val t = counts.agg(sum("cpos"), sum("cneg"), count(lit(1))).head()
    val (tPos, tNeg, v) = (t.getLong(0), t.getLong(1), t.getLong(2))
    val d = df.agg(
      sum(when(seed, 1L).otherwise(0L)),
      sum(when(seed, 0L).otherwise(1L))).head()
    val (nPos, nNeg) = (d.getLong(0), d.getLong(1))
    require(nPos > 0 && nNeg > 0,
      s"naive-bayes: both classes need documents (seed=$nPos other=$nNeg)")
    val denomPos = (tPos + v).toDouble
    val denomNeg = (tNeg + v).toDouble
    val prior = math.log(nPos.toDouble / nNeg.toDouble)
    // per-token log-likelihood ratio, computed once per vocabulary entry
    val weights = counts.select(col("tok"),
      (log((col("cpos") + 1).cast("double") / denomPos)
        - log((col("cneg") + 1).cast("double") / denomNeg)).as("__w"))
    toks.join(weights, Seq("tok"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(lit(prior) + sum(col("__w")), 4).as("log_odds"))
      .select(col("__id").as(idCol), col("n_tokens"), col("log_odds"),
        (col("log_odds") > 0).as("pred"))
  }
}
