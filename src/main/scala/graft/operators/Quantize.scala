package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the compression step a 100 TB
  * vector corpus applies before ANN indexing (4× smaller than float32,
  * 8× smaller than the float64 compute type; beyond-reference
  * operator in the embedding family next to [[Similarity]]).
  *
  * Scheme: per-vector symmetric linear quantization,
  * `scale = max|x| / 127`, `q_i = clamp(round(x_i / scale), ±127)`.
  * Everything is a codegen'd higher-order expression over the array
  * column (`transform`/`aggregate`) — no UDF, no shuffle at all:
  * quantization is embarrassingly map-side, which is the whole point
  * at scale.
  *
  * Per-vector quality stats come out alongside (saturation count,
  * reconstruction RMSE): a quantization job a pipeline can't audit is
  * a quantization job that silently destroys a corpus. Sequential
  * left-to-right array folds keep the float math bit-identical to the
  * DuckDB oracle's `list_aggregate`.
  */
object Quantize {

  private def maxAbs(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))

  /** scale, guarded so an all-zero vector quantizes to zeros instead
    * of dividing by zero.
    */
  private def scaleOf(v: Column): Column =
    greatest(maxAbs(v), lit(1e-30)) / 127

  /** One quantized element, clamped to the int8 range. */
  private def quant(x: Column, scale: Column): Column =
    least(greatest(round(x / scale), lit(-127.0)), lit(127.0)).cast("int")

  /** Quantize `vecCol` (array of float/double) per row. Output columns:
    * id, `scale` (6dp), `sum_q` (exact integer checksum of the int8
    * vector), `n_sat` (elements clamped at ±127), `rmse` (6dp
    * reconstruction root-mean-square error).
    */
  def int8Stats(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // STAGED projections, not one nested expression: inlining `s`
    // (itself an array aggregate) into every per-element lambda — and
    // `q` into each stat — multiplies the codegen'd tree ~dim-fold,
    // and the dominant cost at the observed scale was compiling that
    // tree, not running it. Aliases referenced more than once are
    // non-cheap, so CollapseProject keeps these stages separate.
    df.select(col(idCol),
        transform(col(vecCol), x => x.cast("double")).as("__v"))
      .select(col(idCol), col("__v"), scaleOf(col("__v")).as("__s"))
      .select(col(idCol), col("__v"), col("__s"),
        transform(col("__v"), x => quant(x, col("__s"))).as("__q"))
      .select(
        col(idCol),
        round(col("__s"), 6).as("scale"),
        aggregate(col("__q"), lit(0L), (acc, x) => acc + x).as("sum_q"),
        size(filter(col("__q"), x => abs(x) === 127)).as("n_sat"),
        round(sqrt(
          aggregate(zip_with(col("__v"), col("__q"),
            (x, qi) => pow(x - qi.cast("double") * col("__s"), 2)),
            lit(0.0), (acc, x) => acc + x) / size(col("__v"))), 6
        ).as("rmse"))
  }
}
