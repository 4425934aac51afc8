package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `spark.sql.extensions` entry point — the idiomatic way a Spark
  * cluster loads this library's SQL surface with zero code changes:
  *
  * {{{
  *   spark-sql --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * Injects the DuckDB-dialect shims (strptime, list, len, epoch_ms, …
  * — graft.functions.DialectShims) and the engine's own codegen'd
  * expressions (graft_fingerprint, graft_winnow_set,
  * graft_capture_groups, graft_magic, graft_image_width/height) into
  * every session built from the configured context. The imperative
  * `register(spark)` paths remain for embedded/library use; this class
  * is the deployment-time twin.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    // whole-table count/min/max over lake tables answered from the
    // manifest+sidecar, scan-free. preCBO runs ONCE per query (the
    // operator-optimization batch iterates to a fixed point, and the
    // rule's metadata probe shouldn't be paid per iteration).
    ext.injectPreCBORule(session =>
      graft.lake.MetadataAggregateRule(session))
    // bucket-expression filters (`date_trunc('MONTH', tp_timestamp) =
    // v`) rewritten to plain time bands so the SCAN path prunes files
    // and row groups; operator-optimization placement lets the band
    // then ride pushdown and constraint inference like any band
    ext.injectOptimizerRule(session =>
      graft.lake.BucketFilterBandRule(session))
  }
}

object GraftExtensions {
  import graft.functions._

  /** Every SQL-callable function the library ships. */
  val all: Seq[(String, Seq[Expression] => Expression)] =
    DialectShims.builders ++ Seq[(String, Seq[Expression] => Expression)](
      "graft_fingerprint" -> (es => Fingerprint(es.head)),
      "graft_winnow_set" -> (es => WinnowSet(es(0), es(1), es(2))),
      "graft_capture_groups" -> (es => CaptureGroups(es(0), es(1))),
      "nfc_normalize" -> (es => NfcNormalize(es.head)),
      "graft_magic" -> (es => MagicType(es.head)),
      "graft_image_width" -> (es => ImageWidth(es.head)),
      "graft_image_height" -> (es => ImageHeight(es.head)),
      // metadata-servable estimator aggregates (NdvFns/QuantileFns):
      // the injected MetadataAggregateRule answers them from the
      // sidecar sketches when covered
      "ndv" -> (es => NdvFns.NdvAgg(es.head).toAggregateExpression()),
      "graft_quantile" -> (es =>
        QuantileFns.QuantileAgg(es(0), es(1)).toAggregateExpression()),
      "graft_topk" -> (es =>
        TopKFns.TopKAgg(es(0), es(1)).toAggregateExpression()),
      "graft_topk_sketch" -> (es =>
        TopKFns.TopKSketchAgg(es.head).toAggregateExpression()))
}
