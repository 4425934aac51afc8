package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for text pipelines: NFC normalization as a
  * codegen'd Catalyst expression (Spark SQL has no normalizer;
  * DuckDB ships `nfc_normalize`, which is the oracle for qt11).
  * Canonical-equivalent texts (é vs e+U+0301) must hash equal before
  * exact dedup, or visually identical documents count as distinct —
  * a standard first pass over a crawled 100 TB corpus.
  */
object UnicodeFns {

  /** Static entry point for generated code. Fast path: pure-ASCII
    * bytes (the overwhelming majority of crawled text) skip the
    * Normalizer round-trip entirely.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Registered.once(spark, "unicode") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
    }

  def nfcNormalize(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("nfc_normalize", c)
  }
}

/** `nfc_normalize(string)` — DuckDB-named, codegen'd. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeFns.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeFns.nfc($c)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(c)
}
