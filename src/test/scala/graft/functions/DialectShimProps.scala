package graft.functions

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.unsafe.types.UTF8String

/** Property tests (ScalaCheck) for the pure-JVM shim internals — no
  * SparkSession needed, so thousands of cases run in milliseconds.
  */
object DialectShimProps extends Properties("DialectShims") {

  private val genDateTime: Gen[LocalDateTime] = for {
    y <- Gen.choose(1970, 2100); mo <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28); h <- Gen.choose(0, 23)
    mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
  } yield LocalDateTime.of(y, mo, d, h, mi, s)

  property("format/parse roundtrip through the translated pattern") =
    Prop.forAll(genDateTime) { dt =>
      val fmt = DateTimeFormatter.ofPattern(
        DialectShims.cFormatToJava("%Y-%m-%dT%H:%M:%S"))
      LocalDateTime.parse(dt.format(fmt), fmt) == dt
    }

  // literal runs (arbitrary letters/punct) survive translation by
  // being quoted: formatting must reproduce them verbatim
  private val genLiteral: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaChar, Gen.oneOf(' ', '-', ':',
      '/', '.', '\''))).map(_.mkString)

  property("literal text round-trips through quoting") =
    Prop.forAll(genLiteral, genDateTime) { (text, dt) =>
      val java = DialectShims.cFormatToJava("%Y" + text.replace("%", ""))
      val out = dt.format(DateTimeFormatter.ofPattern(java))
      out == dt.getYear.toString + text.replace("%", "")
    }

  private def struct(json: String): String =
    Option(DialectShims.jsonStructureOf(UTF8String.fromString(json)))
      .map(_.toString).orNull

  private val genScalar: Gen[String] = Gen.oneOf(
    Gen.choose(0L, Long.MaxValue).map(_.toString),
    Gen.choose(Long.MinValue, -1L).map(_.toString),
    Gen.choose(-1e9, 1e9).map(d => f"$d%.3f"),
    Gen.oneOf("true", "false", "null"),
    Gen.alphaStr.map(s => "\"" + s + "\""))

  property("array-merge is commutative") =
    Prop.forAll(genScalar, genScalar) { (a, b) =>
      struct(s"[$a, $b]") == struct(s"[$b, $a]")
    }

  property("array-merge is associative across grouping") =
    Prop.forAll(genScalar, genScalar, genScalar) { (a, b, c) =>
      // element order differs but the merged structure must agree
      struct(s"[$a, $b, $c]") == struct(s"[$c, $a, $b]")
    }

  property("structure output is itself valid JSON") =
    Prop.forAll(genScalar, genScalar) { (a, b) =>
      val out = struct(s"""{"x": [$a, $b], "y": {"z": $a}}""")
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(out)
      true
    }
}
