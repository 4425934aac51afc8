package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class UnicodeFnsSpec extends AnyFunSuite with SparkTest {

  private val nfd = "café"   // e + combining acute (6 codepoints)
  private val nfc = "café"    // precomposed é (5 codepoints)

  test("NFC composes combining sequences; ASCII passes through untouched") {
    UnicodeFns.register(spark)
    val r = spark.sql(
      s"SELECT nfc_normalize('$nfd'), octet_length(nfc_normalize('$nfd')), " +
        "nfc_normalize('plain ascii')").head()
    assert(r.getString(0) == nfc)
    assert(r.getInt(1) == 5)
    assert(r.getString(2) == "plain ascii")
  }

  test("canonical equivalents hash equal after normalization") {
    UnicodeFns.register(spark)
    val r = spark.sql(
      s"SELECT md5(nfc_normalize('$nfd')) = md5(nfc_normalize('$nfc'))").head()
    assert(r.getBoolean(0))
  }
}
