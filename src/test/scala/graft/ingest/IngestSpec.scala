package graft.ingest

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.config.{ColumnSpec, TableSpec}

class IngestSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("Conversion: rename, cast, transform, null_if, automap") {
    val src = Seq(("1", "a", "-", 2.5), ("2", "b", "x", 3.5))
      .toDF("id", "nm", "ref", "v")
    val spec = TableSpec("t", Seq(
      ColumnSpec("row_id", Some("bigint"), source = Some("id")),
      ColumnSpec("ref", nullIf = Some("-")),
      ColumnSpec("doubled", Some("double"), transform = Some("v * 2"))))
    val out = Conversion.project(src, spec)
    assert(out.columns.toSeq == Seq("row_id", "ref", "doubled", "nm", "v"))
    assert(out.schema("row_id").dataType == LongType)
    val rows = out.orderBy("row_id").collect()
    assert(rows(0) == Row(1L, null, 5.0, "a", 2.5))
    assert(rows(1) == Row(2L, "x", 7.0, "b", 3.5))
  }

  test("Conversion: missing source column becomes typed NULL") {
    val out = Conversion.project(Seq(1).toDF("a"),
      TableSpec("t", Seq(ColumnSpec("ghost", Some("varchar")))))
    assert(out.schema("ghost").dataType == StringType)
    assert(out.select("ghost").head().isNullAt(0))
  }

  test("Conversion: NULL-preserving recursive struct rebuild") {
    // source struct (k, user(id, name)); declared reorders + drops a
    // field at both levels; NULL metas must stay NULL, not struct(NULL)
    val src = spark.range(4).select(col("id"),
      when(col("id") % 2 === 0,
        struct(col("id").cast("int").as("k"),
          struct(col("id").as("id"), concat(lit("u"), col("id")).as("name"),
            lit("drop").as("junk")).as("user")))
        .as("meta"))
    val spec = TableSpec("t", Seq(
      ColumnSpec("id", Some("bigint")),
      ColumnSpec("meta",
        Some("struct(user struct(name varchar, id bigint), k integer)"))))
    val out = Conversion.project(src, spec)
    val dt = out.schema("meta").dataType.asInstanceOf[StructType]
    assert(dt.fieldNames.toSeq == Seq("user", "k"))
    assert(dt("user").dataType.asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("name", "id"))
    val rows = out.orderBy("id").collect()
    assert(rows(1).isNullAt(1) && rows(3).isNullAt(1),
      "null structs must stay null after rebuild")
    val m0 = rows(0).getStruct(1)
    assert(m0.getStruct(0) == Row("u0", 0L) && m0.getInt(1) == 0)
  }

  test("Conversion: array-of-struct rebuild preserves null elements") {
    val src = spark.sql(
      """select array(named_struct('a', 1, 'b', 'x'), null) as arr""")
    val out = Conversion.project(src,
      TableSpec("t", Seq(ColumnSpec("arr", Some("struct(b varchar, a bigint)[]")))))
    val arr = out.head().getSeq[Row](0)
    assert(arr.head == Row("x", 1L))
    assert(arr(1) == null)
  }

  test("Validation: per-column report and clean split") {
    val df = Seq(
      (Some(1), Some("a")), (None, Some("b")), (None, None), (Some(4), None))
      .toDF("x", "y")
    val r = Validation.validate(df, Seq("x", "y", "not_there"))
    assert(r.invalidRows == 3)
    assert(r.nullsByColumn == Map("x" -> 2, "y" -> 2))
    assert(r.clean.collect().toSeq == Seq(Row(1, "a")))
  }

  test("Validation: clean batch reports nothing") {
    val r = Validation.validate(Seq((1, "a")).toDF("x", "y"), Seq("x", "y"))
    assert(r.invalidRows == 0 && r.nullsByColumn.isEmpty)
  }

  test("corrupt JSONL lines are dropped and reported, never ingested") {
    // SURVEY §4 corrupt-input row: the reference retries around invalid
    // files (duck_db_error.go:17-100); Spark's PERMISSIVE JSON mode
    // turns a malformed line into an all-null row, which the required-
    // column validation drops AND reports — one mechanism, no retries.
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt")
    val chunk = dir.resolve("chunk_0.jsonl")
    java.nio.file.Files.writeString(chunk,
      """{"tp_timestamp": "2024-05-01T10:00:00Z", "msg": "ok-1"}
        |{not json at all
        |{"tp_timestamp": "2024-05-01T11:00:00Z", "msg": "ok-2"}
        |""".stripMargin)
    val lake = graft.lake.Lake(dir.resolve("lake").toString)
    val res = Ingest.collectJsonl(spark, lake,
      graft.config.PartitionSpec("corrupt_t", "p0"),
      Seq(chunk.toString))
    assert(res.rowsIngested == 2 && res.rowsInvalid == 1, res)
    assert(res.nullsByColumn.contains("tp_timestamp"))
    assert(lake.read(spark, "corrupt_t").count() == 2)
  }

  test("collectJsonl deleteProcessed drains the inbox per committed batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inbox")
    val chunks = (0 until 3).map { i =>
      val p = dir.resolve(s"chunk_$i.jsonl")
      java.nio.file.Files.writeString(p,
        s"""{"tp_timestamp": "2024-05-01T1$i:00:00Z", "msg": "m$i"}""" + "\n")
      p.toString
    }
    val lake = graft.lake.Lake(dir.resolve("lake").toString)
    val res = Ingest.collectJsonl(spark, lake,
      graft.config.PartitionSpec("inbox_t", "p0"), chunks,
      maxChunksPerBatch = 2, deleteProcessed = true)
    assert(res.rowsIngested == 3 && res.chunksProcessed == 3)
    assert(chunks.forall(c => !new java.io.File(c).exists()),
      "processed chunk files must be deleted")
    assert(lake.read(spark, "inbox_t").count() == 3)
  }

  test("SchemaInference: drift fails fast with changed-column list") {
    val a = StructType(Seq(StructField("x", LongType),
      StructField("y", StringType)))
    val b = StructType(Seq(StructField("x", DoubleType),
      StructField("y", StringType), StructField("z", BooleanType)))
    val e = intercept[SchemaInference.SchemaChangeError](
      SchemaInference.checkDrift(a, b))
    assert(e.changes.map(c => (c.column, c.was, c.now)).toSet == Set(
      ("x", "bigint", "double"), ("z", "<absent>", "boolean")))
    // pinned columns are exempt (config wins over inference)
    SchemaInference.checkDrift(a, b, pinned = Set("x", "z"))
    // a column missing from a later chunk is NOT drift (reads as null)
    SchemaInference.checkDrift(b,
      StructType(Seq(StructField("y", StringType))), pinned = Set.empty)
  }

  test("SchemaInference.evolve adopts new columns, still rejects type changes") {
    val a = StructType(Seq(StructField("x", LongType),
      StructField("y", StringType)))
    val grown = StructType(Seq(StructField("x", LongType),
      StructField("z", BooleanType)))
    val (wider, added) = SchemaInference.evolve(a, grown)
    assert(added == Seq("z"))
    assert(wider.fieldNames.toSeq == Seq("x", "y", "z"))
    assert(wider("z").nullable)
    // unchanged chunk adds nothing
    assert(SchemaInference.evolve(wider, a)._2.isEmpty)
    // a type CHANGE is never adopted
    val changed = StructType(Seq(StructField("x", DoubleType)))
    val e = intercept[SchemaInference.SchemaChangeError](
      SchemaInference.evolve(a, changed))
    assert(e.changes.map(_.column) == Seq("x"))
    // unless pinned by config
    assert(SchemaInference.evolve(a, changed, pinned = Set("x"))._2.isEmpty)
  }

  test("evolution = true: a later collect's new column lands, old rows read NULL") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_evolve").toString
    def chunk(name: String, rows: Seq[String]): String = {
      val p = s"$root/$name"
      val w = new java.io.PrintWriter(p)
      try rows.foreach(w.println) finally w.close()
      p
    }
    val c1 = chunk("c1.json", Seq(
      """{"id": 1, "ts": "2024-03-01 10:00:00", "v": 1.5}"""))
    val c2 = chunk("c2.json", Seq(
      """{"id": 2, "ts": "2024-03-02 10:00:00", "v": 2.5, "extra": "new"}"""))
    val lake = graft.lake.Lake(s"$root/lake")
    val spec = graft.config.PartitionSpec("evt", "p0")
    val evolving = graft.config.TableSpec("evt", evolution = true)
    // two separate collects (established resets between calls)
    Ingest.collectJsonl(spark, lake, spec, Seq(c1), evolving,
      timestampColumn = "ts")
    assert(!lake.isEvolved(spark, "evt"))
    Ingest.collectJsonl(spark, lake, spec, Seq(c2), evolving,
      timestampColumn = "ts")
    assert(lake.isEvolved(spark, "evt"))
    val got = lake.read(spark, "evt")
      .select("id", "extra").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> None, 2L -> Some("new")))
    // without evolution, within-call drift still fails fast
    val strict = graft.config.TableSpec("evt2")
    intercept[SchemaInference.SchemaChangeError](
      Ingest.collectJsonl(spark, lake,
        graft.config.PartitionSpec("evt2", "p0"), Seq(c1, c2), strict,
        timestampColumn = "ts", maxChunksPerBatch = 1))
  }
}
