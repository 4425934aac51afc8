package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file zone ranges for one column, as the `_graft_colstats`
  * sidecar records them: numeric `[minD, maxD]` (double-widened) and
  * lexicographic `[minS, maxS]` (UTF8 binary order — Spark's
  * `min`/`max` on StringType). `None` bounds mean "unknown / all-null
  * file" and never prune.
  */
private[lake] final case class ColumnZone(
    minD: Option[Double], maxD: Option[Double],
    minS: Option[Array[Byte]], maxS: Option[Array[Byte]])

/** The band a query's pushed conjuncts pin on one column: numeric
  * `[loD, hiD]` and byte-lexicographic `[loS, hiS]`, both optional and
  * both CLOSED intervals. Bands from multiple conjuncts intersect.
  */
private[lake] final case class QueryBand(
    loD: Double = Double.NegativeInfinity,
    hiD: Double = Double.PositiveInfinity,
    loS: Option[Array[Byte]] = None,
    hiS: Option[Array[Byte]] = None) {
  def isUseful: Boolean =
    loD != Double.NegativeInfinity || hiD != Double.PositiveInfinity ||
      loS.isDefined || hiS.isDefined
}

/** A [[FileIndex]] that composes Spark's native partition pruning with
  * ZONE-MAP file skipping fed by the `_graft_colstats` sidecar — the
  * piece that makes [[Lake.readPrunedByColumn]]'s pruning fire for a
  * plain `WHERE value BETWEEN 45 AND 70` written through the filtered
  * view or any SQL/DataFrame query, with no special API call
  * (DuckLake/Delta file skipping, surfaced the way Spark surfaces it:
  * `listFiles(partitionFilters, dataFilters)` receives the pushed
  * conjuncts, so directory pruning has ALREADY happened on
  * `partitionFilters` by the time the zone maps see the survivors —
  * the two prunings compose by construction).
  *
  * Conservative by construction, same contract as
  * [[Lake.readPrunedByColumn]]: a file is skipped only when a pushed
  * band/equality/prefix conjunct on a stats-covered column PROVABLY
  * misses the file's live range; files absent from the sidecar, null
  * ranges, non-literal or OR'd conjuncts, and cast-wrapped columns all
  * keep the file. Row-level filtering still applies in full — pruning
  * is a scan reduction, never a semantics change (the qi29 oracle
  * recomputes the answer from the raw rows and gates exactly this).
  *
  * Scale shape: the sidecar read is metadata-sized (one row per
  * file×column, newest-seq wins) and loads LAZILY on the first
  * `listFiles` — registering views over a hundred tables costs
  * nothing for the tables a session never queries. The driver holds
  * one `(file → column → zone)` map per queried table, the same
  * footprint Delta's log replay accepts.
  *
  * Numeric bands are widened one ULP on extraction (`nextDown`/
  * `nextUp`): zone bounds are double-cast aggregates, so a long-typed
  * literal above 2^53 could otherwise round across a file's true
  * bound. String bounds compare in UTF8 BYTE order (not Java UTF-16
  * order — they differ above the BMP) because that is the order
  * Spark's min/max computed the sidecar bounds in.
  */
private[lake] class ZoneMapFileIndex(
    delegate: FileIndex,
    loadZones: () => Map[String, Map[String, ColumnZone]])
  extends FileIndex {

  private lazy val zones: Map[String, Map[String, ColumnZone]] = loadZones()

  override def rootPaths: Seq[Path] = delegate.rootPaths
  override def inputFiles: Array[String] = delegate.inputFiles
  override def refresh(): Unit = delegate.refresh()
  override def sizeInBytes: Long = delegate.sizeInBytes
  override def partitionSchema: StructType = delegate.partitionSchema
  override def metadataOpsTimeNs: Option[Long] = delegate.metadataOpsTimeNs

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = delegate.listFiles(partitionFilters, dataFilters)
    val bands = ZoneMapFileIndex.extractBands(dataFilters)
    if (bands.isEmpty || zones.isEmpty) base
    else {
      val pruned = base
        .map(pd => PartitionDirectory(pd.values,
          pd.files.filter(f => keepFile(f.getPath, bands))))
        .filter(_.files.nonEmpty)
      // preserve "empty scan still has a schema": an all-pruned scan
      // returns no directories, which FileSourceScanExec handles
      pruned
    }
  }

  private def keepFile(
      p: Path, bands: Map[String, QueryBand]): Boolean = {
    val key = p.toUri.getPath // scheme-less decoded form = sidecar key
    zones.get(key) match {
      case None => true // unknown file: never prune
      case Some(cols) =>
        bands.forall { case (column, band) =>
          cols.get(column) match {
            case None => true // column not stats-covered
            case Some(z) =>
              val numOk =
                (z.minD, z.maxD) match {
                  case (Some(mn), Some(mx)) =>
                    mn <= band.hiD && mx >= band.loD
                  case _ => true
                }
              val strOk =
                (z.minS, z.maxS) match {
                  case (Some(mn), Some(mx)) =>
                    band.hiS.forall(hi =>
                      ZoneMapFileIndex.byteCompare(mn, hi) <= 0) &&
                      band.loS.forall(lo =>
                        ZoneMapFileIndex.byteCompare(mx, lo) >= 0)
                  case _ => true
                }
              numOk && strOk
          }
        }
    }
  }
}

private[lake] object ZoneMapFileIndex {

  /** Unsigned lexicographic byte comparison — UTF8String order. */
  def byteCompare(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** The exclusive upper bound of the prefix range in byte order: the
    * prefix with its LAST byte incremented. Valid UTF-8 never holds
    * 0xFF, so the increment never carries; every string starting with
    * `prefix` is >= prefix and < this bound.
    */
  def prefixUpperBound(prefix: Array[Byte]): Array[Byte] = {
    val out = prefix.clone()
    out(out.length - 1) = (out(out.length - 1) + 1).toByte
    out
  }

  private def numericLit(l: Literal): Option[Double] = l.value match {
    case null => None
    case v => l.dataType match {
      case ByteType    => Some(v.asInstanceOf[Byte].toDouble)
      case ShortType   => Some(v.asInstanceOf[Short].toDouble)
      case IntegerType => Some(v.asInstanceOf[Int].toDouble)
      case LongType    => Some(v.asInstanceOf[Long].toDouble)
      case FloatType   => Some(v.asInstanceOf[Float].toDouble)
      case DoubleType  => Some(v.asInstanceOf[Double])
      case _: DecimalType =>
        Some(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)
      case _ => None
    }
  }

  private def stringLit(l: Literal): Option[Array[Byte]] = l.value match {
    case u: UTF8String if l.dataType == StringType => Some(u.getBytes)
    case _ => None
  }

  /** Fold the pushed conjuncts into per-column closed bands. Handled
    * shapes (both operand orders): `=`, `<`, `<=`, `>`, `>=` against a
    * literal on a BARE attribute, `StartsWith`, and nested `And`.
    * Anything else contributes nothing (conservative). Numeric bounds
    * widen one ULP — see class scaladoc.
    */
  def extractBands(filters: Seq[Expression]): Map[String, QueryBand] = {
    var bands = Map.empty[String, QueryBand]
    def band(name: String): QueryBand =
      bands.getOrElse(name, QueryBand())
    def narrowLoD(a: String, v: Double): Unit = {
      val b = band(a); bands += a -> b.copy(loD = math.max(b.loD, Math.nextDown(v)))
    }
    def narrowHiD(a: String, v: Double): Unit = {
      val b = band(a); bands += a -> b.copy(hiD = math.min(b.hiD, Math.nextUp(v)))
    }
    def narrowLoS(a: String, v: Array[Byte]): Unit = {
      val b = band(a)
      val lo = b.loS.filter(cur => byteCompare(cur, v) >= 0).getOrElse(v)
      bands += a -> b.copy(loS = Some(lo))
    }
    def narrowHiS(a: String, v: Array[Byte]): Unit = {
      val b = band(a)
      val hi = b.hiS.filter(cur => byteCompare(cur, v) <= 0).getOrElse(v)
      bands += a -> b.copy(hiS = Some(hi))
    }
    def visit(e: Expression): Unit = e match {
      case And(l, r) => visit(l); visit(r)
      case EqualTo(a: AttributeReference, l: Literal) => eq(a.name, l)
      case EqualTo(l: Literal, a: AttributeReference) => eq(a.name, l)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => lo(a.name, l)
      case GreaterThan(a: AttributeReference, l: Literal) => lo(a.name, l)
      case LessThanOrEqual(a: AttributeReference, l: Literal) => hi(a.name, l)
      case LessThan(a: AttributeReference, l: Literal) => hi(a.name, l)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) => hi(a.name, l)
      case GreaterThan(l: Literal, a: AttributeReference) => hi(a.name, l)
      case LessThanOrEqual(l: Literal, a: AttributeReference) => lo(a.name, l)
      case LessThan(l: Literal, a: AttributeReference) => lo(a.name, l)
      case StartsWith(a: AttributeReference, l: Literal) =>
        stringLit(l).filter(_.nonEmpty).foreach { p =>
          narrowLoS(a.name, p); narrowHiS(a.name, prefixUpperBound(p))
        }
      case _ => // non-prunable conjunct: contributes nothing
    }
    def eq(a: String, l: Literal): Unit = { lo(a, l); hi(a, l) }
    def lo(a: String, l: Literal): Unit = {
      numericLit(l).foreach(narrowLoD(a, _))
      stringLit(l).foreach(narrowLoS(a, _))
    }
    def hi(a: String, l: Literal): Unit = {
      numericLit(l).foreach(narrowHiD(a, _))
      stringLit(l).foreach(narrowHiS(a, _))
    }
    filters.foreach(visit)
    bands.filter(_._2.isUseful)
  }
}
