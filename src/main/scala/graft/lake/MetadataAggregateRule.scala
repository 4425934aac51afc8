package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** Answer whole-table `count(*) / count(c) / min(c) / max(c)` SQL from
  * lake metadata — the query-path face of [[Lake.statsAggregate]], so a
  * user typing `SELECT count(*), max(value) FROM t` against a
  * registered view gets the manifest+sidecar answer with ZERO data-file
  * reads. Spark's own `OptimizeMetadataOnlyQuery` serves only
  * partition-column aggregates from listings; Delta rewrites
  * count/min/max from its transaction log the same way this rule does
  * from the `_graft_colstats` sidecar. At 100 TB the difference is a
  * full-corpus scan vs a metadata read.
  *
  * Fires ONLY when every piece is provably exact:
  *
  *  - the plan is an ungrouped [[Aggregate]] whose child reaches a
  *    [[ZoneMapFileIndex]]-backed lake relation through at most
  *    column-pruning projections — any Filter, grouping, join, or
  *    expression in between keeps the plan untouched
  *  - every output is a non-distinct, unfiltered `count(literal)`,
  *    `count(col)`, `min(col)`, `max(col)` (or a constant)
  *  - the relation covers the WHOLE table ([[ZoneMapFileIndex.owner]]
  *    is set only for full-table reads, never pre-pruned subsets)
  *  - [[Lake.statsAggregateIfCovered]] confirms EVERY live file is
  *    metadata-answerable (sidecar rows present and trusted, no
  *    unrecorded files, long bounds under 2^53, supported types) —
  *    otherwise the rule DECLINES rather than scan at optimize time,
  *    and the query runs its normal plan
  *
  * The metadata probe itself is metadata-sized (a manifest read and
  * one sidecar aggregate) and runs only after the full structural
  * match, so non-candidate queries pay a pattern match and nothing
  * else. The rewrite replaces the aggregate with a one-row
  * [[LocalRelation]] carrying the same attribute ids, types and
  * nullability, so downstream operators and reuse are unaffected.
  * The qi33 oracle gates exactness (DuckDB recomputes from raw rows)
  * and pins files-read == 0 through the SQL path.
  */
final case class MetadataAggregateRule(session: SparkSession)
  extends Rule[LogicalPlan] {

  import MetadataAggregateRule._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate if agg.groupingExpressions.isEmpty =>
      rewrite(agg).getOrElse(agg)
    case agg: Aggregate
        if agg.groupingExpressions.forall(g =>
          g.isInstanceOf[AttributeReference] &&
            graft.lake.TpSchema.partitionCols.contains(
              g.asInstanceOf[AttributeReference].name)) =>
      // GROUP BY physical partition columns: per-group counts/ranges
      // come from the manifest+sidecar keyed by each file's directory
      rewriteGrouped(agg).getOrElse(agg)
  }

  /** Descend through alias/view wrappers, PURE column-pruning
    * projections, and Filter nodes (their AND-folded condition is
    * returned for the partition-only check) to the relation; anything
    * else disqualifies.
    */
  private def unwrap(p: LogicalPlan)
      : Option[(LogicalRelation, Option[Expression])] = p match {
    case s: SubqueryAlias => unwrap(s.child)
    case v: View => unwrap(v.child)
    case f: Filter => unwrap(f.child).map { case (lr, c) =>
      (lr, Some(c.map(And(f.condition, _)).getOrElse(f.condition)))
    }
    case pr: Project
        if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(pr.child)
    case lr: LogicalRelation => Some((lr, None))
    case _ => None
  }

  /** A WHERE clause is metadata-compatible iff it is deterministic and
    * references ONLY physical partition columns of convertible types —
    * then its truth is CONSTANT per file directory, and evaluating it
    * against each file's directory values is EXACTLY the partition
    * pruning a scan would do. Returns the per-file predicate, or None
    * when the condition cannot be served (the rewrite then declines).
    */
  private def partitionFilePredicate(
      lake: Lake, table: String,
      cond: Expression): Option[String => Boolean] = {
    if (!cond.deterministic) return None
    val refs = cond.references.toSeq
    val attrs = refs.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (!attrs.forall(a =>
      graft.lake.TpSchema.partitionCols.contains(a.name))) return None
    if (!attrs.forall(_.dataType match {
      case IntegerType | LongType | StringType => true
      case _ => false
    })) return None
    val bound = BindReferences.bindReference(cond,
      org.apache.spark.sql.catalyst.expressions.AttributeSeq(attrs))
    Some { file =>
      val pv = lake.partitionValues(lake.relOf(table, file))
      val row = InternalRow.fromSeq(attrs.map(a =>
        dirValueToInternal(pv.getOrElse(a.name, null), a.dataType)))
      val r = bound.eval(row)
      r != null && r.asInstanceOf[Boolean] // null = filtered out (SQL)
    }
  }

  private def dirValueToInternal(
      s: String, dt: org.apache.spark.sql.types.DataType): Any =
    if (s == null ||
      s == org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .DEFAULT_PARTITION_NAME) null
    else dt match {
      case IntegerType => s.toInt
      case LongType => s.toLong
      case _ => org.apache.spark.unsafe.types.UTF8String.fromString(s)
    }

  /** Explain-lint probe: Some(aggregated column names) when the
    * OPTIMIZED plan still contains an Aggregate this rule was
    * structurally able to serve — i.e. the rewrite was possible but
    * DECLINED (missing sidecar coverage, unrecorded files, a bound
    * past 2^53) — so `.explain` can tell the user what to enable.
    * None when nothing was missed (not a candidate, or the rewrite
    * fired and no Aggregate remains).
    */
  private[graft] def missedCandidate(
      plan: LogicalPlan): Option[Seq[String]] =
    plan.collectFirst(Function.unlift {
      case agg: Aggregate => structuralCandidate(agg)
      case _ => None
    })

  private def structuralCandidate(agg: Aggregate): Option[Seq[String]] = {
    if (!agg.groupingExpressions.forall(g =>
      g.isInstanceOf[AttributeReference] &&
        graft.lake.TpSchema.partitionCols.contains(
          g.asInstanceOf[AttributeReference].name))) return None
    val (lr, cond) = unwrap(agg.child).getOrElse(return None)
    val (lake, table) = (lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case z: ZoneMapFileIndex => z.owner
        case _ => None
      }
      case _ => None
    }).getOrElse(return None)
    // a filter must itself be metadata-compatible, or "could be
    // served" would be a false promise: partition-only, or a
    // tp_timestamp band (whose hybrid needs tp_timestamp stats — the
    // lint then names that column in the enablement command)
    val bandShaped = cond match {
      case None => false
      case Some(c) =>
        if (partitionFilePredicate(lake, table, c).isDefined) false
        else splitBand(c) match {
          case Some((lo, hi, n, rest)) if n > 0 && lo <= hi &&
              rest.forall(rc =>
                partitionFilePredicate(lake, table, rc).isDefined) =>
            true
          case _ => return None
        }
    }
    val specs = agg.aggregateExpressions.map {
      // bare attrs are grouping-column pass-throughs in the grouped
      // shape; the lint needn't re-validate their exprIds
      case _: AttributeReference => Some(CountStar)
      case e => classify(e)
    }
    if (specs.exists(_.isEmpty)) None
    else Some((specs.flatten.collect {
      case CountCol(a) => a.name
      case MinCol(a) => a.name
      case MaxCol(a) => a.name
      case SumCol(a) => a.name
    } ++ (if (bandShaped) Seq(graft.lake.TpSchema.Timestamp)
          else Nil)).distinct)
  }

  private def classify(e: NamedExpression): Option[Spec] = e match {
    case Alias(ae: AggregateExpression, _) => classifyAgg(ae)
    case Alias(l: Literal, _) => Some(Passthrough(l.value))
    case _ => None
  }

  private def classifyAgg(ae: AggregateExpression): Option[Spec] =
    if (ae.isDistinct || ae.filter.isDefined) None
    else ae.aggregateFunction match {
      case Count(Seq(l: Literal)) if l.value != null => Some(CountStar)
      case Count(Seq(a: AttributeReference)) => Some(CountCol(a))
      case Min(a: AttributeReference) => Some(MinCol(a))
      case Max(a: AttributeReference) => Some(MaxCol(a))
      // sum over an INTEGRAL column only: integer addition is
      // order-independent, so per-file sums merge exactly; float sums
      // are order-sensitive and never metadata-served. The result-type
      // guard keeps decimal/interval inputs out.
      case s: Sum if s.dataType == LongType => s.child match {
        case a: AttributeReference => a.dataType match {
          case org.apache.spark.sql.types.ByteType |
               org.apache.spark.sql.types.ShortType |
               IntegerType | LongType => Some(SumCol(a))
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (lr, cond) = unwrap(agg.child).getOrElse(return None)
    val (lake, table) = (lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case z: ZoneMapFileIndex => z.owner
        case _ => None
      }
      case _ => None
    }).getOrElse(return None)
    val fileFilter: String => Boolean = cond match {
      case None => _ => true
      case Some(c) =>
        partitionFilePredicate(lake, table, c) match {
          case Some(p) => p
          // not partition-only: a tp_timestamp band (plus optional
          // partition conjuncts) gets the HYBRID rewrite — contained
          // files from metadata, straddlers scanned in-plan
          case None => return rewriteBand(agg, lr, lake, table, c)
        }
    }
    // a WHERE that filters rows away can leave zero surviving rows in
    // a group of aggregates whose types we can't synthesize a correct
    // empty result for without the parts — handled below (nRows == 0
    // still yields the correct count-0 / null-min row)
    val specs = agg.aggregateExpressions.map(classify)
    if (specs.exists(_.isEmpty)) return None
    val flat = specs.flatten
    val cols = flat.collect {
      case CountCol(a) => a.name
      case MinCol(a) => a.name
      case MaxCol(a) => a.name
      case SumCol(a) => a.name
    }.distinct
    // count-only columns need just the sidecar's null/row counts; only
    // min/max targets must also have exact zone ranges, and only sum
    // targets the per-file value sums
    val rangeCols = flat.collect {
      case MinCol(a) => a.name
      case MaxCol(a) => a.name
    }.toSet
    val sumCols = flat.collect { case SumCol(a) => a.name }.toSet
    val parts = lake.statsAggregateIfCovered(session, table, cols,
      rangeCols, sumCols, fileFilter).getOrElse(return None)
    // a sum past Long.MaxValue has no exact BIGINT value — decline
    if (!flat.collect { case SumCol(a) => a.name }.forall(c =>
      parts.sums.get(c).forall(_.isValidLong))) return None
    val values: Seq[Any] = flat.map {
      case CountStar => parts.nRows
      case CountCol(a) => parts.counts.getOrElse(a.name, 0L)
      case MinCol(a) =>
        CatalystTypeConverters.convertToCatalyst(
          parts.mins.get(a.name).orNull)
      case MaxCol(a) =>
        CatalystTypeConverters.convertToCatalyst(
          parts.maxs.get(a.name).orNull)
      case SumCol(a) =>
        parts.sums.get(a.name).map(s => Long.box(s.toLong)).orNull
      case Passthrough(v) => v // Literal.value is already internal
    }
    logInfo(s"metadata-aggregate rewrite fired for lake table '$table': " +
      s"${flat.size} aggregates answered from the manifest+sidecar")
    Some(LocalRelation(agg.aggregateExpressions.map(_.toAttribute),
      Seq(InternalRow.fromSeq(values))))
  }

  /** TIME-BAND hybrid rewrite — the reference's dominant query shape
    * (`WHERE tp_timestamp BETWEEN a AND b`, optionally with partition
    * conjuncts) as plain SQL: files the manifest proves fully inside
    * the band (and the sidecar proves null-ts-free) contribute their
    * counts/sums/ranges as a one-row [[LocalRelation]]; only the
    * edge-straddling files stay IN the plan, as a partial aggregate
    * over a relation restricted to exactly those files (the original
    * filter still applied row-level), merged by a final aggregate
    * carrying the original output attribute ids. For a month-wide band
    * over a year of files, the scan is two boundary days — through
    * SQL, with no API call. The classification runs metadata-sized
    * jobs at optimize time; the straddler scan executes distributed in
    * the plan, never at optimize time. Declines (whole plan untouched)
    * when no file is provably contained — then the zone-map FileIndex
    * already prunes the scan to the overlapping files and a hybrid
    * buys nothing.
    */
  /** Split a WHERE into tp_timestamp band bounds (micros, strict
    * bounds converted exactly: `> X` ≡ `>= X+1µs`) and the residual
    * non-band conjuncts. None when a band conjunct has a null/odd
    * literal; `(lo, hi, 0, Some(cond))` when no band conjunct exists.
    * Shared by [[rewriteBand]] and the explain-lint probe.
    */
  private def splitBand(cond: Expression)
      : Option[(Long, Long, Int, Option[Expression])] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def isTs(a: AttributeReference): Boolean =
      a.name == graft.lake.TpSchema.Timestamp &&
        a.dataType == org.apache.spark.sql.types.TimestampType
    def us(l: Literal): Option[Long] = l.dataType match {
      case org.apache.spark.sql.types.TimestampType
          if l.value != null => Some(l.value.asInstanceOf[Long])
      case _ => None
    }
    var lo = Long.MinValue
    var hi = Long.MaxValue
    var nBand = 0
    val rest = Seq.newBuilder[Expression]
    conjuncts(cond).foreach {
      case GreaterThanOrEqual(a: AttributeReference, l: Literal)
          if isTs(a) => us(l) match {
        case Some(v) => lo = math.max(lo, v); nBand += 1
        case None => return None
      }
      case GreaterThan(a: AttributeReference, l: Literal) if isTs(a) =>
        us(l) match {
          case Some(v) if v < Long.MaxValue =>
            lo = math.max(lo, v + 1); nBand += 1
          case _ => return None
        }
      case LessThanOrEqual(a: AttributeReference, l: Literal)
          if isTs(a) => us(l) match {
        case Some(v) => hi = math.min(hi, v); nBand += 1
        case None => return None
      }
      case LessThan(a: AttributeReference, l: Literal) if isTs(a) =>
        us(l) match {
          case Some(v) if v > Long.MinValue =>
            hi = math.min(hi, v - 1); nBand += 1
          case _ => return None
        }
      // reversed operand orders
      case LessThanOrEqual(l: Literal, a: AttributeReference)
          if isTs(a) => us(l) match {
        case Some(v) => lo = math.max(lo, v); nBand += 1
        case None => return None
      }
      case LessThan(l: Literal, a: AttributeReference) if isTs(a) =>
        us(l) match {
          case Some(v) if v < Long.MaxValue =>
            lo = math.max(lo, v + 1); nBand += 1
          case _ => return None
        }
      case GreaterThanOrEqual(l: Literal, a: AttributeReference)
          if isTs(a) => us(l) match {
        case Some(v) => hi = math.min(hi, v); nBand += 1
        case None => return None
      }
      case GreaterThan(l: Literal, a: AttributeReference) if isTs(a) =>
        us(l) match {
          case Some(v) if v > Long.MinValue =>
            hi = math.min(hi, v - 1); nBand += 1
          case _ => return None
        }
      // band-neutral: rows failing it fail the band anyway
      case IsNotNull(a: AttributeReference) if isTs(a) => ()
      case p => rest += p
    }
    Some((lo, hi, nBand, rest.result().reduceOption(And)))
  }

  private def rewriteBand(
      agg: Aggregate, lr: LogicalRelation,
      lake: Lake, table: String,
      cond: Expression): Option[LogicalPlan] = {
    val (lo, hi, nBand, partCond) = splitBand(cond).getOrElse(return None)
    if (nBand == 0 || lo > hi) return None
    val fileFilter: String => Boolean = partCond match {
      case None => _ => true
      case Some(pc) =>
        partitionFilePredicate(lake, table, pc).getOrElse(return None)
    }
    val specs = agg.aggregateExpressions.map(classify)
    if (specs.exists(s => s.isEmpty ||
      s.get.isInstanceOf[Passthrough])) return None
    val flat = specs.flatten
    val cols = flat.collect {
      case CountCol(a) => a.name
      case MinCol(a) => a.name
      case MaxCol(a) => a.name
      case SumCol(a) => a.name
    }.distinct
    val rangeCols = flat.collect {
      case MinCol(a) => a.name
      case MaxCol(a) => a.name
    }.toSet
    val sumColsS = flat.collect { case SumCol(a) => a.name }.toSet
    if (!lake.hasData(session, table)) return None
    val schema = lake.schemaOf(session, table)
    if (!cols.forall(schema.fieldNames.contains)) return None
    val (parts, straddlers, containedCount) = lake.timeBandParts(
      session, table, lo, hi, cols, schema, rangeCols, sumColsS,
      fileFilter)
    if (containedCount <= 0) return None // hybrid buys nothing
    if (!sumColsS.forall(c => parts.sums.get(c).forall(_.isValidLong)))
      return None

    // the metadata partial as internal values, one slot per aggregate
    val localValues: Seq[Any] = flat.map {
      case CountStar => parts.nRows
      case CountCol(a) => parts.counts.getOrElse(a.name, 0L)
      case MinCol(a) =>
        CatalystTypeConverters.convertToCatalyst(
          parts.mins.get(a.name).orNull)
      case MaxCol(a) =>
        CatalystTypeConverters.convertToCatalyst(
          parts.maxs.get(a.name).orNull)
      case SumCol(a) =>
        parts.sums.get(a.name).map(s => Long.box(s.toLong)).orNull
      case _ => return None // GroupKey/Passthrough unreachable here
    }
    def slotType(s: Spec): org.apache.spark.sql.types.DataType = s match {
      case CountStar | CountCol(_) | SumCol(_) => LongType
      case MinCol(a) => a.dataType
      case MaxCol(a) => a.dataType
      case _ => LongType
    }
    val localAttrs: Seq[AttributeReference] = flat.zipWithIndex.map {
      case (s, i) => AttributeReference(s"_band_$i", slotType(s))()
    }
    val local = LocalRelation(localAttrs,
      Seq(InternalRow.fromSeq(localValues)))

    if (straddlers.isEmpty) {
      // nothing to scan: emit the final row directly
      logInfo(s"time-band rewrite fired for '$table': fully contained, " +
        s"no straddlers")
      return Some(LocalRelation(
        agg.aggregateExpressions.map(_.toAttribute),
        Seq(InternalRow.fromSeq(localValues))))
    }

    // straddler-restricted relation with the ORIGINAL output attrs —
    // the filter/projections above keep their bindings untouched
    val fsRel = lr.relation.asInstanceOf[HadoopFsRelation]
    val straddlerIndex =
      new org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
        session, straddlers.map(new org.apache.hadoop.fs.Path(_)),
        Map("basePath" -> lake.tableDir(table)), None)
    val straddlerRel = HadoopFsRelation(straddlerIndex,
      fsRel.partitionSchema, fsRel.dataSchema, fsRel.bucketSpec,
      fsRel.fileFormat, fsRel.options)(session)
    val swappedChild = agg.child.transform {
      case l: LogicalRelation if l eq lr => lr.copy(relation = straddlerRel)
    }
    // prune the scan to the aggregated columns (the optimizer's
    // ColumnPruning already ran; without this Project the straddler
    // scan would read every column)
    val neededNames = flat.collect {
      case CountCol(a) => a; case MinCol(a) => a
      case MaxCol(a) => a; case SumCol(a) => a
    }.map(_.exprId).toSet
    val needed = agg.child.output.filter(a => neededNames.contains(a.exprId))
    val pruned =
      if (needed.nonEmpty) Project(needed, swappedChild)
      else swappedChild // pure count(*): the filter column is read anyway
    val partialExprs: Seq[NamedExpression] = flat.zip(localAttrs).map {
      case (s, slot) =>
        val fn: AggregateFunction = s match {
          case CountStar => Count(Literal(1))
          case CountCol(a) => Count(a)
          case MinCol(a) => Min(a)
          case MaxCol(a) => Max(a)
          case SumCol(a) => Sum(a)
          case _ => return None
        }
        Alias(fn.toAggregateExpression(), slot.name)(exprId = slot.exprId)
    }
    val partial = Aggregate(Nil, partialExprs, pruned)
    val union = Union(Seq(local, partial))
    // merge under the ORIGINAL output names/exprIds: counts and sums
    // add, ranges re-extremize
    val unionOut = union.output
    val mergeExprs: Seq[NamedExpression] =
      agg.aggregateExpressions.zip(flat).zipWithIndex.map {
        case ((orig, s), i) =>
          val in = unionOut(i)
          val fn: AggregateFunction = s match {
            case CountStar | CountCol(_) | SumCol(_) => Sum(in)
            case MinCol(_) => Min(in)
            case MaxCol(_) => Max(in)
            case _ => return None
          }
          Alias(fn.toAggregateExpression(), orig.name)(
            exprId = orig.exprId)
      }
    logInfo(s"time-band rewrite fired for '$table': $containedCount " +
      s"contained files from metadata, ${straddlers.size} straddlers " +
      "scanned in-plan")
    Some(Aggregate(Nil, mergeExprs, union))
  }

  /** GROUPED band hybrid: `GROUP BY partition columns` + a
    * tp_timestamp band. Per-group metadata partials over the contained
    * files become LOCAL rows (group-key slots + value slots); the
    * straddler scan keeps the SAME grouping over the restricted
    * relation, and the final GROUP BY over the union merges metadata
    * groups with scanned groups wherever they overlap — no group
    * alignment logic at all, the grouped merge IS the alignment.
    */
  private def rewriteBandGrouped(
      agg: Aggregate, lr: LogicalRelation,
      lake: Lake, table: String,
      cond: Expression): Option[LogicalPlan] = {
    val (lo, hi, nBand, partCond) = splitBand(cond).getOrElse(return None)
    if (nBand == 0 || lo > hi) return None
    val fileFilter: String => Boolean = partCond match {
      case None => _ => true
      case Some(pc) =>
        partitionFilePredicate(lake, table, pc).getOrElse(return None)
    }
    val groupAttrs = agg.groupingExpressions
      .map(_.asInstanceOf[AttributeReference])
    if (!groupAttrs.forall(a => a.dataType match {
      case IntegerType | LongType | StringType => true
      case _ => false
    })) return None
    def keyIndex(a: AttributeReference): Option[Int] = {
      val i = groupAttrs.indexWhere(_.exprId == a.exprId)
      if (i < 0) None else Some(i)
    }
    val specs: Seq[Option[Spec]] = agg.aggregateExpressions.map {
      case a: AttributeReference => keyIndex(a).map(GroupKey)
      case Alias(a: AttributeReference, _) => keyIndex(a).map(GroupKey)
      case e => classify(e)
    }
    if (specs.exists(s => s.isEmpty || s.get.isInstanceOf[Passthrough]))
      return None
    val flat = specs.flatten
    val valueSpecs = flat.filterNot(_.isInstanceOf[GroupKey])
    val cols = valueSpecs.collect {
      case CountCol(a) => a.name
      case MinCol(a) => a.name
      case MaxCol(a) => a.name
      case SumCol(a) => a.name
    }.distinct
    val rangeCols = valueSpecs.collect {
      case MinCol(a) => a.name
      case MaxCol(a) => a.name
    }.toSet
    val sumColsS = valueSpecs.collect { case SumCol(a) => a.name }.toSet
    if (!lake.hasData(session, table)) return None
    val schema = lake.schemaOf(session, table)
    if (!cols.forall(schema.fieldNames.contains)) return None
    val (groups, straddlers, containedCount) = lake.timeBandPartsGrouped(
      session, table, lo, hi, cols, schema, rangeCols, sumColsS,
      f => {
        val pv = lake.partitionValues(lake.relOf(table, f))
        groupAttrs.map(a => pv.getOrElse(a.name, null))
      }, fileFilter)
    if (containedCount <= 0) return None // hybrid buys nothing
    if (!groups.forall { case (_, p) =>
      sumColsS.forall(c => p.sums.get(c).forall(_.isValidLong))
    }) return None

    def valueOf(parts: Lake.StatsAggParts, s: Spec): Any = s match {
      case CountStar => parts.nRows
      case CountCol(a) => parts.counts.getOrElse(a.name, 0L)
      case MinCol(a) =>
        CatalystTypeConverters.convertToCatalyst(
          parts.mins.get(a.name).orNull)
      case MaxCol(a) =>
        CatalystTypeConverters.convertToCatalyst(
          parts.maxs.get(a.name).orNull)
      case SumCol(a) =>
        parts.sums.get(a.name).map(v => Long.box(v.toLong)).orNull
      case _ => null
    }

    if (straddlers.isEmpty) {
      // fully contained: emit the final rows directly
      val rows = groups.map { case (key, parts) =>
        InternalRow.fromSeq(flat.map {
          case GroupKey(i) =>
            dirValueToInternal(key(i), groupAttrs(i).dataType)
          case s => valueOf(parts, s)
        })
      }
      logInfo(s"grouped time-band rewrite fired for '$table': fully " +
        s"contained, ${groups.size} groups from metadata")
      return Some(LocalRelation(
        agg.aggregateExpressions.map(_.toAttribute), rows))
    }

    // local side: key slots then value slots, canonical order
    def slotType(s: Spec): org.apache.spark.sql.types.DataType = s match {
      case MinCol(a) => a.dataType
      case MaxCol(a) => a.dataType
      case _ => LongType
    }
    val nKeys = groupAttrs.size
    val keySlots = groupAttrs.zipWithIndex.map { case (a, i) =>
      AttributeReference(s"_bgk_$i", a.dataType)()
    }
    val valSlots = valueSpecs.zipWithIndex.map { case (s, i) =>
      AttributeReference(s"_bgv_$i", slotType(s))()
    }
    val localRows = groups.map { case (key, parts) =>
      InternalRow.fromSeq(
        groupAttrs.indices.map(i =>
          dirValueToInternal(key(i), groupAttrs(i).dataType)) ++
          valueSpecs.map(s => valueOf(parts, s)))
    }
    val local = LocalRelation(keySlots ++ valSlots, localRows)

    // straddler side: SAME grouping over the restricted relation
    val fsRel = lr.relation.asInstanceOf[HadoopFsRelation]
    val straddlerIndex =
      new org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
        session, straddlers.map(new org.apache.hadoop.fs.Path(_)),
        Map("basePath" -> lake.tableDir(table)), None)
    val straddlerRel = HadoopFsRelation(straddlerIndex,
      fsRel.partitionSchema, fsRel.dataSchema, fsRel.bucketSpec,
      fsRel.fileFormat, fsRel.options)(session)
    val swappedChild = agg.child.transform {
      case l: LogicalRelation if l eq lr => lr.copy(relation = straddlerRel)
    }
    val neededIds = (valueSpecs.collect {
      case CountCol(a) => a; case MinCol(a) => a
      case MaxCol(a) => a; case SumCol(a) => a
    } ++ groupAttrs).map(_.exprId).toSet
    val needed = agg.child.output.filter(a => neededIds.contains(a.exprId))
    val pruned =
      if (needed.nonEmpty) Project(needed, swappedChild) else swappedChild
    val partialValueExprs: Seq[NamedExpression] =
      valueSpecs.zip(valSlots).map { case (s, slot) =>
        val fn: AggregateFunction = s match {
          case CountStar => Count(Literal(1))
          case CountCol(a) => Count(a)
          case MinCol(a) => Min(a)
          case MaxCol(a) => Max(a)
          case SumCol(a) => Sum(a)
          case _ => return None
        }
        Alias(fn.toAggregateExpression(), slot.name)(exprId = slot.exprId)
      }
    val partial = Aggregate(groupAttrs,
      groupAttrs.map(a => a: NamedExpression) ++ partialValueExprs,
      pruned)
    val union = Union(Seq(local, partial))
    val unionOut = union.output
    // value-slot index per flat position (duplicate specs are fine:
    // the mapping is positional, never by equality)
    val valueIdx: Map[Int, Int] = {
      var v = -1
      flat.zipWithIndex.flatMap {
        case (s, i) if !s.isInstanceOf[GroupKey] => v += 1; Some(i -> v)
        case _ => None
      }.toMap
    }
    val mergeExprs: Seq[NamedExpression] =
      agg.aggregateExpressions.zip(flat).zipWithIndex.map {
        case (((orig, GroupKey(k))), _) =>
          Alias(unionOut(k), orig.name)(exprId = orig.exprId)
        case ((orig, s), i) =>
          val in = unionOut(nKeys + valueIdx(i))
          val fn: AggregateFunction = s match {
            case CountStar | CountCol(_) | SumCol(_) => Sum(in)
            case MinCol(_) => Min(in)
            case MaxCol(_) => Max(in)
            case _ => return None
          }
          Alias(fn.toAggregateExpression(), orig.name)(exprId = orig.exprId)
      }
    logInfo(s"grouped time-band rewrite fired for '$table': " +
      s"${groups.size} metadata groups + ${straddlers.size} straddler " +
      "files scanned in-plan")
    Some(Aggregate(unionOut.take(nKeys), mergeExprs, union))
  }

  /** Partition-grouped rewrite: `GROUP BY tp_partition/tp_index/
    * tp_year/tp_month` with the same aggregate family — one output row
    * per partition group present in the manifest, group-key values
    * taken from the files' directories (partitionBy strips the columns
    * from the files, so directory truth IS column truth).
    */
  private def rewriteGrouped(agg: Aggregate): Option[LogicalPlan] = {
    val (lr, cond) = unwrap(agg.child).getOrElse(return None)
    val (lake, table) = (lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case z: ZoneMapFileIndex => z.owner
        case _ => None
      }
      case _ => None
    }).getOrElse(return None)
    val fileFilter: String => Boolean = cond match {
      case None => _ => true
      case Some(c) =>
        partitionFilePredicate(lake, table, c) match {
          case Some(p) => p
          // not partition-only: try the GROUPED band hybrid
          case None => return rewriteBandGrouped(agg, lr, lake, table, c)
        }
    }
    val groupAttrs = agg.groupingExpressions
      .map(_.asInstanceOf[AttributeReference])
    // group-key types the directory string can be converted to exactly
    if (!groupAttrs.forall(a => a.dataType match {
      case IntegerType | LongType | StringType => true
      case _ => false
    })) return None
    def keyIndex(a: AttributeReference): Option[Int] = {
      val i = groupAttrs.indexWhere(_.exprId == a.exprId)
      if (i < 0) None else Some(i)
    }
    val specs: Seq[Option[Spec]] = agg.aggregateExpressions.map {
      case a: AttributeReference => keyIndex(a).map(GroupKey)
      case Alias(a: AttributeReference, _) => keyIndex(a).map(GroupKey)
      case e => classify(e)
    }
    if (specs.exists(_.isEmpty)) return None
    val flat = specs.flatten
    val cols = flat.collect {
      case CountCol(a) => a.name
      case MinCol(a) => a.name
      case MaxCol(a) => a.name
      case SumCol(a) => a.name
    }.distinct
    val rangeCols = flat.collect {
      case MinCol(a) => a.name
      case MaxCol(a) => a.name
    }.toSet
    val sumCols = flat.collect { case SumCol(a) => a.name }.toSet
    val groups = lake.statsAggregateGroupedIfCovered(session, table,
      groupAttrs.map(_.name), cols, rangeCols, sumCols, fileFilter)
      .getOrElse(return None)
    // any group's sum past Long.MaxValue: decline the whole rewrite
    if (!groups.forall { case (_, parts) =>
      sumCols.forall(c => parts.sums.get(c).forall(_.isValidLong))
    }) return None
    val rows = groups.map { case (key, parts) =>
      InternalRow.fromSeq(flat.map {
        case GroupKey(i) =>
          dirValueToInternal(key(i), groupAttrs(i).dataType)
        case CountStar => parts.nRows
        case CountCol(a) => parts.counts.getOrElse(a.name, 0L)
        case MinCol(a) =>
          CatalystTypeConverters.convertToCatalyst(
            parts.mins.get(a.name).orNull)
        case MaxCol(a) =>
          CatalystTypeConverters.convertToCatalyst(
            parts.maxs.get(a.name).orNull)
        case SumCol(a) =>
          parts.sums.get(a.name).map(s => Long.box(s.toLong)).orNull
        case Passthrough(v) => v
      })
    }
    logInfo(s"metadata-aggregate GROUPED rewrite fired for lake table " +
      s"'$table': ${groups.size} groups from the manifest+sidecar")
    Some(LocalRelation(agg.aggregateExpressions.map(_.toAttribute), rows))
  }
}

object MetadataAggregateRule {

  private sealed trait Spec
  private case object CountStar extends Spec
  private final case class CountCol(a: AttributeReference) extends Spec
  private final case class MinCol(a: AttributeReference) extends Spec
  private final case class MaxCol(a: AttributeReference) extends Spec
  private final case class SumCol(a: AttributeReference) extends Spec
  private final case class Passthrough(value: Any) extends Spec
  private final case class GroupKey(i: Int) extends Spec

  /** Idempotent per-session install into
    * `spark.experimental.extraOptimizations` — the embedded/library
    * twin of the `spark.sql.extensions` deployment in GraftExtensions.
    * Called from `Views.register`, so every session that registers
    * lake views gets the rewrite.
    */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[MetadataAggregateRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          MetadataAggregateRule(spark)
  }
}
