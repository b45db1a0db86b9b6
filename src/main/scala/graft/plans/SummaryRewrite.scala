package graft.plans

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Cast, Expression, ExprId, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** Materialized-summary rewrite — the "aggregate answered from a
  * pre-aggregated table" optimization every warehouse engine grows: when
  * a query computes `GROUP BY g1[, g2…] → count(*), sum(x)` directly over
  * a registered base table, swap the scan for the table's SUMMARY
  * (per-group partial cnt/sum), re-aggregating the partials. At 100 TB
  * the difference is reading |groups| rows instead of the corpus — the
  * q22 footer-stats idea generalized from whole-table to per-group.
  *
  * Soundness rests on the partial-aggregation algebra ([[graft.operators
  * .Ivm]]): counts add, sums add, min/max re-minimize, so re-aggregating
  * the summary's partials equals aggregating the base — exactly (decimal
  * partials, no float re-association). Because every supported aggregate
  * is re-aggregable, a query may group by any SUBSET of the summary's
  * group columns (a (flag, status) summary answers GROUP BY flag): the
  * re-aggregation collapses the extra group dimensions. The rewrite
  * preserves every outer expression wrapping the aggregate call (casts,
  * arithmetic) and the original output exprIds, so downstream operators
  * are untouched; a result-type widening (`sum` over decimal partials
  * widens the scale bound) is closed with an exact cast back to the
  * original type.
  *
  * Registration is explicit and scoped ([[SummaryRegistry]]): the rule is
  * a no-op unless a summary is registered for the scanned path, and the
  * gate/spec deregister in `finally`. Registered paths are normalized and
  * matched EXACTLY (never by suffix — `lineitem.parquet` must not match an
  * unrelated table in another directory). A registered summary must have
  * columns (groupCols…, cnt: long, sum_v: the exact Sum result type of
  * the base column's cast). Each rewrite splices a FRESH instance of the
  * summary plan (new exprIds), so one query rewriting two aggregates over
  * the base table never ends up with duplicate exprIds post-analysis.
  */
object SummaryRegistry {
  /** normalized basePath -> (summary plan, group col names, summed base
    * col name). `groupCols` lists the summary's grouping columns; queries
    * grouping by any non-empty subset of them rewrite. */
  final case class Entry(summary: LogicalPlan, groupCols: Seq[String],
      sumCol: String)
  object Entry {
    /** Single-group convenience form (the common case). */
    def apply(summary: LogicalPlan, groupCol: String,
        sumCol: String): Entry = Entry(summary, Seq(groupCol), sumCol)
  }
  // the registry object is JVM-global (the rule is an object), so each
  // entry is pinned to the SparkSession that registered it — a
  // registration must never rewrite queries of a CONCURRENT session that
  // happens to scan the same path (its summary table may be stale there)
  private final case class Scoped(entry: Entry, sessionId: Option[String])
  private val defs = new java.util.concurrent.ConcurrentHashMap[String, Scoped]

  private def activeSessionId: Option[String] =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(s => java.lang.System.identityHashCode(s).toString)

  /** Scheme-insensitive canonical form of a table path: `file:/x`,
    * `file:///x` and `/x` all normalize to `/x`; non-file URIs keep
    * scheme+authority. Trailing slashes dropped. Exact equality on this
    * form is the registry's match rule — never `endsWith`. */
  private[plans] def normalize(p: String): String = {
    val hp = new org.apache.hadoop.fs.Path(p)
    val uri = hp.toUri
    val path = uri.getPath.stripSuffix("/")
    if (uri.getScheme == null || uri.getScheme == "file") path
    else s"${uri.getScheme}://${Option(uri.getAuthority).getOrElse("")}$path"
  }

  def register(basePath: String, e: Entry): Unit =
    defs.put(normalize(basePath), Scoped(e, activeSessionId)): Unit
  def deregister(basePath: String): Unit =
    defs.remove(normalize(basePath)): Unit
  def isEmpty: Boolean = defs.isEmpty

  private[plans] def lookup(paths: Seq[String]): Option[Entry] = {
    if (paths.isEmpty) return None
    val norm = paths.map(normalize)
    // the scan must be EXACTLY the registered table (every root path
    // equal) and the lookup must come from the REGISTERING session
    norm.headOption.flatMap(h => Option(defs.get(h)))
      .filter(s => norm.forall(_ == norm.head) &&
        s.sessionId == activeSessionId)
      .map(_.entry)
  }
}

object SummaryRewrite extends Rule[LogicalPlan] {

  /** The scanned file paths under `plan`, looking through column-pruning
    * Projects (attribute-only) down to a parquet relation. */
  private def scanPaths(plan: LogicalPlan): Seq[String] = plan match {
    case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
      scanPaths(child)
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.map(_.toString)
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (SummaryRegistry.isEmpty) return plan // fast path: feature unused
    plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _)
          if agg.resolved && groupExprs.nonEmpty &&
            groupExprs.forall(_.isInstanceOf[AttributeReference]) =>
        val gAttrs = groupExprs.map(_.asInstanceOf[AttributeReference])
        SummaryRegistry.lookup(scanPaths(child)) match {
          case Some(e) if gAttrs.forall(a => e.groupCols.contains(a.name)) =>
            rewrite(agg, gAttrs, aggExprs, e).getOrElse(agg)
          case _ => agg
        }
    }
  }

  private def rewrite(agg: Aggregate, gAttrs: Seq[AttributeReference],
      aggExprs: Seq[NamedExpression],
      e: SummaryRegistry.Entry): Option[LogicalPlan] = {
    // fresh instance per rewrite: two rewritten aggregates in one query
    // must not share scan exprIds (DeduplicateRelations has already run)
    val summary = e.summary.transformUp {
      case m: MultiInstanceRelation => m.newInstance()
    }
    val out = summary.output
    val cntS = out.find(_.name == "cnt")
    val sumS = out.find(_.name == "sum_v")
    val minS = out.find(_.name == "min_v") // optional summary columns
    val maxS = out.find(_.name == "max_v")
    if (cntS.isEmpty || sumS.isEmpty) return None
    // query group attr exprId -> the matching fresh summary attribute
    val gMap: Map[ExprId, Attribute] = gAttrs.flatMap { a =>
      out.find(_.name == a.name).map(s => a.exprId -> s)
    }.toMap
    if (gMap.size != gAttrs.size) return None

    var ok = true
    def rewriteAggCalls(expr: Expression): Expression = expr.transformUp {
      // a FILTER clause restricts which base rows aggregate — the summary
      // cannot answer that; bail on any filtered call
      case ae: AggregateExpression if ae.filter.isDefined =>
        ok = false; ae
      case ae: AggregateExpression => ae.aggregateFunction match {
        // count(*) / count(1) over the base = sum of per-group counts
        // (count of a NULL literal is 0, not the row count — exclude it)
        case Count(Seq(Literal(v, _))) if !ae.isDistinct && v != null =>
          AggregateExpression(Sum(cntS.get), ae.mode, isDistinct = false)
        // sum(cast(x)) over the base = sum of per-group partial sums,
        // cast back to the original (narrower) result type — exact, the
        // partials are the same decimals the base sum would fold. The
        // result-type check pins the cast: sum over a DIFFERENT cast of x
        // (double, string, int) has different semantics and must not match
        case Sum(Cast(a: AttributeReference, _, _, _), _)
            if a.name == e.sumCol && !ae.isDistinct &&
              ae.dataType == sumS.get.dataType =>
          val inner = AggregateExpression(Sum(sumS.get), ae.mode,
            isDistinct = false)
          // re-summing widens the scale bound; close it with an exact cast
          if (inner.dataType == ae.dataType) inner
          else Cast(inner, ae.dataType)
        // min/max over the base = min/max of per-group extremes; the cast
        // target must equal the partial's type (a string/int cast changes
        // the ordering or truncates — different answer, no rewrite)
        case Min(Cast(a: AttributeReference, dt, _, _))
            if a.name == e.sumCol && minS.exists(_.dataType == dt) =>
          AggregateExpression(Min(minS.get), ae.mode, isDistinct = false)
        case Max(Cast(a: AttributeReference, dt, _, _))
            if a.name == e.sumCol && maxS.exists(_.dataType == dt) =>
          AggregateExpression(Max(maxS.get), ae.mode, isDistinct = false)
        case _ => ok = false; ae
      }
    }
    val newList: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference if gMap.contains(a.exprId) =>
        Alias(gMap(a.exprId), a.name)(exprId = a.exprId)
      case al: Alias =>
        val newChild = rewriteAggCalls(al.child).transformUp {
          case a: AttributeReference if gMap.contains(a.exprId) =>
            gMap(a.exprId)
        }
        Alias(newChild, al.name)(exprId = al.exprId)
      case _ => ok = false; gAttrs.head
    }
    // every original aggregate call must have been rewritten and no base
    // attribute may survive (a pattern we didn't recognize -> bail out)
    if (!ok) return None
    val refs = newList.flatMap(_.references.toSeq)
    if (!refs.forall(r => summary.outputSet.contains(r))) return None
    Some(Aggregate(gAttrs.map(a => gMap(a.exprId)), newList, summary))
  }
}
