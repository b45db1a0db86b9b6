package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** Materialized-summary rewrite — the "aggregate answered from a
  * pre-aggregated table" optimization every warehouse engine grows: when
  * a query computes `GROUP BY g → count(*), sum(x)` directly over a
  * registered base table, swap the scan for the table's SUMMARY
  * (per-group partial cnt/sum), re-aggregating the partials. At 100 TB
  * the difference is reading |groups| rows instead of the corpus — the
  * q22 footer-stats idea generalized from whole-table to per-group.
  *
  * Soundness rests on the partial-aggregation algebra ([[graft.operators
  * .Ivm]]): counts add, sums add, so `sum(cnt)` / `sum(sum_v)` over the
  * summary equal `count(*)` / `sum(x)` over the base — exactly (decimal
  * partials, no float re-association). The rewrite preserves every outer
  * expression wrapping the aggregate call (casts, arithmetic) and the
  * original output exprIds, so downstream operators are untouched; a
  * result-type widening (`sum` over decimal partials widens the scale
  * bound) is closed with an exact cast back to the original type.
  *
  * Registration is explicit and scoped ([[SummaryRegistry]]): the rule is
  * a no-op unless a summary is registered for the scanned path, and the
  * gate/spec deregister in `finally`. A registered summary must have
  * columns (groupCol, cnt: long, sum_v: the exact Sum result type of the
  * base column's cast).
  */
object SummaryRegistry {
  /** basePath -> (summary plan, groupCol name, summed base col name). */
  final case class Entry(summary: LogicalPlan, groupCol: String,
      sumCol: String)
  private val defs = new java.util.concurrent.ConcurrentHashMap[String, Entry]

  def register(basePath: String, e: Entry): Unit = defs.put(basePath, e): Unit
  def deregister(basePath: String): Unit = defs.remove(basePath): Unit
  def isEmpty: Boolean = defs.isEmpty

  private[plans] def lookup(paths: Seq[String]): Option[Entry] = {
    val it = defs.entrySet().iterator()
    while (it.hasNext) {
      val kv = it.next()
      if (paths.exists(_.endsWith(kv.getKey))) return Some(kv.getValue)
    }
    None
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
      case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _)
          if agg.resolved =>
        SummaryRegistry.lookup(scanPaths(child)) match {
          case Some(e) if g.name == e.groupCol =>
            rewrite(agg, g, aggExprs, e).getOrElse(agg)
          case _ => agg
        }
    }
  }

  private def rewrite(agg: Aggregate, g: AttributeReference,
      aggExprs: Seq[NamedExpression],
      e: SummaryRegistry.Entry): Option[LogicalPlan] = {
    val out = e.summary.output
    val gS = out.find(_.name == e.groupCol)
    val cntS = out.find(_.name == "cnt")
    val sumS = out.find(_.name == "sum_v")
    val minS = out.find(_.name == "min_v") // optional summary columns
    val maxS = out.find(_.name == "max_v")
    if (gS.isEmpty || cntS.isEmpty || sumS.isEmpty) return None

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
      case a: AttributeReference if a.exprId == g.exprId =>
        Alias(gS.get, a.name)(exprId = a.exprId)
      case al: Alias =>
        val newChild = rewriteAggCalls(al.child).transformUp {
          case a: AttributeReference if a.exprId == g.exprId => gS.get
        }
        Alias(newChild, al.name)(exprId = al.exprId)
      case _ => ok = false; g
    }
    // every original aggregate call must have been rewritten and no base
    // attribute may survive (a pattern we didn't recognize -> bail out)
    if (!ok) return None
    val refs = newList.flatMap(_.references.toSeq)
    if (!refs.forall(r => e.summary.outputSet.contains(r))) return None
    Some(Aggregate(Seq(gS.get), newList, e.summary))
  }
}
