package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression,
  NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.xml.{XmlFlatParseExpr, XmlMemoParseExpr}

/** Session extensions: `SparkSession.builder.withExtensions(new
  * GraftExtensions)` or `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Registers [[DedupXmlParses]] — the optimizer-level cure for the one
  * plan pathology this engine generates: a bound XML projection references
  * the SAME per-row parse from every member expression, and those
  * references survive as duplicate `from_xml` calls in one Project (Spark's
  * subexpression elimination does not collapse them; Catalyst `With` cannot
  * be built pre-analysis). The per-thread memo in XmlMemoParseExpr already
  * makes duplicates O(1); this rule removes them from the plan entirely.
  *
  * Also registers [[AsOfJoinStrategy]], the planner strategy for the
  * first-class as-of join operator ([[AsOfJoinNode]] -> [[AsOfJoinExec]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => DedupXmlParses)
    e.injectOptimizerRule(_ => PushLambdaThroughGetItem)
    // no-op unless a summary is registered (SummaryRegistry.isEmpty gate)
    e.injectOptimizerRule(_ => SummaryRewrite)
    // post-hoc resolution (NOT optimizer): the Generate-over-alias shape it
    // matches exists only right after analysis — see the rule's scaladoc
    e.injectPostHocResolutionRule(_ => PushLambdaThroughExplode)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

/** Pull repeated (semantically-equal) per-row XML parses of a Project into
  * a dedicated child Project, so each parse runs once per row and the
  * original expressions read the materialized struct. Two parse forms:
  * memo-wrapped `from_xml` (nested native schemas — the pulled alias
  * UNWRAPS the memo, a single evaluation needs no cache) and
  * [[XmlFlatParseExpr]] (flat native schemas — pulled as-is; it IS the
  * parse).
  *
  * Runs in the operator-optimization fixpoint batch next to
  * CollapseProject; the split is stable because CollapseProject refuses to
  * re-inline a non-cheap producer referenced more than once, and after one
  * application each parse appears exactly once. */
object DedupXmlParses extends Rule[LogicalPlan] {

  /** The expression to alias in the pulled Project for a given parse. */
  private def pullTarget(e: Expression): Expression = e match {
    case m: XmlMemoParseExpr => m.child // single eval needs no memo
    case other               => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(list, child) if child.resolved =>
      val counts = mutable.LinkedHashMap.empty[Expression,
        (Expression, Int)]
      def note(e: Expression): Unit = {
        val k = e.canonicalized
        counts.updateWith(k) {
          case Some((ex, n)) => Some((ex, n + 1))
          case None          => Some((e, 1))
        }: Unit
      }
      list.foreach(_.foreach {
        case e: XmlMemoParseExpr => note(e)
        case e: XmlFlatParseExpr => note(e)
        case _ =>
      })
      val pullable = counts.values.collect {
        case (e, n) if n > 1 && e.references.subsetOf(child.outputSet) &&
          e.deterministic => e
      }.toSeq
      if (pullable.isEmpty) p
      else {
        val aliases = pullable.map(e => Alias(pullTarget(e), "_graft_parse")())
        val byKey = pullable.map(_.canonicalized)
          .zip(aliases.map(_.toAttribute)).toMap
        val newList = list.map(_.transformUp {
          case e: XmlMemoParseExpr if byKey.contains(e.canonicalized) =>
            byKey(e.canonicalized)
          case e: XmlFlatParseExpr if byKey.contains(e.canonicalized) =>
            byKey(e.canonicalized)
        }.asInstanceOf[NamedExpression])
        Project(newList, Project(child.output ++ aliases, child))
      }
  }
}
