package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, ArrayTransform, CaseWhen, Expression, Explode, If,
  LambdaFunction, Literal, NamedLambdaVariable, PosExplode}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.ArrayType

/** Rewrite `posexplode(transform(arr, λ))` / `explode(transform(arr, λ))`
  * into `posexplode(arr)` followed by a Project that applies λ to the
  * exploded element.
  *
  * Why this matters: higher-order functions (ArrayTransform) are
  * CodegenFallback — the λ body runs INTERPRETED, per element, inside the
  * transform. Worse, InferFiltersFromGenerate duplicates the whole
  * generator input into a Filter (`size(e) > 0 AND isnotnull(e)`), so an
  * expensive transform is evaluated up to three times per row. After this
  * rewrite the λ body is a plain projection over the exploded rows —
  * whole-stage-codegen'd, evaluated exactly once per element — and the
  * inferred filter duplicates only the (memoized) array producer. For the
  * XML DSL's array parsers (`transform(xml_children(..), bind)` +
  * posexplode — the x2 gate shape) this roughly halves end-to-end time,
  * and `SimplifyExtractValueOps` can then slice struct-building λ bodies
  * down to just the fields the query reads.
  *
  * Semantics are identical: explode(transform(a, f)) emits f(a[i]) for
  * every i — including null elements, which both forms pass through f.
  * The rewrite is skipped for `outer` generates (an outer explode emits a
  * null ELEMENT row for empty arrays, where f must NOT run), multi-arg
  * lambdas, and non-deterministic bodies.
  *
  * Registered as a POST-HOC RESOLUTION rule, not an optimizer rule: right
  * after analysis the plan still has the pristine `Generate` directly over
  * the `Project` that aliases the transform; by optimizer time,
  * projection/limit pushdown and filter inference have interleaved nodes
  * between them and the match would be a fragile multi-node walk. */
object PushLambdaThroughExplode extends Rule[LogicalPlan] {

  private type Lam = (Expression, Expression, NamedLambdaVariable)

  /** The DSL's parse() null-guards its result (`CASE WHEN x IS NOT NULL
    * THEN transform(..) END`); hoist the guard INTO the transform's array
    * argument — `transform(null) = null`, so `guard(transform(a, f)) =
    * transform(guard(a), f)` — which exposes the bare transform. */
  private def hoistNullGuard(e: Expression): Expression = e match {
    case CaseWhen(Seq((c, t: ArrayTransform)), None) =>
      t.copy(argument = CaseWhen(Seq((c, t.argument)), None))
    case If(c, t: ArrayTransform, Literal(null, _)) =>
      t.copy(argument = If(c, t.argument,
        Literal(null, t.argument.dataType)))
    case other => other
  }

  private def asTransform(e: Expression): Option[Lam] =
    hoistNullGuard(e) match {
      case ArrayTransform(arr,
          LambdaFunction(body, Seq(v: NamedLambdaVariable), _))
        if body.deterministic => Some((arr, body, v))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case g: Generate if !g.outer && g.resolved =>
      val arg = g.generator match {
        case PosExplode(e) => Some((e, true))
        case Explode(e)    => Some((e, false))
        case _             => None
      }
      arg.flatMap { case (e, pos) =>
        e match {
          // transform inline in the generator
          case t if asTransform(t).isDefined =>
            val (arr, body, v) = asTransform(t).get
            Some(rebuild(g, g.child, arr, body, v, pos))
          // transform aliased in the child Project (the common two-select
          // DSL shape): ADD a raw-array alias beside it and explode that —
          // the original alias stays for any other consumer and
          // ColumnPruning drops it later when (as usual) it is dead
          case a: Attribute =>
            g.child match {
              case p: Project =>
                p.projectList.collectFirst {
                  case al: Alias if al.exprId == a.exprId &&
                      asTransform(al.child).isDefined =>
                    val (arr, body, v) = asTransform(al.child).get
                    val rawAl = Alias(arr, "__xkids")()
                    val newP = Project(p.projectList :+ rawAl, p.child)
                    rebuild(g, newP, rawAl.toAttribute, body, v, pos)
                }
              case _ => None
            }
          case _ => None
        }
      }.getOrElse(g)
  }

  /** `g` explodes `transform(arr, λ{v → body})`: emit `g` exploding `arr`
    * itself, with λ applied above as a Project that restores `g`'s exact
    * output (same attribute ids, and the helper `__xkids`/`__xelem`
    * attributes do not escape). */
  private def rebuild(g: Generate, child: LogicalPlan, arr: Expression,
      body: Expression, v: NamedLambdaVariable, pos: Boolean): LogicalPlan = {
    val at = arr.dataType.asInstanceOf[ArrayType]
    val elem = AttributeReference("__xelem", at.elementType,
      nullable = at.containsNull)()
    val colAttr = g.generatorOutput.last
    val newOut =
      if (pos) Seq(g.generatorOutput.head, elem) else Seq(elem)
    val newGen = if (pos) PosExplode(arr) else Explode(arr)
    val newG = g.copy(generator = newGen, generatorOutput = newOut,
      child = child)
    val newBody = body.transform {
      case nv: NamedLambdaVariable if nv.exprId == v.exprId => elem
    }
    // g.requiredChildOutput is the ORIGINAL child's output (this rule runs
    // at analysis time, before ColumnPruning marks anything unrequired), so
    // the Project reproduces g.output exactly
    Project((g.requiredChildOutput ++ newOut.init) :+
      Alias(newBody, colAttr.name)(colAttr.exprId), newG)
  }
}
