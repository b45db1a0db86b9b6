package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** COLUMN-LEVEL LINEAGE extraction from an analyzed logical plan — the
  * governance primitive behind impact analysis ("which outputs move if
  * this source column changes?"), PII propagation audits (q49/t5's
  * erasure and scrubbing obligations follow columns THROUGH derived
  * tables), and schema-migration planning. Every output column of a
  * DataFrame is traced to the set of SOURCE (table, column) pairs it
  * transitively depends on, by one bottom-up walk of the analyzed plan:
  *
  *   - leaf relations seed each attribute with (source name, column) —
  *     the source name is the catalog table when present, else the
  *     file-scan root's basename (`…/orders.parquet` → `orders`);
  *   - projection-introducing nodes (Project / Aggregate / Window /
  *     Generate / Expand) map each named expression to the union of its
  *     referenced inputs' lineage;
  *   - Union merges children POSITIONALLY (column i of the union feeds
  *     from column i of every child);
  *   - pass-through nodes (Filter, Join, Sort, Limit, Repartition,
  *     SubqueryAlias, …) contribute their children's maps unchanged —
  *     join/filter CONDITIONS deliberately don't taint outputs: this is
  *     data lineage, not control lineage.
  *
  * Driver-side by nature (plans are driver objects); cost is O(plan),
  * independent of data size. Constant-only outputs (e.g. `count(lit(1))`
  * before grouping refs) surface as `<const>` so every output column
  * appears in the report. Unknown leaf sources degrade to `<unknown>`
  * rather than failing — lineage must be total to be trustworthy as an
  * audit surface.
  */
object Lineage {

  private def leafSource(plan: LogicalPlan): String = plan match {
    case lr: LogicalRelation =>
      lr.catalogTable.map(_.identifier.table).getOrElse(lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.headOption
            .map(p => p.getName.stripSuffix(".parquet"))
            .getOrElse("<unknown>")
        case _ => "<unknown>"
      })
    case _: LocalRelation => "<local>"
    case _ => "<unknown>"
  }

  private type LMap = Map[ExprId, Set[(String, String)]]

  /** Empty dependency sets normalize to `<const>` so every output
    * column appears in the report — lineage must be TOTAL to be
    * trustworthy as an audit surface (an absent column reads as "no
    * such output"). */
  private def orConst(refs: Set[(String, String)]): Set[(String, String)] =
    if (refs.isEmpty) Set(("<const>", "<const>")) else refs

  private def resolve(in: LMap, ne: NamedExpression): (ExprId,
      Set[(String, String)]) = {
    val refs = ne.references.toSeq
      .flatMap(a => in.getOrElse(a.exprId, Set.empty[(String, String)]))
      .toSet
    ne.toAttribute.exprId -> orConst(refs)
  }

  private def walk(plan: LogicalPlan): LMap = plan match {
    case leaf: LeafNode =>
      val t = leafSource(leaf)
      leaf.output.map(a => a.exprId -> Set((t, a.name))).toMap
    case u: Union =>
      val childMaps = u.children.map(walk)
      val merged = u.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> orConst(u.children.zip(childMaps).flatMap {
          case (c, m) =>
            m.getOrElse(c.output(i).exprId, Set.empty[(String, String)])
        }.toSet)
      }.toMap
      childMaps.fold(Map.empty: LMap)(_ ++ _) ++ merged
    case p: Project =>
      val in = walk(p.child)
      in ++ p.projectList.map(resolve(in, _)).toMap
    case a: Aggregate =>
      val in = walk(a.child)
      in ++ a.aggregateExpressions.map(resolve(in, _)).toMap
    case w: Window =>
      val in = walk(w.child)
      in ++ w.windowExpressions.map(resolve(in, _)).toMap
    case g: Generate =>
      val in = walk(g.child)
      val gen = g.generatorOutput.map { out =>
        out.exprId -> orConst(g.generator.references.toSeq
          .flatMap(a => in.getOrElse(a.exprId, Set.empty[(String, String)]))
          .toSet)
      }.toMap
      in ++ gen
    case e: Expand =>
      val in = walk(e.child)
      val own = e.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> orConst(e.projections.flatMap { proj =>
          proj(i).references.toSeq.flatMap(a =>
            in.getOrElse(a.exprId, Set.empty[(String, String)]))
        }.toSet)
      }.toMap
      in ++ own
    case other =>
      other.children.map(walk).fold(Map.empty: LMap)(_ ++ _)
  }

  /** One (out_col, src_table, src_col) row per dependency edge of the
    * DataFrame's output, sorted — the audit report form. */
  def columnLineage(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed
    val m = walk(plan)
    plan.output.flatMap { a: Attribute =>
      m.getOrElse(a.exprId, Set(("<unknown>", a.name)))
        .toSeq.sorted.map { case (t, c) => (a.name, t, c) }
    }.sortBy(identity).toSeq
  }
}
