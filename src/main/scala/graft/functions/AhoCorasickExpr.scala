package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count every occurrence of every blocklist pattern in ONE pass over a
  * token array — the Aho–Corasick automaton (CACM 1975) over the token
  * alphabet, the kernel behind production curation blocklists.
  *
  * Naive multi-pattern matching scans the document once PER pattern
  * (`P` higher-order-function passes, each re-walking the array); the
  * automaton walks the tokens exactly once regardless of |patterns|,
  * reporting ALL matches — including overlapping occurrences and
  * patterns that end inside longer ones (via output links). That is the
  * property that keeps a 10k-entry blocklist affordable over 100 TB:
  * per-token cost is amortized O(1) transitions, independent of the
  * blocklist size.
  *
  * Returns `array<long>` of occurrence counts aligned with the pattern
  * order given at construction. Patterns are a plan literal — the
  * automaton builds once on the driver and rides to executors inside the
  * codegen reference object ([[BpeApplyExpr]] pattern); per-row work
  * stays inside whole-stage codegen via a static helper call.
  *
  * Match semantics (engine-portable, oracle-replayable): a pattern of L
  * tokens matches at position i iff tokens[i..i+L-1] equals it exactly;
  * every position is counted (overlaps included) — identical to counting
  * positional L-gram equality, which is how the DuckDB oracle replays it.
  */
case class MultiMatchCountsExpr(child: Expression,
    patterns: Seq[Seq[String]]) extends UnaryExpression {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_match_counts needs at least one non-empty pattern")
  require(patterns.distinct.size == patterns.size,
    "multi_match_counts patterns must be distinct")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_match_counts"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"multi_match_counts needs ARRAY<STRING> tokens, got $other")
    }

  @transient private lazy val automaton: MultiMatchCountsExpr.Automaton =
    new MultiMatchCountsExpr.Automaton(
      patterns.map(_.toArray).toArray)

  override def nullSafeEval(input: Any): Any =
    MultiMatchCountsExpr.countAll(input.asInstanceOf[ArrayData], automaton)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[MultiMatchCountsExpr.Automaton].getName)
    val helper = MultiMatchCountsExpr.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $helper.countAll($c, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MultiMatchCountsExpr {

  /** Aho–Corasick automaton over a token (string) alphabet: trie +
    * failure links + output links, built once with the classic BFS.
    * `outPattern(s)` is the pattern index ending exactly at state s (or
    * -1 — distinct patterns end at distinct states); `outLink(s)` is the
    * nearest failure-ancestor that ends a pattern (or -1), so the
    * per-token output walk touches only states that actually report. */
  final class Automaton(patterns: Array[Array[String]])
      extends Serializable {
    val nPatterns: Int = patterns.length
    private val kids =
      scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[String, Integer]())
    private val outPat = scala.collection.mutable.ArrayBuffer(-1)
    // trie insert
    locally {
      var p = 0
      while (p < patterns.length) {
        var st = 0
        patterns(p).foreach { tok =>
          val nxt = kids(st).get(tok)
          if (nxt != null) st = nxt.intValue
          else {
            kids += new java.util.HashMap[String, Integer]()
            outPat += -1
            val id = kids.length - 1
            kids(st).put(tok, Integer.valueOf(id))
            st = id
          }
        }
        outPat(st) = p
        p += 1
      }
    }
    val children: Array[java.util.HashMap[String, Integer]] = kids.toArray
    val outPattern: Array[Int] = outPat.toArray
    val fail: Array[Int] = new Array[Int](children.length)
    val outLink: Array[Int] = Array.fill(children.length)(-1)
    // BFS failure/output links
    locally {
      val q = new java.util.ArrayDeque[Integer]()
      children(0).values.forEach { v => fail(v) = 0; q.add(v) }
      while (!q.isEmpty) {
        val u = q.poll().intValue
        outLink(u) =
          if (outPattern(fail(u)) >= 0 && fail(u) != u) fail(u)
          else outLink(fail(u))
        children(u).forEach { (tok, v) =>
          var f = fail(u)
          var hop = children(f).get(tok)
          while (hop == null && f != 0) {
            f = fail(f)
            hop = children(f).get(tok)
          }
          fail(v) = if (hop != null && hop.intValue != v.intValue)
            hop.intValue else 0
          q.add(v)
        }
      }
    }

    /** One transition: follow failure links until a child exists. */
    def step(state: Int, tok: String): Int = {
      var s = state
      var nxt = children(s).get(tok)
      while (nxt == null && s != 0) {
        s = fail(s)
        nxt = children(s).get(tok)
      }
      if (nxt != null) nxt.intValue else 0
    }
  }

  /** Static per-row kernel (called from generated code): one walk over
    * the tokens, all patterns counted. */
  def countAll(toks: ArrayData, a: Automaton): ArrayData = {
    val counts = new Array[Long](a.nPatterns)
    var st = 0
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      st = a.step(st, toks.getUTF8String(i).toString)
      var o = if (a.outPattern(st) >= 0) st else a.outLink(st)
      while (o >= 0) {
        counts(a.outPattern(o)) += 1
        o = a.outLink(o)
      }
      i += 1
    }
    new GenericArrayData(counts.map(Long.box(_): Any))
  }

  def multi_match_counts(tokens: Column,
      patterns: Seq[Seq[String]]): Column =
    ColumnBridge.column(
      MultiMatchCountsExpr(ColumnBridge.expression(tokens), patterns))
}
