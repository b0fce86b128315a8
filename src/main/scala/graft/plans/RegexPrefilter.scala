package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{And, Contains, Expression, Literal, RLike}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: `col RLIKE pattern` → `col CONTAINS <literal> AND
  * col RLIKE pattern` when the regex contains a long-enough mandatory
  * literal run.
  *
  * This is the Spark-native form of the reference's regex→literal
  * prefilter (`rust/types/src/regex/literal_expr.rs:23-60`, trigram
  * candidate scan `operators/filter.rs:363-455`): the regex itself can't
  * reach the parquet scan, but the implied `Contains` compiles to a
  * `StringContains` data-source filter and prunes row groups / rows
  * before the expensive regex runs. Semantics unchanged — the literal is
  * a necessary condition of the regex.
  *
  * Registered through [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`).
  */
object RegexPrefilter extends Rule[LogicalPlan] {

  private val rewritten = TreeNodeTag[Boolean]("graft.regexPrefilter")
  private val meta = ".*+?()[]{}|\\^$".toSet

  /** Longest literal run that every match must contain. Conservative: a
    * char adjacent to any metacharacter is dropped (quantifiers make the
    * preceding char optional), and any pattern containing alternation,
    * escapes, groups, or character classes bails out entirely — a group
    * may be optional (`(abc)?xyz`) and a class (`ab[x-z]cd`) is not a
    * literal, so runs inside or adjacent to them are NOT mandatory.
    */
  private[graft] def mandatoryLiteral(pattern: String): Option[String] = {
    if (pattern.exists(c => c == '|' || c == '\\' || c == '(' || c == '['))
      return None // alternation/escapes/groups/classes: bail
    val runs = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    val chars = pattern.toCharArray
    var i = 0
    while (i < chars.length) {
      val c = chars(i)
      if (c == '{') {
        // counted quantifier: its digits/comma are syntax, not pattern
        // literals — flush and skip to the closing brace
        if (cur.nonEmpty) { runs += cur.toString; cur.clear() }
        while (i < chars.length && chars(i) != '}') i += 1
      } else {
        val nextIsQuant = i + 1 < chars.length && "*+?{".contains(chars(i + 1))
        if (!meta.contains(c) && !nextIsQuant) cur.append(c)
        else { if (cur.nonEmpty) { runs += cur.toString; cur.clear() } }
      }
      i += 1
    }
    if (cur.nonEmpty) runs += cur.toString
    runs.filter(_.length >= 3).sortBy(-_.length).headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val newCond = cond.transformUp {
        case r @ RLike(e, Literal(p: UTF8String, StringType))
            if r.getTagValue(rewritten).isEmpty =>
          mandatoryLiteral(p.toString) match {
            case Some(lit) =>
              r.setTagValue(rewritten, true)
              And(Contains(e, Literal(UTF8String.fromString(lit), StringType)), r)
            case None =>
              r.setTagValue(rewritten, true)
              r
          }
      }
      if (newCond fastEquals cond) f else Filter(newCond, child)
  }
}

/** Session extension wiring for the engine's custom Catalyst pieces:
  * the regex-prefilter optimizer rule, plus the codegen kernels exposed
  * as SQL functions so `spark.sql` text (and JDBC/thrift users) can call
  * them without the Scala DSL — `cosine_similarity_f32`, `dot_f32`,
  * `l2sq_f32`, `sparse_dot`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RegexPrefilter)
    val fns = graft.functions.Distances.sqlBuilders ++
      graft.functions.SparseOps.sqlBuilders ++
      graft.functions.TextHash.sqlBuilders
    fns.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions", name),
        builder))
    }
  }
}
