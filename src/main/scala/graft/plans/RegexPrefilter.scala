package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{And, Contains, Expression, Literal, Or, RLike}
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

  // ---- regex → mandatory-literal analysis -------------------------------
  // The reference converts a regex HIR into a literal EXPRESSION — an
  // and/or tree of required substrings — and answers it from the trigram
  // index (`rust/types/src/regex/literal_expr.rs:23-60`). Same analysis
  // here: parse the validated subset into a tiny AST, derive a bounded
  // DNF of literal runs every match must contain. Conservative at every
  // unknown (classes, dot, anchors, zero-min quantifiers → True), so the
  // result is always a sound NECESSARY condition of the regex.

  private sealed trait RNode
  private case class RChr(c: Char) extends RNode
  private case class RRun(s: String) extends RNode
  private case class RCat(elems: Seq[RNode]) extends RNode
  private case class RAlt(parts: Seq[RNode]) extends RNode
  // required at least once, but literals inside must not merge with
  // neighbors (a group/`+` boundary breaks runs: `ab+c` requires a, b, c
  // but NOT the contiguous "abc")
  private case class RBarrier(inner: RNode) extends RNode
  private case object ROpaque extends RNode

  /** Alternatives cap: the Cat cross-product can blow up a DNF
    * (`(a|b)(c|d)(e|f)…`); past this the analysis bails to a full scan.
    */
  private val MaxAlts = 16

  private def parse(pattern: String): Option[RNode] = {
    if (pattern.contains('\\')) return None // escapes: bail (subset rule)
    val cs = pattern.toCharArray
    var i = 0
    def parseAlt(): RNode = {
      val first = parseCat()
      if (first == null) return null
      val parts = scala.collection.mutable.ArrayBuffer[RNode](first)
      while (i < cs.length && cs(i) == '|') {
        i += 1
        val p = parseCat()
        if (p == null) return null
        parts += p
      }
      if (parts.size == 1) parts.head else RAlt(parts.toSeq)
    }
    def parseCat(): RNode = {
      val elems = scala.collection.mutable.ArrayBuffer[RNode]()
      while (i < cs.length && cs(i) != '|' && cs(i) != ')') {
        var e: RNode = cs(i) match {
          case '(' =>
            i += 1
            if (i + 1 < cs.length && cs(i) == '?' && cs(i + 1) == ':') i += 2
            else if (i < cs.length && cs(i) == '?')
              return null // inline flags/lookaround: not in the subset
            val inner = parseAlt()
            if (inner == null) return null
            if (i >= cs.length || cs(i) != ')') return null // unbalanced
            i += 1
            RBarrier(inner)
          case '[' =>
            i += 1
            if (i < cs.length && cs(i) == ']') i += 1 // leading ] is literal
            while (i < cs.length && cs(i) != ']') i += 1
            if (i >= cs.length) return null
            i += 1
            ROpaque
          case '.' | '^' | '$' => i += 1; ROpaque
          case '*' | '+' | '?' | '{' | '}' => i += 1; ROpaque // stray meta
          case c => i += 1; RChr(c)
        }
        // quantifier suffix on the element just parsed
        if (i < cs.length) cs(i) match {
          case '*' | '?' => e = ROpaque; i += 1
          case '+' => e = RBarrier(e); i += 1
          case '{' =>
            i += 1
            val sb = new StringBuilder
            while (i < cs.length && cs(i) != '}') { sb.append(cs(i)); i += 1 }
            if (i >= cs.length) return null
            i += 1
            val min = sb.toString.takeWhile(_.isDigit)
            e = if (min.nonEmpty && min.toLong >= 1) RBarrier(e) else ROpaque
          case _ => ()
        }
        // lazy/possessive modifier after a quantifier (`a*?`, `a++`)
        if (i < cs.length && (cs(i) == '?' || cs(i) == '+') &&
            (e == ROpaque || e.isInstanceOf[RBarrier])) i += 1
        elems += e
      }
      RCat(elems.toSeq)
    }
    val n = parseAlt()
    if (n == null || i < cs.length) None else Some(n)
  }

  private def dnfOf(n: RNode): Option[Seq[Seq[String]]] = n match {
    case RChr(c) => Some(Seq(Seq(c.toString)))
    case RRun(s) => Some(Seq(Seq(s)))
    case ROpaque => Some(Seq(Seq.empty)) // True: one empty conjunction
    case RBarrier(inner) => dnfOf(inner)
    case RAlt(parts) =>
      val ds = parts.map(dnfOf)
      if (ds.exists(_.isEmpty)) None
      else {
        val all = ds.flatMap(_.get)
        if (all.size > MaxAlts) None else Some(all)
      }
    case RCat(elems) =>
      // merge ADJACENT plain chars into contiguous literal runs first —
      // barriers (groups, `+`) intentionally break the merge
      val merged = scala.collection.mutable.ArrayBuffer[RNode]()
      val run = new StringBuilder
      def flushRun(): Unit =
        if (run.nonEmpty) { merged += RRun(run.toString); run.clear() }
      elems.foreach {
        case RChr(c) => run.append(c)
        case e => flushRun(); merged += e
      }
      flushRun()
      merged.foldLeft(Option(Seq(Seq.empty[String]))) { (accO, e) =>
        for {
          acc <- accO
          d <- dnfOf(e)
          if acc.size * d.size <= MaxAlts
        } yield for { a <- acc; b <- d } yield a ++ b
      }
  }

  /** The pattern's mandatory literals as a bounded DNF: a match MUST
    * contain, for at least one alternative, EVERY literal of that
    * alternative (each ≥ 3 chars — the trigram floor). None when the
    * analysis can't certify any constraint (opaque pattern, an
    * unconstrained alternative, DNF blowup) — callers fall back to the
    * plain regex scan.
    */
  private[graft] def literalDnf(pattern: String): Option[Seq[Seq[String]]] =
    parse(pattern).flatMap(dnfOf).flatMap { dnf =>
      val cleaned = dnf.map(_.filter(_.length >= 3).distinct)
      if (cleaned.isEmpty || cleaned.exists(_.isEmpty)) None
      else Some(cleaned)
    }

  /** Single strongest literal for scan pushdown: defined only when the
    * DNF has exactly one alternative (no OR — a data-source
    * `StringContains` filter can't express disjunction).
    */
  private[graft] def mandatoryLiteral(pattern: String): Option[String] =
    literalDnf(pattern).collect {
      case Seq(conj) if conj.nonEmpty => conj.maxBy(_.length)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val newCond = cond.transformUp {
        case r @ RLike(e, Literal(p: UTF8String, StringType))
            if r.getTagValue(rewritten).isEmpty =>
          literalDnf(p.toString) match {
            case Some(dnf) =>
              r.setTagValue(rewritten, true)
              // one alternative → AND of Contains, each a pushable
              // StringContains; several → Or-of-Ands, a row-level
              // prefilter that short-circuits the expensive regex
              val lits = dnf.map(conj => conj.map(l =>
                  Contains(e, Literal(UTF8String.fromString(l), StringType))
                    : Expression)
                .reduce(And(_, _)))
              And(lits.reduce(Or(_, _)), r)
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
