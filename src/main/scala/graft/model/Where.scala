package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Chroma `Where` filter AST and its Catalyst compiler.
  *
  * Mirrors the reference's filter DSL (`rust/types/src/metadata.rs:1400-1404`
  * composite / document / metadata expressions; operators at
  * `metadata.rs:2053-2169`) re-expressed as a Catalyst `Column` builder, so
  * Spark pushes the whole predicate into the parquet scan where possible.
  *
  * ## Missing-key semantics (the hard part)
  *
  * Chroma filters are **two-valued**, not SQL ternary
  * (oracle: `chromadb/test/property/test_filtering.py:32-84`):
  *   - `$eq/$gt/$gte/$lt/$lte/$in/$contains`: FALSE when the key is absent;
  *   - `$ne/$nin/$not_contains`: TRUE when the key is absent.
  * Every compiled comparison is therefore wrapped in `coalesce(_, absent)`
  * — never rely on SQL NULL propagation.
  *
  * Metadata is shredded into typed maps (`meta_str`, `meta_int`,
  * `meta_float`, `meta_bool`, plus `_arr` variants), mirroring the
  * reference's typed indexes (`rust/index/src/metadata/types.rs:88-121`).
  * Numeric comparisons promote int/float to double (DuckDB-compatible),
  * checking both typed maps.
  */
object Where {

  sealed trait Expr {
    def &&(other: Expr): Expr = And(Seq(this, other))
    def ||(other: Expr): Expr = Or(Seq(this, other))
  }

  final case class And(children: Seq[Expr]) extends Expr
  final case class Or(children: Seq[Expr]) extends Expr

  sealed trait Value
  final case class VStr(v: String) extends Value
  final case class VInt(v: Long) extends Value
  final case class VFloat(v: Double) extends Value
  final case class VBool(v: Boolean) extends Value

  /** $eq $ne $gt $gte $lt $lte — `PrimitiveOperator`, metadata.rs:2053-2061 */
  final case class Cmp(key: String, op: String, value: Value) extends Expr
  /** $in $nin — `SetOperator`, metadata.rs:2134 */
  final case class SetIn(key: String, values: Seq[Value], negated: Boolean) extends Expr
  /** array metadata $contains / $not_contains — `ContainsOperator`, metadata.rs:2169 */
  final case class ArrContains(key: String, value: Value, negated: Boolean) extends Expr
  /** document $contains / $not_contains (literal, case-sensitive) — metadata.rs:1738-1780 */
  final case class DocContains(needle: String, negated: Boolean) extends Expr
  /** document $regex / $not_regex — metadata.rs:1775-1781 */
  final case class DocRegex(pattern: String, negated: Boolean) extends Expr
  /** restrict to explicit user ids — `operator.rs:182-185` */
  final case class IdIn(ids: Seq[String]) extends Expr

  /** Document-contains needles that are MANDATORY for the whole predicate
    * — usable as an index prefilter. And: either side's needles prune;
    * Or: only needles required by EVERY branch prune; negations and
    * non-document leaves contribute none. (Same conservative stance as
    * the regex literal prefilter; the reference routes where_document
    * through its FTS segment identically.)
    */
  def mandatoryContains(e: Expr): Seq[String] = e match {
    case DocContains(n, false) if n.length >= 3 => Seq(n)
    case And(cs) => cs.flatMap(mandatoryContains).distinct
    case Or(cs) if cs.nonEmpty =>
      cs.map(mandatoryContains(_).toSet).reduce(_ intersect _).toSeq.sorted
    case _ => Seq.empty
  }

  /** Alternatives cap for [[containsDnf]] — past it the analysis bails
    * to a full scan (the And cross-product can blow up on nested Ors).
    */
  private val MaxContainsAlts = 16

  /** The predicate's mandatory contains-needles as a bounded DNF — the
    * alternation-aware upgrade of [[mandatoryContains]], mirroring
    * [[graft.plans.RegexPrefilter.literalDnf]]: a matching record must,
    * for at least one alternative, contain EVERY needle of that
    * alternative, so `$or(contains(a), contains(b))` serves from the FTS
    * index as ids(a) ∪ ids(b) instead of falling back to the scan.
    * Non-document leaves, negations, and short needles are True
    * (conservative); None when no constraint survives — callers scan.
    */
  def containsDnf(e: Expr): Option[Seq[Seq[String]]] = {
    def go(e: Expr): Option[Seq[Seq[String]]] = e match {
      case DocContains(n, false) if n.length >= 3 => Some(Seq(Seq(n)))
      case And(cs) =>
        cs.foldLeft(Option(Seq(Seq.empty[String]))) { (accO, c) =>
          for {
            acc <- accO
            d <- go(c)
            if acc.size * d.size <= MaxContainsAlts
          } yield for { a <- acc; b <- d } yield a ++ b
        }
      case Or(cs) if cs.nonEmpty =>
        val ds = cs.map(go)
        if (ds.exists(_.isEmpty)) None
        else {
          val all = ds.flatMap(_.get)
          if (all.size > MaxContainsAlts) None else Some(all)
        }
      case _ => Some(Seq(Seq.empty)) // True: no constraint from this leaf
    }
    go(e).flatMap { dnf =>
      val cleaned = dnf.map(_.distinct)
      if (cleaned.isEmpty || cleaned.exists(_.isEmpty)) None else Some(cleaned)
    }
  }

  /** Typed lookup of `key` in the shredded metadata maps. */
  private def lookup(key: String, v: Value): Column = v match {
    case VStr(_)   => element_at(col("meta_str"), key)
    case VBool(_)  => element_at(col("meta_bool"), key)
    // numeric: promote int/float to double, check both typed maps
    case _ => coalesce(
      element_at(col("meta_int"), key).cast("double"),
      element_at(col("meta_float"), key))
  }

  private def litOf(v: Value): Column = v match {
    case VStr(s)   => lit(s)
    case VInt(i)   => lit(i.toDouble)
    case VFloat(f) => lit(f)
    case VBool(b)  => lit(b)
  }

  private def arrLookup(key: String, v: Value): Column = v match {
    case VStr(_)   => element_at(col("meta_str_arr"), key)
    case VBool(_)  => element_at(col("meta_bool_arr"), key)
    case VInt(_)   => element_at(col("meta_int_arr"), key).cast("array<double>")
    case VFloat(_) => element_at(col("meta_float_arr"), key).cast("array<double>")
  }

  /** Compile to a Catalyst predicate over the record schema. */
  def compile(e: Expr): Column = e match {
    case And(cs) => cs.map(compile).reduce(_ && _)
    case Or(cs)  => cs.map(compile).reduce(_ || _)

    case Cmp(k, op, v) =>
      val value = lookup(k, v)
      val l = litOf(v)
      op match {
        case "$eq"  => coalesce(value === l, lit(false))
        case "$ne"  => coalesce(value =!= l, lit(true)) // TRUE on absent key
        case "$gt"  => coalesce(value > l, lit(false))
        case "$gte" => coalesce(value >= l, lit(false))
        case "$lt"  => coalesce(value < l, lit(false))
        case "$lte" => coalesce(value <= l, lit(false))
        case other  => throw new IllegalArgumentException(s"bad op $other")
      }

    case SetIn(k, vs, negated) =>
      val value = lookup(k, vs.head)
      val in = value.isin(vs.map {
        case VStr(s) => s; case VInt(i) => i.toDouble; case VFloat(f) => f; case VBool(b) => b
      }: _*)
      if (negated) coalesce(!in, lit(true)) else coalesce(in, lit(false))

    case ArrContains(k, v, negated) =>
      val c = array_contains(arrLookup(k, v), litOf(v))
      if (negated) coalesce(!c, lit(true)) else coalesce(c, lit(false))

    case DocContains(needle, negated) =>
      val c = col("document").contains(lit(needle))
      if (negated) coalesce(!c, lit(true)) else coalesce(c, lit(false))

    case DocRegex(pattern, negated) =>
      validateRegexSubset(pattern)
      val c = col("document").rlike(pattern)
      if (negated) coalesce(!c, lit(true)) else coalesce(c, lit(false))

    case IdIn(ids) => col("id").isin(ids: _*)
  }

  /** The reference's `where_document` admits ONLY document leaves
    * (`$contains/$not_contains/$regex/$not_regex`) under `$and`/`$or`
    * (`chromadb/api/types.py` WhereDocument validation); a metadata or
    * id leaf there is a malformed request, rejected before planning.
    */
  private[graft] def validateDocOnly(e: Expr): Unit = e match {
    case And(cs) => cs.foreach(validateDocOnly)
    case Or(cs) => cs.foreach(validateDocOnly)
    case DocContains(_, _) | DocRegex(_, _) => ()
    case other => throw new IllegalArgumentException(
      s"where_document admits only document leaves under $$and/$$or, got: $other")
  }

  /** Reject patterns outside the Rust-regex subset the reference accepts
    * (`rust/types/src/regex/hir.rs:14-26` is the whole allowed surface —
    * the Rust regex crate has no look-around, no atomic/conditional
    * groups, no backreferences). Java's `rlike` would happily evaluate
    * them and silently diverge from the reference, so they fail loudly at
    * compile/parse time instead.
    */
  private[graft] def validateRegexSubset(p: String): Unit = {
    def fail(what: String): Nothing = throw new IllegalArgumentException(
      s"regex uses $what, which is outside the reference's Rust-regex subset: $p")
    var i = 0
    while (i < p.length) {
      p(i) match {
        case '\\' =>
          if (i + 1 < p.length) {
            val c = p(i + 1)
            if (c.isDigit && c != '0') fail(s"a backreference \\$c")
            if (c == 'k') fail("a named backreference \\k")
          }
          i += 2
        case '(' if p.startsWith("(?", i) =>
          val rest = p.substring(math.min(i + 2, p.length))
          if (rest.startsWith("=") || rest.startsWith("!")) fail("look-ahead")
          if (rest.startsWith("<=") || rest.startsWith("<!")) fail("look-behind")
          if (rest.startsWith(">")) fail("an atomic group")
          if (rest.startsWith("(")) fail("a conditional group")
          i += 1
        case _ => i += 1
      }
    }
  }
}
