package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Search API's rank-expression algebra — `RankExpr`
  * (`rust/types/src/execution/operator.rs:1153-1192`) evaluated the Spark
  * way: each KNN leaf is a score DataFrame, fused by full-outer joins on
  * offset_id, and the expression tree compiles to plain column arithmetic
  * (`operators/rank.rs:102-166` semantics).
  *
  * Per-leaf `default` fills records a leaf didn't retrieve
  * (`coalesce(score, default)` — rank.rs:134-151); `returnRank` scores by
  * 1-based position in the leaf's result list instead of distance.
  *
  * Scale: leaves are already k-bounded (queries × k rows), so the fusion
  * joins are tiny regardless of collection size; Spark broadcasts them.
  */
object Rank {

  sealed trait Expr
  /** Score of KNN leaf `idx`; absent records get `default`. */
  final case class Leaf(idx: Int, default: Double, returnRank: Boolean = false) extends Expr
  final case class Val(v: Double) extends Expr
  final case class Sum(cs: Seq[Expr]) extends Expr
  final case class Sub(a: Expr, b: Expr) extends Expr
  final case class Mul(cs: Seq[Expr]) extends Expr
  final case class Div(a: Expr, b: Expr) extends Expr
  final case class Abs(e: Expr) extends Expr
  final case class Exp(e: Expr) extends Expr
  final case class Log(e: Expr) extends Expr
  final case class Min(cs: Seq[Expr]) extends Expr
  final case class Max(cs: Seq[Expr]) extends Expr

  /** Fuse KNN leaf results (each: offset_id, rank, dist — one query) and
    * evaluate the expression into a `score` column.
    * Returns (offset_id, score) for every record retrieved by >=1 leaf.
    */
  def evaluate(leaves: Seq[DataFrame], expr: Expr): DataFrame = {
    require(leaves.nonEmpty)
    val prepared = leaves.zipWithIndex.map { case (df, i) =>
      df.select(col("offset_id"),
        col("dist").as(s"_dist_$i"), col("rank").cast("double").as(s"_rank_$i"))
    }
    val fused = prepared.reduce(_.join(_, Seq("offset_id"), "full_outer"))

    def compile(e: Expr): Column = e match {
      case Leaf(i, default, returnRank) =>
        val c = if (returnRank) col(s"_rank_$i") else col(s"_dist_$i")
        coalesce(c, lit(default))
      case Val(v)  => lit(v)
      case Sum(cs) => cs.map(compile).reduce(_ + _)
      case Sub(a, b) => compile(a) - compile(b)
      case Mul(cs) => cs.map(compile).reduce(_ * _)
      case Div(a, b) => compile(a) / compile(b)
      case Abs(e0) => abs(compile(e0))
      case Exp(e0) => exp(compile(e0))
      case Log(e0) => log(compile(e0))
      case Min(cs) => least(cs.map(compile): _*)
      case Max(cs) => greatest(cs.map(compile): _*)
    }
    fused.select(col("offset_id"), compile(expr).as("score"))
  }
}
