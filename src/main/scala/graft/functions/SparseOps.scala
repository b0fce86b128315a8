package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, FloatType}

/** Sparse-vector kernels. Chroma stores sparse embeddings as
  * `(indices: Vec<u32>, values: Vec<f32>)` metadata
  * (`rust/types/src/metadata.rs:39`) and scores them with a dot product
  * over posting cursors (`rust/index/src/sparse/reader.rs`). Here the
  * sparse dot is a codegen'd merge-intersection over the two sorted index
  * arrays — O(nnz_a + nnz_b), no shuffle, inside WholeStageCodegen.
  */
object SparseOps {

  /** dot((ia, va), (ib, vb)) with both index arrays sorted ascending.
    * Index arrays may be `ARRAY<INT>` (bounded dictionary ids) or
    * `ARRAY<BIGINT>` (xxhash64'd unbounded-vocabulary ids) — both sides
    * must use the same type.
    */
  private case class SparseDot(first: Expression, second: Expression,
      third: Expression, fourth: Expression) extends QuaternaryExpression {
    override def dataType: DataType = FloatType
    override def prettyName: String = "sparse_dot"
    override def nullIntolerant: Boolean = true

    private def longIndices: Boolean = first.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }

    override protected def nullSafeEval(ia: Any, va: Any, ib: Any, vb: Any): Any = {
      val i1: Array[Long] =
        if (longIndices) ia.asInstanceOf[ArrayData].toLongArray()
        else ia.asInstanceOf[ArrayData].toIntArray().map(_.toLong)
      val v1 = va.asInstanceOf[ArrayData].toFloatArray()
      val i2: Array[Long] =
        if (longIndices) ib.asInstanceOf[ArrayData].toLongArray()
        else ib.asInstanceOf[ArrayData].toIntArray().map(_.toLong)
      val v2 = vb.asInstanceOf[ArrayData].toFloatArray()
      var a = 0; var b = 0; var acc = 0f
      while (a < i1.length && b < i2.length) {
        if (i1(a) == i2(b)) { acc += v1(a) * v2(b); a += 1; b += 1 }
        else if (i1(a) < i2(b)) a += 1
        else b += 1
      }
      acc
    }

    // Locals via ctx.freshName: two sparse_dot calls in one codegen'd
    // projection must not declare duplicate Java variables (Janino failure
    // → silent interpreted fallback).
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (ia, va, ib, vb) => {
        val a = ctx.freshName("a"); val b = ctx.freshName("b")
        val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val acc = ctx.freshName("acc"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
        val (jty, getter) = if (longIndices) ("long", "getLong") else ("int", "getInt")
        s"""int $a = 0, $b = 0;
           |int $na = $ia.numElements(), $nb = $ib.numElements();
           |float $acc = 0f;
           |while ($a < $na && $b < $nb) {
           |  $jty $x = $ia.$getter($a), $y = $ib.$getter($b);
           |  if ($x == $y) { $acc += $va.getFloat($a) * $vb.getFloat($b); $a++; $b++; }
           |  else if ($x < $y) $a++; else $b++;
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression, d: Expression) =
      copy(a, b, c, d)
  }

  def sparseDot(ia: Column, va: Column, ib: Column, vb: Column): Column =
    SqlBridge.column(SparseDot(SqlBridge.expr(ia), SqlBridge.expr(va),
      SqlBridge.expr(ib), SqlBridge.expr(vb)))

  /** SQL-surface builder for FunctionRegistry injection (GraftExtensions). */
  def sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "sparse_dot" -> { args => SparseDot(args(0), args(1), args(2), args(3)) })
}
