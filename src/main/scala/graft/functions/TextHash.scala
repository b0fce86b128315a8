package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Signature kernels for the dedup operators as native Catalyst
  * expressions — the reference computes these in native loops
  * (MinHash/SimHash over token streams); a Spark expression tree of
  * higher-order functions evaluates interpreted at ~100-200 ns per
  * NODE per element, which made signature building dominate the dedup
  * queries. These kernels run the whole loop in one JVM method
  * (codegen emits a single static call), ~100x less overhead.
  */
object TextHash {

  /** h1/h2 composite MinHash (Kirsch–Mitzenmacher): permutation i's hash
    * of shingle s is `xxh64(s, S1) + i * xxh64(s, S2)` — two string
    * hashes per shingle total, minwise-independent enough for LSH
    * banding (recall gated in DedupSpec).
    */
  def minhashKernel(arr: ArrayData, perms: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val out = Array.fill(perms)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x9E3779B9L)
      var i = 0
      var v = h1
      while (i < perms) {
        if (v < out(i)) out(i) = v
        v += h2
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash: per-bit ±1 votes of xxh64(token, 42) across tokens;
    * bit b of the result is set iff its vote is positive. Returns 0 for
    * an empty token array (matches the fold-from-zero-votes semantics).
    */
  def simhashKernel(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Feature-hashed bag-of-words: histogram of xxh64(token, 42) mod dim,
    * L2-normalized, as one loop (the HashedBow embedding function's
    * kernel). Empty input -> zero vector (norm guard).
    */
  def hashedBowKernel(arr: ArrayData, dim: Int): ArrayData = {
    val n = arr.numElements()
    val counts = new Array[Int](dim)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      val b = ((h % dim) + dim) % dim
      counts(b.toInt) += 1
      j += 1
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += counts(i).toDouble * counts(i); i += 1 }
    val root = math.sqrt(norm)
    val out = new Array[Float](dim)
    i = 0
    while (i < dim) {
      out(i) = if (root == 0.0) 0f else (counts(i) / root).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct character trigrams of `s`, one linear pass — the FTS
    * segment's tokenizer (`rust/index/src/fulltext/types.rs` trigram
    * extraction runs a native sliding window). The SQL formulation
    * `transform(sequence(...), i -> substring(text, i, 3))` re-seeks the
    * UTF8String from the start for every position (substring by
    * character index is O(i)), making extraction quadratic per document
    * — this kernel decodes once and slides, and its UTF-16 window
    * matches the query side's `needle.sliding(3)` exactly.
    */
  def trigramKernel(s: UTF8String): ArrayData = {
    val str = s.toString
    if (str.length < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 3 <= str.length) { seen.add(str.substring(i, i + 3)); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Fitted log-tf·idf sparse embedding kernel: one pass hashes tokens,
    * counts in-vocabulary term frequencies, and emits the sorted
    * `(indices, values)` sparse struct with
    * `w = floor(ln(1+tf)·idf·1024)/1024` — the whole SPLADE-surrogate
    * doc-side computation in one JVM method with O(1) vocabulary lookups
    * (an `element_at` against a map literal scans the literal per
    * lookup; a 2k-term vocab × 100+ terms/doc makes that quadratic).
    */
  def logTfIdfKernel(arr: ArrayData,
      idf: java.util.HashMap[java.lang.Long, java.lang.Double]): InternalRow = {
    val n = arr.numElements()
    val tfm = new java.util.TreeMap[java.lang.Long, Array[Int]]()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      if (idf.containsKey(h)) {
        val c = tfm.get(h)
        if (c == null) tfm.put(h, Array(1)) else c(0) += 1
      }
      j += 1
    }
    val m = tfm.size()
    val ids = new Array[Long](m)
    val ws = new Array[Float](m)
    val it = tfm.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      ids(i) = e.getKey
      ws(i) = (math.floor(math.log(1.0 + e.getValue()(0)) *
        idf.get(e.getKey) * 1024.0) / 1024.0).toFloat
      i += 1
    }
    InternalRow(new GenericArrayData(ids), new GenericArrayData(ws))
  }

  /** Fitted DENSE tf-idf embedding kernel: hash tokens, count
    * in-vocabulary term frequencies into their fitted slots, weight
    * `w = floor(ln(1+tf)·idf·1024)/1024`, L2-normalize. The quantized
    * weights are dyadic rationals with 10 fractional bits, so the
    * norm's sum of squares is EXACT in double regardless of summation
    * order — which is what lets a SQL oracle (summing in its own
    * order) reproduce the normalized result bit-for-bit.
    */
  def vocabTfIdfKernel(arr: ArrayData,
      slots: java.util.HashMap[java.lang.Long, java.lang.Integer],
      idf: Array[Double]): ArrayData = {
    val dim = idf.length
    val tf = new Array[Int](dim)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      val slot = slots.get(h)
      if (slot != null) tf(slot.intValue()) += 1
      j += 1
    }
    val w = new Array[Double](dim)
    var ss = 0.0
    var i = 0
    while (i < dim) {
      if (tf(i) > 0) {
        val x = math.floor(math.log(1.0 + tf(i)) * idf(i) * 1024.0) / 1024.0
        w(i) = x
        ss += x * x
      }
      i += 1
    }
    val out = new Array[Float](dim)
    if (ss > 0.0) {
      val root = math.sqrt(ss)
      i = 0
      while (i < dim) { out(i) = (w(i) / root).toFloat; i += 1 }
    }
    new GenericArrayData(out)
  }

  private val kernelClass = "graft.functions.TextHash"

  private case class MinHashSig(child: Expression, perms: Int)
      extends UnaryExpression {
    override def prettyName: String = "minhash_sig"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes() = {
      require(child.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      }, s"minhash_sig expects array<string>, got ${child.dataType}")
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
    override def nullSafeEval(input: Any): Any =
      minhashKernel(input.asInstanceOf[ArrayData], perms)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val code = nullSafeCodeGen(ctx, ev, a =>
        s"""${ev.value} = $kernelClass.minhashKernel($a, $perms);
           |${ev.isNull} = ${ev.value} == null;
           |""".stripMargin)
      code
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  private case class HashedBowVec(child: Expression, dim: Int)
      extends UnaryExpression {
    override def prettyName: String = "hashed_bow"
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(input: Any): Any =
      hashedBowKernel(input.asInstanceOf[ArrayData], dim)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"$kernelClass.hashedBowKernel($a, $dim)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  private case class DistinctTrigrams(child: Expression)
      extends UnaryExpression {
    override def prettyName: String = "distinct_trigrams"
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(input: Any): Any =
      trigramKernel(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"$kernelClass.trigramKernel($a)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  private case class LogTfIdfVec(child: Expression,
      idf: Map[Long, Double]) extends UnaryExpression {
    override def prettyName: String = "logtfidf_sparse"
    override def dataType: DataType =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("indices",
          ArrayType(LongType, containsNull = false)),
        org.apache.spark.sql.types.StructField("values",
          ArrayType(FloatType, containsNull = false))))
    override def nullIntolerant: Boolean = true
    @transient private lazy val idfMap = {
      val m = new java.util.HashMap[java.lang.Long, java.lang.Double](idf.size * 2)
      idf.foreach { case (k, v) => m.put(k, v) }
      m
    }
    override def nullSafeEval(input: Any): Any =
      logTfIdfKernel(input.asInstanceOf[ArrayData], idfMap)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("idfVocab", idfMap,
        "java.util.HashMap<java.lang.Long, java.lang.Double>")
      defineCodeGen(ctx, ev, a => s"$kernelClass.logTfIdfKernel($a, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  private case class VocabTfIdfVec(child: Expression,
      slots: Map[Long, Int], idf: Seq[Double]) extends UnaryExpression {
    override def prettyName: String = "vocab_tfidf_dense"
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    override def nullIntolerant: Boolean = true
    @transient private lazy val slotMap = {
      val m = new java.util.HashMap[java.lang.Long, java.lang.Integer](slots.size * 2)
      slots.foreach { case (k, v) => m.put(k, v) }
      m
    }
    @transient private lazy val idfArr = idf.toArray
    override def nullSafeEval(input: Any): Any =
      vocabTfIdfKernel(input.asInstanceOf[ArrayData], slotMap, idfArr)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val sref = ctx.addReferenceObj("tfidfSlots", slotMap,
        "java.util.HashMap<java.lang.Long, java.lang.Integer>")
      val iref = ctx.addReferenceObj("tfidfIdf", idfArr, "double[]")
      defineCodeGen(ctx, ev, a => s"$kernelClass.vocabTfIdfKernel($a, $sref, $iref)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  private case class SimHash64(child: Expression) extends UnaryExpression {
    override def prettyName: String = "simhash64"
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(input: Any): Any =
      simhashKernel(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"$kernelClass.simhashKernel($a)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** shingle array<string> -> array<long> of `perms` minhash values;
    * null/empty input -> null row (callers filter empties first).
    */
  def minhashSig(shingles: Column, perms: Int): Column =
    SqlBridge.column(MinHashSig(SqlBridge.expr(shingles), perms))

  /** token array<string> -> 64-bit simhash signature. */
  def simhash64(toks: Column): Column =
    SqlBridge.column(SimHash64(SqlBridge.expr(toks)))

  /** text -> array<string> of its distinct character trigrams (linear). */
  def distinctTrigrams(text: Column): Column =
    SqlBridge.column(DistinctTrigrams(SqlBridge.expr(text)))

  /** token array<string> -> sorted sparse struct of fitted log-tf·idf
    * weights (in-vocabulary terms only).
    */
  def logTfIdfSparse(toks: Column, idf: Map[Long, Double]): Column =
    SqlBridge.column(LogTfIdfVec(SqlBridge.expr(toks), idf))

  /** token array<string> -> L2-normalized dim-bucket hashed BoW vector. */
  def hashedBow(toks: Column, dim: Int): Column =
    SqlBridge.column(HashedBowVec(SqlBridge.expr(toks), dim))

  /** token array<string> -> L2-normalized dense fitted tf-idf vector
    * over a top-|slots| vocabulary (term-hash -> slot, idf by slot).
    */
  def vocabTfIdfDense(toks: Column, slots: Map[Long, Int],
      idf: Seq[Double]): Column =
    SqlBridge.column(VocabTfIdfVec(SqlBridge.expr(toks), slots, idf))

  private def litInt(e: Expression, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(s"$arg must be an integer literal, got $other")
  }

  /** SQL-surface builders for FunctionRegistry injection (GraftExtensions):
    * `minhash_sig(shingles, perms)`, `simhash64(tokens)`,
    * `hashed_bow(tokens, dim)` callable from plain spark.sql text.
    */
  def sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_sig" -> { args => MinHashSig(args(0), litInt(args(1), "perms")) },
    "simhash64" -> { args => SimHash64(args(0)) },
    "hashed_bow" -> { args => HashedBowVec(args(0), litInt(args(1), "dim")) },
    "distinct_trigrams" -> { args => DistinctTrigrams(args(0)) })
}
