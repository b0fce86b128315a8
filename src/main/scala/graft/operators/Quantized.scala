package graft.operators

import graft.functions.Distances
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantized two-phase KNN — the reference's RaBitQ path
  * (`rust/index/src/quantization/{mod.rs,single_bit.rs}`,
  * `orchestration/quantized_spann_knn.rs`): cheap coarse distance on 1-bit
  * codes, exact re-rank of the survivors.
  *
  * 1-bit code = sign bit per dimension, packed into LONG words (64 dims →
  * 1 word). Coarse distance = Hamming distance via `bit_count(xor)` —
  * pure codegen'd integer ops, ~50× cheaper than the float kernel and 16×
  * smaller to scan (8 bytes vs 256 for 64-d f32). Phase 2 re-ranks the
  * top `alpha*k` coarse candidates with the exact kernel.
  *
  * At 100 TB the codes live as their own column (or table): the coarse
  * pass scans codes only — column pruning keeps the wide embedding column
  * out of the scan entirely until re-rank, which touches `alpha*k` rows.
  */
object Quantized {

  /** Pack sign bits into ceil(dim/64) LONG words: bit j of word w =
    * (embedding[64w+j] > 0).
    */
  def signCode(embedding: Column, dim: Int): Column = {
    val words = (0 until dim by 64).map { base =>
      val n = math.min(64, dim - base)
      (0 until n).map { j =>
        when(element_at(embedding, base + j + 1) > 0f, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    }
    array(words: _*)
  }

  /** Hamming distance between two code arrays. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, x) => acc + x)

  /** Multi-bit scalar quantization (`rust/index/src/quantization/
    * multi_bit.rs`): each dimension → a `bits`-bit level over the fixed
    * clamp range [lo, hi). Constants default to ±0.5 — exactly binary-
    * representable, so `floor((x-lo)*scale)` is bit-identical across
    * engines and the codes are deterministic/oracle-checkable.
    */
  def mbCode(embedding: Column, bits: Int, lo: Double = -0.5,
      hi: Double = 0.5): Column = {
    val levels = (1 << bits) - 1
    val scale = (1 << bits) / (hi - lo)
    transform(embedding, x =>
      least(greatest(floor((x.cast("double") - lit(lo)) * lit(scale)), lit(0.0)),
        lit(levels.toDouble)).cast("int"))
  }

  /** Dequantized multi-bit representation: each component snapped to its
    * level MIDPOINT (`lo + (level+0.5)/scale`) as a float. The
    * Spark-first answer to the reference's bit-packed multi-bit codes
    * (`rust/index/src/quantization/multi_bit.rs`): a column holding only
    * `2^bits` distinct values parquet DICTIONARY-encodes to ~bits/dim on
    * disk (the columnar encoder does the packing), while the coarse
    * phase scans it with the same CODEGEN'd distance kernels as exact
    * search (the codegen does the SIMD) — so the coarse rank is
    * space-consistent for cosine/ip/l2 alike, which integer Σ(la−lb)²
    * is not (it misranks cosine truth when norms vary).
    */
  def mbDequantized(embedding: Column, bits: Int, lo: Double = -0.5,
      hi: Double = 0.5): Column = {
    val scale = (1 << bits) / (hi - lo)
    transform(mbCode(embedding, bits, lo, hi),
      l => (lit(lo) + (l.cast("double") + 0.5) / lit(scale)).cast("float"))
  }

  /** Coarse distance on multi-bit codes: Σ (la−lb)². Integer math, and —
    * because dequantized values are `lo + (level+0.5)/scale` — it equals
    * the squared-L2 of the dequantized (corrected) vectors up to the
    * constant 1/scale², so the ranking IS the corrected coarse distance's.
    */
  def mbCoarseDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0), (acc, x) => acc + x)

  /** Shared two-phase plan: coarse integer distance top-(alpha*k) on the
    * code column only → exact re-rank of survivors.
    */
  private def twoPhase(candidates: DataFrame, queries: DataFrame, k: Int,
      alpha: Int, space: String,
      code: Column => Column, coarseDist: (Column, Column) => Column): DataFrame = {
    val coded = candidates.withColumn("code", code(col("embedding")))
    val qcoded = queries.withColumn("qcode", code(col("q_embedding")))
    // phase 1: coarse candidates (integer ops only on the code column)
    val coarse = GroupedTopK(
      coded.crossJoin(broadcast(qcoded))
        .withColumn("hd", coarseDist(col("code"), col("qcode"))),
      Seq(col("query_id")), Seq(col("hd"), col("offset_id")), alpha * k)
      .select(col("query_id"), col("offset_id"), col("embedding"), col("q_embedding"))
    // phase 2: exact re-rank of alpha*k survivors
    val topk = udaf(new Knn.TopKAgg(k))
    coarse
      .select(col("query_id"), col("offset_id"),
        Distances.distance(space)(col("embedding"), col("q_embedding")).as("dist"))
      .groupBy(col("query_id"))
      .agg(topk(col("offset_id"), col("dist")).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.oid").as("offset_id"), col("col.dist").as("dist"))
  }

  /** Two-phase KNN on 1-bit sign codes (Hamming coarse pass).
    * candidates: (offset_id, embedding); queries: (query_id, q_embedding).
    */
  def search(candidates: DataFrame, queries: DataFrame, k: Int, dim: Int,
      alpha: Int = 5, space: String = "cosine"): DataFrame =
    twoPhase(candidates, queries, k, alpha, space,
      signCode(_, dim), hamming)

  /** Two-phase KNN on multi-bit codes — tighter coarse bounds than 1-bit
    * at bits× the code size, same plan shape.
    */
  def searchMb(candidates: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 2, alpha: Int = 5, space: String = "cosine"): DataFrame =
    twoPhase(candidates, queries, k, alpha, space,
      mbCode(_, bits), mbCoarseDist)

  /** RaBitQ-style rotated 1-bit two-phase KNN (Gao & Long, SIGMOD 2024,
    * arXiv:2405.12497; reference `rust/index/src/quantization/{mod.rs,
    * single_bit.rs}`): vectors pass through a seeded fast random rotation
    * ([[graft.functions.Rotation.fwhtRotate]]) before sign-coding, and
    * each vector stores two scalar corrections —
    * `corr = <x̄, v̄>` (cosine of the vector to its own binary direction)
    * and `vnorm = ‖v‖`. The rotation isotropizes anisotropic data (a
    * heavy dimension otherwise dominates true distance while still
    * contributing one bit), and the correction turns the code overlap
    * `(d−2·hamming)/d = <x̄_v, x̄_q>` into the paper's inner-product
    * estimate `<v̄,q̄> ≈ <x̄_v, x̄_q>/corr_v` (query-side distortion is
    * per-query constant, so it never reorders a query's candidates).
    * Coarse ranking per space: cosine → est desc; ip → ‖v‖·est desc;
    * l2 → ‖v‖² − 2‖v‖‖q‖·est asc. Phase 2 re-ranks exactly, as
    * [[search]] does.
    */
  private[operators] def pow2(dim: Int): Int = {
    var d = 1
    while (d < dim) d <<= 1
    d
  }

  private def vecNorm(c: Column): Column = sqrt(aggregate(c,
    lit(0d), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Rotated code rows `(… , code, corr, vnorm)` appended to the input —
    * the persistable RaBitQ state: rotated sign code + the two scalars
    * the estimator needs (`corr = <x̄,v̄>`, `vnorm = ‖v‖`).
    */
  def rotatedCodeRows(vecs: DataFrame, dim: Int, seed: Long = 42L,
      rounds: Int = 3): DataFrame = {
    val d = pow2(dim)
    val sumAbs = (c: Column) => aggregate(c,
      lit(0d), (acc, x) => acc + abs(x.cast("double")))
    vecs
      .withColumn("rot", graft.functions.Rotation.fwhtRotate(col("embedding"), seed, rounds))
      // corr = Σ|v_i| / (√d·‖v‖): <x̄, v̄> with x̄ = sign(v)/√d
      .withColumn("vnorm", vecNorm(col("rot")))
      .withColumn("corr",
        when(col("vnorm") === 0d, lit(1d))
          .otherwise(sumAbs(col("rot")) / (lit(math.sqrt(d)) * col("vnorm"))))
      .withColumn("code", signCode(col("rot"), d))
      .drop("rot")
  }

  /** Rotated query state `(query_id, q_embedding, qnorm, qcode, qrot)` —
    * symmetric coarse keys use `qcode`, asymmetric ones the full-precision
    * `qrot`.
    */
  private[operators] def rotatedQueryRows(queries: DataFrame, d: Int, seed: Long,
      rounds: Int): DataFrame =
    queries
      .withColumn("qrot",
        graft.functions.Rotation.fwhtRotate(col("q_embedding"), seed, rounds))
      .withColumn("qnorm", vecNorm(col("qrot")))
      .withColumn("qcode", signCode(col("qrot"), d))

  /** Per-space coarse key from the RaBitQ estimate (lower = better).
    * `asym = true` scores the packed doc code against the FULL-PRECISION
    * rotated query (the paper's estimator — only the doc side pays
    * storage; per-query constants cancel out of every key, including the
    * `‖q‖` in the l2 expansion).
    */
  private[operators] def rotatedCoarseKey(d: Int, space: String, asym: Boolean): Column = {
    val est =
      if (asym)
        graft.functions.Rotation.signDot(col("code"), col("qrot"))
          .cast("double") / (lit(math.sqrt(d)) * col("corr"))
      else
        ((lit(d) - lit(2) * hamming(col("code"), col("qcode")))
          .cast("double") / lit(d.toDouble)) / col("corr") * col("qnorm")
    // est here is <v̄,q̄>·‖q‖ up to a per-query constant
    space match {
      case "l2" => col("vnorm") * col("vnorm") - lit(2d) * col("vnorm") * est
      case "ip" => -(col("vnorm") * est)
      case _    => -est
    }
  }

  private[operators] def rerank(coarse: DataFrame, k: Int, space: String): DataFrame = {
    val topk = udaf(new Knn.TopKAgg(k))
    coarse
      .select(col("query_id"), col("offset_id"),
        Distances.distance(space)(col("embedding"), col("q_embedding")).as("dist"))
      .groupBy(col("query_id"))
      .agg(topk(col("offset_id"), col("dist")).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.oid").as("offset_id"), col("col.dist").as("dist"))
  }

  def searchRotated(candidates: DataFrame, queries: DataFrame, k: Int,
      dim: Int, alpha: Int = 5, space: String = "cosine",
      seed: Long = 42L, rounds: Int = 3, asym: Boolean = true): DataFrame = {
    val d = pow2(dim)
    val coded = rotatedCodeRows(candidates, dim, seed, rounds)
    val qcoded = rotatedQueryRows(queries, d, seed, rounds)
    val coarse = GroupedTopK(
      coded.crossJoin(broadcast(qcoded))
        .withColumn("hd", rotatedCoarseKey(d, space, asym)),
      Seq(col("query_id")), Seq(col("hd"), col("offset_id")), alpha * k)
      .select(col("query_id"), col("offset_id"), col("embedding"), col("q_embedding"))
    rerank(coarse, k, space)
  }

  /** Rotated two-phase KNN over the PERSISTED code table
    * ([[graft.sources.CollectionStore.rotatedCodesServing]]): phase 1
    * scans only `(offset_id, code, corr, vnorm)` — integer Hamming plus
    * two scalar multiplies per row, the wide embedding column untouched —
    * and phase 2 pulls the α·k survivors through a broadcast join, same
    * shape as [[searchServed]].
    */
  def searchRotatedServed(codes: DataFrame, embeddings: DataFrame,
      queries: DataFrame, k: Int, dim: Int, alpha: Int = 5,
      space: String = "cosine", seed: Long = 42L,
      rounds: Int = 3, asym: Boolean = true): DataFrame = {
    val d = pow2(dim)
    val qcoded = rotatedQueryRows(queries, d, seed, rounds)
    val survivors = GroupedTopK(
      codes.crossJoin(broadcast(qcoded))
        .withColumn("hd", rotatedCoarseKey(d, space, asym)),
      Seq(col("query_id")), Seq(col("hd"), col("offset_id")), alpha * k)
      .select(col("query_id"), col("offset_id"))
    rerank(
      embeddings
        .join(broadcast(survivors), Seq("offset_id"))
        .join(broadcast(queries), Seq("query_id")),
      k, space)
  }

  /** Two-phase KNN over a PERSISTED code column: phase 1 scans the
    * (offset_id, code) table only — 8 bytes/row instead of the wide f32
    * embedding, integer ops end-to-end — and phase 2 pulls just the
    * alpha·k survivors from the embedding table through a broadcast-hash
    * join (the embedding scan is never shuffled). This is the RaBitQ
    * layout the reference keeps beside its vector segment
    * (`rust/index/src/quantization/`): codes live with the index, wide
    * vectors are only touched for re-rank. Results are identical to
    * [[search]] with the same (dim, alpha).
    */
  def searchServed(codes: DataFrame, embeddings: DataFrame,
      queries: DataFrame, k: Int, dim: Int, alpha: Int = 5,
      space: String = "cosine"): DataFrame = {
    val qcoded = queries
      .select(col("query_id"), signCode(col("q_embedding"), dim).as("qcode"))
    val survivors = GroupedTopK(
      codes.crossJoin(broadcast(qcoded))
        .withColumn("hd", hamming(col("code"), col("qcode"))),
      Seq(col("query_id")), Seq(col("hd"), col("offset_id")), alpha * k)
      .select(col("query_id"), col("offset_id"))
    val topk = udaf(new Knn.TopKAgg(k))
    embeddings
      .join(broadcast(survivors), Seq("offset_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("offset_id"),
        Distances.distance(space)(col("embedding"), col("q_embedding")).as("dist"))
      .groupBy(col("query_id"))
      .agg(topk(col("offset_id"), col("dist")).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.oid").as("offset_id"), col("col.dist").as("dist"))
  }
}
