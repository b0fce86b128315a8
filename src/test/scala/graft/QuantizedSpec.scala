package graft

import graft.operators.{GroupedTopK, Knn, Quantized}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantized coarse pass quality: the multi-bit (2-bit) coarse distance
  * must bound the true neighbors at least as tightly as the 1-bit sign
  * code — i.e. the coarse top-(alpha·k) candidate set captures at least
  * as much of the exact top-k (the property that justifies spending
  * bits× the code storage; `rust/index/src/quantization/multi_bit.rs`).
  */
class QuantizedSpec extends AnyFunSuite {
  import SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def coarseRecall(code: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      dist: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
      nCoarse: Int): Double = {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("offset_id"), col("embedding"))
    val queries = Tables.embeddings(spark, sf).filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val exact = Knn.exact(vecs, queries, 10)
      .select("query_id", "offset_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val coded = vecs.withColumn("code", code(col("embedding")))
    val qcoded = queries.withColumn("qcode", code(col("q_embedding")))
    val coarse = GroupedTopK(
      coded.crossJoin(broadcast(qcoded))
        .withColumn("hd", dist(col("code"), col("qcode"))),
      Seq(col("query_id")), Seq(col("hd"), col("offset_id")), nCoarse)
      .select("query_id", "offset_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (exact & coarse).size.toDouble / exact.size
  }

  test("2-bit coarse recall >= 1-bit coarse recall at the same alpha") {
    val oneBit = coarseRecall(Quantized.signCode(_, 64), Quantized.hamming, 50)
    val twoBit = coarseRecall(Quantized.mbCode(_, 2), Quantized.mbCoarseDist, 50)
    info(s"coarse recall@50 of exact top-10: 1-bit=$oneBit 2-bit=$twoBit")
    assert(twoBit >= oneBit, s"2-bit coarse recall $twoBit < 1-bit $oneBit")
    // near-random test embeddings are the adversarial case for scalar
    // quantization under cosine re-rank; 0.75 documents the floor while
    // the >=1-bit assert carries the actual claim
    assert(twoBit >= 0.75, s"2-bit coarse recall $twoBit < 0.75")
  }

  test("fwht rotation is orthonormal: norms and pairwise dots preserved") {
    import SparkTestSession.spark.implicits._
    val rng = new scala.util.Random(3)
    val rows = (0 until 8).map(_ => Seq.fill(64)(rng.nextFloat() * 2f - 1f))
    val df = rows.toDF("embedding")
      .select(col("embedding"),
        graft.functions.Rotation.fwhtRotate(col("embedding")).as("rot"))
      .collect().map(r => (r.getSeq[Float](0).toArray, r.getSeq[Float](1).toArray))
    def norm(a: Array[Float]) = math.sqrt(a.map(x => x.toDouble * x).sum)
    for ((orig, rot) <- df) {
      assert(rot.length == 64)
      assert(math.abs(norm(orig) - norm(rot)) < 1e-3,
        s"rotation changed the norm: ${norm(orig)} -> ${norm(rot)}")
    }
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    for (Seq((a0, ar), (b0, br)) <- df.toSeq.combinations(2)) {
      assert(math.abs(dot(a0, b0) - dot(ar, br)) < 1e-2,
        s"rotation changed a pairwise dot: ${dot(a0, b0)} -> ${dot(ar, br)}")
    }
  }

  test("rotated 1-bit beats plain 1-bit and 2-bit scalar on anisotropic data") {
    // scale the first 8 dims by 8x: true cosine is now dominated by
    // dimensions that contribute the same ONE bit to a plain sign code
    // and SATURATE the fixed-clamp scalar code — the failure mode the
    // rotation exists to fix (it spreads the heavy dims across all 64
    // coordinates while preserving angles exactly).
    val weights = array((0 until 64).map(i => lit(if (i < 8) 8f else 1f)): _*)
    val scaled = Tables.embeddings(spark, sf)
      .select(col("vec_id"), zip_with(col("embedding"), weights,
        (x, w) => x * w).as("embedding"))
    val vecs = scaled.select(col("vec_id").as("offset_id"), col("embedding"))
    val queries = scaled.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val k = 10
    def finalRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val exact = Knn.exact(vecs, queries, k)
        .select("query_id", "offset_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = df.select("query_id", "offset_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val rotated = finalRecall(
      Quantized.searchRotated(vecs, queries, k, dim = 64, alpha = 5))
    val rotatedSym = finalRecall(
      Quantized.searchRotated(vecs, queries, k, dim = 64, alpha = 5, asym = false))
    val plain = finalRecall(
      Quantized.search(vecs, queries, k, dim = 64, alpha = 5))
    val mb2 = finalRecall(
      Quantized.searchMb(vecs, queries, k, bits = 2, alpha = 5))
    info(s"recall@10 on 8x-anisotropic data: rotated-asym=$rotated " +
      s"rotated-sym=$rotatedSym plain=$plain mb2=$mb2")
    assert(rotated >= rotatedSym,
      s"full-precision-query estimate $rotated < sign-sign $rotatedSym")
    assert(rotatedSym >= plain, s"rotated-sym $rotatedSym < plain 1-bit $plain")
    assert(rotated >= mb2, s"rotated $rotated < 2-bit scalar $mb2")
    assert(rotated >= 0.9, s"rotated recall $rotated < 0.9")
  }

  test("served rotated codes give the same results as the in-plan path") {
    val root = java.nio.file.Files.createTempDirectory("rcodes").toString
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("offset_id"), col("embedding"))
    val queries = Tables.embeddings(spark, sf).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val codes = graft.sources.CollectionStore.rotatedCodesServing(vecs, root, dim = 64)
    assert(codes.columns.toSet == Set("offset_id", "code", "corr", "vnorm"),
      "served code table must carry only the coarse-phase columns")
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "offset_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val served = rs(Quantized.searchRotatedServed(codes, vecs, queries,
      k = 10, dim = 64, alpha = 5))
    val inPlan = rs(Quantized.searchRotated(vecs, queries,
      k = 10, dim = 64, alpha = 5))
    assert(served == inPlan, "served rotated != in-plan rotated")
  }

  test("mbCode is deterministic and clamps to the level range") {
    import SparkTestSession.spark.implicits._
    val df = Seq(Seq(-5f, -0.49f, -0.1f, 0f, 0.2f, 0.49f, 5f)).toDF("embedding")
    val codes = df.select(Quantized.mbCode(col("embedding"), 2).as("c"))
      .collect()(0).getSeq[Int](0)
    assert(codes == Seq(0, 0, 1, 2, 2, 3, 3))
  }

  test("served IVF multi-bit == exact KNN under full probe + covering window") {
    // searchQuantizedMb's correctness contract: with every list probed
    // and a rerank window covering the corpus, the two-phase plan can
    // drop nothing — rows must equal the exact top-k bit for bit
    import graft.operators.{Ivf, Knn}
    val root = java.nio.file.Files.createTempDirectory("mb_served").toString
    val vecs = Tables.embeddings(spark, sf).limit(2000)
      .select(col("vec_id").as("offset_id"), col("embedding"))
    val queries = Tables.embeddings(spark, sf).filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val model = graft.sources.CollectionStore.ivfServing(vecs, root,
      nCentroids = 8, nReplica = 2, keyTag = "mbspec")
    val codes = graft.sources.CollectionStore.mbCodesServing(vecs, root,
      bits = 4, lo = -1.0, hi = 1.0, keyTag = "mbspec")
    assert(codes.columns.toSet == Set("offset_id", "code"),
      "served mb table must carry only the coarse-phase columns")
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "offset_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val served = rs(Ivf.searchQuantizedMb(model, codes, queries, k = 10,
      nprobe = 8, bits = 4, alpha = 300, lo = -1.0, hi = 1.0))
    val exact = rs(Knn.exact(vecs, queries, 10))
    assert(served == exact, "full-probe covering-window mb != exact")
  }
}
