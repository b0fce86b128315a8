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

  test("mbCode is deterministic and clamps to the level range") {
    import SparkTestSession.spark.implicits._
    val df = Seq(Seq(-5f, -0.49f, -0.1f, 0f, 0.2f, 0.49f, 5f)).toDF("embedding")
    val codes = df.select(Quantized.mbCode(col("embedding"), 2).as("c"))
      .collect()(0).getSeq[Int](0)
    assert(codes == Seq(0, 0, 1, 2, 2, 3, 3))
  }
}
