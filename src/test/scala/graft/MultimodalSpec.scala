package graft

import graft.functions.EmbeddingFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("hashed-BoW embedding is deterministic, unit-norm, right dim") {
    val ef = EmbeddingFunctions.registry("hashed_bow_64")
    val docs = Tables.documents(spark, sf).limit(50)
    val e1 = docs.select(col("doc_id"), ef.embed(col("text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val e2 = docs.select(col("doc_id"), ef.embed(col("text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(e1 == e2)
    assert(e1.values.forall(_.length == 64))
    e1.values.foreach { v =>
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"norm $norm != 1")
    }
  }

  test("decode stub is pure and batch path matches direct call") {
    val bytes = "hello world".getBytes("UTF-8")
    val (w, h, sig) = graft.operators.Multimodal.decodeStub(bytes)
    assert((w, h) == (bytes.length % 64 + 1, bytes.length / 64 + 1))
    assert(sig == java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString)
  }
}
