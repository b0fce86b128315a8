package graft

import graft.sources.CollectionStore
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check of the blocked served-sparse search: for random skewed
  * corpora and random queries, the three-pass bound/seed/survivor search
  * must return EXACTLY the brute-force top-k (same docs, same scores,
  * same tie-breaks) — the pruning-is-lossless claim behind persisting
  * block-max metadata. Small blockSpan forces many ranges so the skip
  * path actually runs.
  */
class SparseServedPropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // weights quantized to 1/64 so float sums are exact across engines
  private val genW: Gen[Float] =
    Gen.chooseNum(1, 640).map(i => i / 64f)
  private case class Corpus(docs: Map[Long, Map[Long, Float]],
      query: Seq[(Long, Float)])

  private val genCorpus: Gen[Corpus] = for {
    nDocs <- Gen.chooseNum(40, 120)
    terms <- Gen.chooseNum(3, 8)
    // skew: term t appears in docs hashing into a narrow band sometimes
    docs <- Gen.sequence[Seq[(Long, Map[Long, Float])], (Long, Map[Long, Float])](
      (0 until nDocs).map { d =>
        for {
          nt <- Gen.chooseNum(1, terms)
          ts <- Gen.pick(nt, 0 until terms)
          ws <- Gen.listOfN(nt, genW)
        } yield d.toLong -> ts.map(_.toLong).zip(ws).toMap
      })
    qn <- Gen.chooseNum(2, terms)
    qts <- Gen.pick(qn, 0 until terms)
    qws <- Gen.listOfN(qn, genW)
  } yield Corpus(docs.toMap, qts.map(_.toLong).zip(qws).toSeq.sortBy(_._1))

  test("3-pass served search == brute-force top-k on random skewed corpora") {
    val cases = Gen.listOfN(6, genCorpus)
      .apply(Gen.Parameters.default, Seed(424242L)).get
    for ((c, ci) <- cases.zipWithIndex) {
      val root = java.nio.file.Files.createTempDirectory(s"sparse_prop_$ci").toString
      val recs = c.docs.toSeq.sortBy(_._1).map { case (d, tw) =>
        val sorted = tw.toSeq.sortBy(_._1)
        (d, sorted.map(_._1), sorted.map(_._2))
      }.toDF("offset_id", "ti", "tv")
        .select(col("offset_id"), map(lit("s"),
          struct(col("ti").as("indices"),
            col("tv").cast("array<float>").as("values"))).as("meta_sparse"))
      CollectionStore.sparseServing(recs, "s", root, blockSpan = 8L)
      val k = 7
      val got = CollectionStore.sparseServedSearch(spark, root, "s", c.query, k)
        .collect().map(r => (r.getLong(0), r.getDouble(1).toFloat)).toSeq
      val qm = c.query.toMap
      val want = c.docs.toSeq
        .map { case (d, tw) =>
          (d, tw.collect { case (t, w) if qm.contains(t) => w * qm(t) }.sum)
        }
        .filter(_._2 > 0f)
        .sortBy { case (d, s) => (-s, d) }
        .take(k)
      assert(got == want,
        s"case $ci: served=$got brute=$want query=${c.query}")
    }
  }
}
