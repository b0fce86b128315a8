package graft

import graft.operators.MaxScore
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** MaxScore pruning must be EXACT: identical top-k (scores and tie order)
  * to the brute-force scorer on random sparse corpora.
  */
class MaxScoreSpec extends AnyFunSuite {

  private def brute(postings: Map[Long, (Array[Long], Array[Float])],
      query: Seq[(Long, Float)], k: Int): Seq[(Long, Float)] = {
    val scores = scala.collection.mutable.HashMap[Long, Float]()
    for ((t, qw) <- query; (docs, ws) <- postings.get(t).toSeq;
         i <- docs.indices)
      scores(docs(i)) = scores.getOrElse(docs(i), 0f) + qw * ws(i)
    scores.toSeq.map { case (d, s) => (s, d) }
      .sortBy(s => (-s._1, s._2)).take(k).map { case (s, d) => (d, s) }
  }

  test("MaxScore block-max path == brute force on multi-block lists") {
    // Lists long enough to span several 64-doc blocks, with the heavy
    // weights clustered in one block so block-max bounds actually differ
    // from the whole-list max.
    val rnd = new scala.util.Random(7)
    val postings: Map[Long, (Array[Long], Array[Float])] = (0L until 5L).map { t =>
      val docs = (0L until 1000L).filter(_ => rnd.nextDouble() < 0.6).toArray
      val ws = docs.map { d =>
        if (d / 64 == t) (5 + rnd.nextInt(5)).toFloat else (1 + rnd.nextInt(2)).toFloat
      }
      t -> (docs, ws)
    }.toMap
    val query = Seq(0L -> 1.0f, 1L -> 2.0f, 2L -> 0.5f, 3L -> 1.5f, 4L -> 1.0f)
    for (k <- Seq(1, 5, 20, 100)) {
      val got = MaxScore.topkLocal(postings, query, k)
      val want = brute(postings, query, k)
      assert(got == want, s"k=$k\n got=${got.take(5)}\n want=${want.take(5)}")
    }
  }

  test("MaxScore == brute force over 20 random corpora") {
    val params = Gen.Parameters.default
    for (c <- 0 until 20) {
      val seed = Seed(c * 31337L + 5)
      val gen = for {
        nTerms <- Gen.chooseNum(3, 10)
        postings <- Gen.sequence[Seq[(Int, Seq[(Long, Float)])], (Int, Seq[(Long, Float)])](
          (0 until nTerms).map { t =>
            Gen.listOf(Gen.zip(Gen.chooseNum(0L, 60L), Gen.chooseNum(1, 5).map(_.toFloat)))
              .map(l => t -> l.distinctBy(_._1))
          })
        qTerms <- Gen.someOf(0 until nTerms)
        qws <- Gen.listOfN(qTerms.size, Gen.chooseNum(1, 3).map(_.toFloat))
      } yield (postings, qTerms.zip(qws).toSeq)
      val (rawPostings, rawQuery) = gen.pureApply(params, seed)
      val query = rawQuery.map { case (t, w) => (t.toLong, w) }
      val postings = rawPostings.collect { case (t, l) if l.nonEmpty =>
        val sorted = l.sortBy(_._1)
        t.toLong -> (sorted.map(_._1).toArray, sorted.map(_._2).toArray)
      }.toMap
      for (k <- Seq(1, 3, 10)) {
        val got = MaxScore.topkLocal(postings, query, k)
        val want = brute(postings, query, k)
        assert(got == want, s"case $c k=$k\n got=$got\n want=$want\n q=$query")
      }
    }
  }
}
