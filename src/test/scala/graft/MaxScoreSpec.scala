package graft

import graft.operators.MaxScore
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** MaxScore pruning must be EXACT: identical top-k (scores and tie order)
  * to the brute-force scorer on random sparse corpora.
  */
class MaxScoreSpec extends AnyFunSuite {

  private def brute(postings: Map[Int, (Array[Long], Array[Float])],
      query: Seq[(Int, Float)], k: Int): Seq[(Long, Float)] = {
    val scores = scala.collection.mutable.HashMap[Long, Float]()
    for ((t, qw) <- query; (docs, ws) <- postings.get(t).toSeq;
         i <- docs.indices)
      scores(docs(i)) = scores.getOrElse(docs(i), 0f) + qw * ws(i)
    scores.toSeq.map { case (d, s) => (s, d) }
      .sortBy(s => (-s._1, s._2)).take(k).map { case (s, d) => (d, s) }
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
      val (rawPostings, query) = gen.pureApply(params, seed)
      val postings = rawPostings.collect { case (t, l) if l.nonEmpty =>
        val sorted = l.sortBy(_._1)
        t -> (sorted.map(_._1).toArray, sorted.map(_._2).toArray)
      }.toMap
      for (k <- Seq(1, 3, 10)) {
        val got = MaxScore.topkLocal(postings, query, k)
        val want = brute(postings, query, k)
        assert(got == want, s"case $c k=$k\n got=$got\n want=$want\n q=$query")
      }
    }
  }
}
