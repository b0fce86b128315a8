package graft

import org.scalatest.funsuite.AnyFunSuite

/** Small-scale gate for the SIFT1M-shaped gauntlet (`graft.AnnGauntlet`):
  * the SAME corpus generator, query generator, serving builds and
  * measurement code run at 20k vectors in `sbt test`, and every routed
  * path must hold recall@100 ≥ 0.95 against the exact top-k — mirroring
  * the reference's ANN accuracy invariant
  * (`chromadb/test/property/invariants.py:281`). The 200k/1M cells run
  * in `runMain graft.AnnGauntlet` and land in ANN_GAUNTLET.json.
  */
class AnnGauntletSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("gauntlet cell at 20k: all served paths reach recall@100 >= 0.95") {
    val root = java.nio.file.Files.createTempDirectory("ann_gauntlet").toString
    val results = AnnGauntlet.runCell(spark, root, 20000L, timedRuns = 1)
    assert(results.keySet == Set("exact", "ivf_routed", "ivf_routed_narrow",
      "hnsw_routed", "hnsw_routed_narrow", "quantized"))
    assert(results("exact").recall == 1.0,
      "the exact path IS the truth set — recall must be exactly 1")
    for ((name, r) <- results if name != "exact") {
      assert(r.recall >= 0.95,
        f"$name recall@100 ${r.recall}%.4f < 0.95 at 20k vectors")
    }
  }
}
