package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"

  /** Per-run spec scratch root: two concurrent `sbt test` JVMs sharing a
    * fixed path corrupt each other's cached file listings (observed as a
    * FtsSpec FILE_NOT_EXIST flake), so every run gets its own directory.
    */
  private lazy val runRoot: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_spec_")
  def specRoot(name: String): String = runRoot.resolve(name).toString
}

/** Smoke: every registered query runs and returns rows at sf0.001, and
  * every oracle entry has a matching query. Value-level correctness is
  * gated by the DuckDB oracle (tools/check_oracle.py / driver t2). */
class SparkEntrySpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0)
    }
  }
}
