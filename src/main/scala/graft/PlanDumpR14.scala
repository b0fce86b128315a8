package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round plan evidence (round 14): writes
  * `plans/r14/<query>_<tag>.txt` — the full `.explain("formatted")`
  * output — for each query in SPARK_GRAFT_ONLY (comma-separated), with
  * the tag from SPARK_GRAFT_PLAN_TAG (`before`/`after`). Run against the
  * working tree (after) or a stashed tree (before).
  */
object PlanDumpR14 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "after")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "").split(",")
      .map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("plans/r14"))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"plans/r14/${n}_$tag.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] wrote plans/r14/${n}_$tag.txt")
      } catch { case e: Throwable =>
        println(s"[plandump] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
