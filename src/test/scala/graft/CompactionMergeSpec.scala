package graft

import graft.operators.Materialize
import graft.queries.WritePath
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the DataFrame-native materialize fold and the broadcast
  * compaction merge: result parity with the typed fold, and the scale
  * property that matters — the segment side is scanned, never shuffled.
  */
class CompactionMergeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"), col("document"),
      to_json(map_from_entries(array_sort(map_entries(col("meta"))))).as("meta"))
      .collect().map(_.toSeq).toSet

  test("applyDf == typed Materialize on the synthetic WAL") {
    val wal = WritePath.syntheticWal(spark, sf)
    val typed = Materialize(spark, wal).toDF()
    val dfagg = Materialize.applyDf(wal.toDF())
    assert(canon(dfagg) === canon(typed))
  }

  test("compactionMerge == typed segment+tail materialization") {
    val wal = WritePath.syntheticWal(spark, sf)
    val walDf = wal.toDF()
    val segment = Materialize.applyDf(walDf.filter(col("log_offset") % 10 === 0))
    val tail = walDf.filter(col("log_offset") % 10 =!= 0)
    val merged = Materialize.compactionMerge(segment, tail)

    val typedSeg = Materialize(spark, wal.filter(_.log_offset % 10 == 0))
    val typed = Materialize(spark, wal.filter(_.log_offset % 10 != 0),
      Some(Materialize.segmentAsLog(spark, typedSeg))).toDF()
    assert(canon(merged) === canon(typed))
  }

  test("plan: segment parquet scan joins broadcast, is never exchanged") {
    // Persist a segment so its lineage is a bare parquet scan, then merge
    // a small tail on top and inspect the physical plan.
    val wal = WritePath.syntheticWal(spark, sf).toDF()
    val dir = java.nio.file.Files.createTempDirectory("seg").toString
    Materialize.applyDf(wal.filter(col("log_offset") % 10 === 0))
      .write.mode("overwrite").parquet(dir)
    val segment = spark.read.parquet(dir)
    val tail = wal.filter(col("log_offset") % 10 =!= 0)
    val exec = Materialize.compactionMerge(segment, tail)
      .queryExecution.executedPlan
    val plan = exec.toString

    assert(plan.contains("BroadcastHashJoin"), s"ops join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"segment must never sort-merge (implies segment shuffle):\n$plan")
    // The hard scale gate: NO shuffle exchange may sit anywhere above the
    // segment's parquet scan — only the small log fold may shuffle.
    // (Broadcast exchanges over segment-derived presentIds are fine:
    // broadcasting a tiny join result moves KBs, not the segment.)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val shufflesOverSegment = exec.collect {
      case e: ShuffleExchangeExec if e.collectLeaves().exists {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains(dir))
        case _ => false
      } => e
    }
    assert(shufflesOverSegment.isEmpty,
      s"segment scan must never feed a shuffle:\n$plan")
  }
}
