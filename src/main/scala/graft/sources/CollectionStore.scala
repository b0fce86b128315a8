package graft.sources

import graft.operators.Ivf
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Compacted-collection persistence — the record segment + vector segment
  * of the reference (`rust/segment/src/blockfile_record.rs`, SPANN posting
  * lists) as partitioned parquet.
  *
  * Layout at `<root>/`:
  *   - `records/`            record segment (plain parquet, offset_id-sorted
  *                            within files)
  *   - `ivf/centroids/`      centroid table (tiny)
  *   - `ivf/postings/`       posting lists **partitioned by centroid_id** —
  *                            nprobe routing reads only the probed
  *                            directories (partition pruning; verified in
  *                            StorageSpec), which is the blockfile
  *                            sparse-index seek re-expressed as Hive-style
  *                            partition layout.
  *
  * Fork (`service_based_frontend.rs:1663-1787`) is copy-on-write by
  * construction here: a fork shares the immutable compacted files and
  * diverges only in its WAL; materializing fork state = Materialize(walʹ)
  * over the same segment (ForkSpec).
  */
object CollectionStore {

  def saveRecords(records: DataFrame, root: String): Unit =
    records.write.mode(SaveMode.Overwrite).parquet(s"$root/records")

  def loadRecords(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/records")

  def saveIvf(model: Ivf.Model, root: String): Unit = {
    model.centroids.write.mode(SaveMode.Overwrite).parquet(s"$root/ivf/centroids")
    model.postings
      .repartition(col("centroid_id")) // one writer per list → no tiny files
      .write.mode(SaveMode.Overwrite)
      .partitionBy("centroid_id")
      .parquet(s"$root/ivf/postings")
  }

  def loadIvf(spark: SparkSession, root: String): Ivf.Model =
    Ivf.Model(
      centroids = spark.read.parquet(s"$root/ivf/centroids"),
      postings = spark.read.parquet(s"$root/ivf/postings"))
}
