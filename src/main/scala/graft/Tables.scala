package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish star schema + the
  * collection-shaped tables (`documents`, `embeddings`).
  *
  * All tables are plain parquet; Catalyst pushes filters/projections into
  * the scan (verify with `.explain`: `PushedFilters`, `ReadSchema`). At
  * 100 TB the same call reads a partitioned/parquet/Delta table — nothing
  * here assumes single-file or local FS.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has shipped as both parquet TIMESTAMP(MICROS) (read
    * natively) and TIMESTAMP(NANOS), which vanilla Spark rejects
    * (PARQUET_TYPE_ILLEGAL). For the nanos layout, read nanos as Long and
    * convert with integer division (`div`, exact) — float division at
    * 1e18 ns magnitude would lose precision past 2^53. Truncation to
    * micros matches DuckDB's behavior for all our derived values (hour
    * buckets, epoch millis).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // normalize to TIMESTAMP so epoch fns (unix_micros/unix_millis)
        // resolve; sessions run UTC, so the instant is value-identical
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
