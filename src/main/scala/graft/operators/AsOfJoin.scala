package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the most recent
  * right row with the same key whose timestamp is <= the left row's
  * timestamp.
  *
  * Spark has no built-in ASOF JOIN (DuckDB/Pandas do), and the naive
  * encoding — a range join `l.key = r.key AND r.ts <= l.ts` followed by a
  * per-left-row max — explodes to O(|matches|) intermediate rows and is a
  * scale-killer on dense keys. This implementation instead *unions* the two
  * sides, hash-shuffles once on the key, sorts within partitions by
  * (ts, side, tiebreak), and carries the last-seen right payload forward
  * with `last(_, ignoreNulls = true)` over a running window:
  *
  *   - exactly ONE shuffle (the window partitionBy) — same cost as the
  *     equi-join it replaces, no range blowup;
  *   - at equal timestamps the right row sorts BEFORE the left row
  *     (side 0 < side 1), making the bound inclusive (`r.ts <= l.ts`);
  *   - among right rows tied on (key, ts) the largest `tiebreak` wins,
  *     keeping the result deterministic.
  *
  * The same shape serves temporal metadata lookup in a log-structured
  * store: "state of record X as of log position T" (the reference answers
  * this via its log offset merge, e.g. rust/worker materialization at a
  * given log offset).
  *
  * @param right    must contain `key`, `ts`, `tiebreak`, and the payload
  *                 columns to surface
  * @param payload  right columns to attach (null when no match)
  */
object AsOfJoin {

  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
           tiebreak: String, payload: Seq[String],
           direction: String = "backward",
           toleranceMicros: Long = Long.MaxValue): DataFrame = {
    require(direction == "backward" || direction == "forward", direction)
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_tb", lit(null).cast(right.schema(tiebreak).dataType))
      .withColumn("_rts", lit(null).cast("timestamp"))
      .withColumn("_r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          payload.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))))
    val r = right.select(
      (Seq(col(key), col(ts).as(ts)) ++
        leftCols.filterNot(c => c == key || c == ts).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("_side") :+
        col(tiebreak).as("_tb") :+
        col(ts).cast("timestamp").as("_rts") :+
        struct(payload.map(col): _*).as("_r")): _*)
      .select(l.columns.map(col): _*) // align column order
    // forward = backward over reversed time; at equal ts the right row
    // must still be visible to the left row, so the right side sorts
    // first in BOTH directions (side 0 before side 1 ascending; for the
    // descending scan the sort flips every key EXCEPT side).
    val ordering =
      if (direction == "backward")
        Seq(col(ts).asc, col("_side").asc, col("_tb").asc_nulls_first)
      else
        Seq(col(ts).desc, col("_side").asc, col("_tb").desc_nulls_first)
    val w = Window.partitionBy(key)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap =
      if (direction == "backward") unix_micros(col(ts)) - unix_micros(col("_mts"))
      else unix_micros(col("_mts")) - unix_micros(col(ts))
    l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .withColumn("_mts", last(col("_rts"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      // tolerance: a too-old (or too-far-ahead) match nulls out, the left
      // row survives — pandas merge_asof semantics
      .withColumn("_ok", col("_mts").isNotNull && gap <= toleranceMicros)
      .select(leftCols.map(col) ++
        payload.map(c => when(col("_ok"), col(s"_match.$c")).as(c)): _*)
  }
}
