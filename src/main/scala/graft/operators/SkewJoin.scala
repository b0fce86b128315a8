package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handles sort-merge
  * skew at runtime; salting is the static alternative when one side's hot
  * keys are known to dwarf a partition (the classic 100 TB fact⋈fact case).
  *
  * Left rows get a random-ish (deterministic: hash of a row id) salt in
  * [0, buckets); the right side is exploded `buckets`× with every salt, so
  * each hot key spreads over `buckets` reducers. Exact same join result,
  * `buckets`× replication of the (smaller) right side.
  */
object SkewJoin {

  def salted(left: DataFrame, right: DataFrame, key: String,
      leftIdCol: String, buckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(col(leftIdCol)), lit(buckets)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }
}
