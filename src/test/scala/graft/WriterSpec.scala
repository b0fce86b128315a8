package graft

import graft.api.Writer
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WriterSpec extends AnyFunSuite {
  import SparkTestSession._

  test("write API: add/update/upsert/delete round-trip through flush") {
    val w = Writer.empty(spark)
    w.add("a", Some("doc a"), Map("k" -> "1"))
    w.add("b", Some("doc b"))
    w.add("a", Some("dup ignored"))
    w.update("b", None, Map("k" -> "2"))
    val s1 = w.flush().collect().map(r => r.id -> r).toMap
    assert(s1("a").document.contains("doc a"))
    assert(s1("b").meta("k") == "2" && s1("b").document.contains("doc b"))

    w.delete("a")
    w.upsert("b", Some("b2"), Map("x" -> "y"))
    w.add("a", Some("back"))
    val s2 = w.flush().collect().map(r => r.id -> r).toMap
    assert(s2.keySet == Set("a", "b"))
    assert(s2("a").document.contains("back"))
    assert(s2("b").document.contains("b2") && s2("b").meta == Map("x" -> "y"))
    assert(w.pendingOps == 0)
  }

  test("salted join result equals plain join") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"),
      monotonically_increasing_id().as("_rid"))
    val ord = Tables.orders(spark, sf).select(col("o_orderkey").as("l_orderkey"),
      col("o_orderpriority"))
    val plain = li.join(ord, "l_orderkey")
      .agg(count(lit(1)), round(sum(col("l_quantity")), 2)).collect()(0)
    val salted = SkewJoin.salted(li, ord, "l_orderkey", "_rid", buckets = 8)
      .agg(count(lit(1)), round(sum(col("l_quantity")), 2)).collect()(0)
    assert(plain == salted)
  }
}
