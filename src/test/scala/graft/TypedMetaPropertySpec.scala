package graft

import graft.api.TypedMeta
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check of the typed-metadata wire encoding: for random mixes
  * of plain strings (including sigil-prefixed adversarial ones), ints,
  * floats and bools over overlapping key sets, encode → decode must
  * return exactly the typed maps and exactly the plain strings — the
  * reference's typed `UpdateMetadataValue` round-trip
  * (`rust/types/src/metadata.rs:659-683`).
  */
class TypedMetaPropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val keys = Gen.oneOf("k1", "k2", "k3", "k4")
  private val sigil = "\u0001"
  private val genStr = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    // adversarial: user strings that look like our wire tags
    Gen.oneOf(s"${sigil}i${sigil}7", s"${sigil}f${sigil}2.5",
      s"${sigil}b${sigil}true", s"${sigil}s${sigil}x", sigil, s"$sigil$sigil"))
  private def genMap[T](gv: Gen[T]): Gen[Map[String, T]] =
    Gen.mapOf(Gen.zip(keys, gv)).map(_.take(3))

  private case class Case(strs: Map[String, String], ints: Map[String, Long],
      floats: Map[String, Double], bools: Map[String, Boolean])

  private val genCase: Gen[Case] = for {
    s <- genMap(genStr)
    i <- genMap(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
    f <- genMap(Gen.chooseNum(-1e6, 1e6).map(d => math.rint(d * 16) / 16))
    b <- genMap(Gen.oneOf(true, false))
  } yield Case(s, i, f, b)

  test("encode -> decode is identity on typed maps; strings never corrupt") {
    val cases = Gen.listOfN(60, genCase)
      .apply(Gen.Parameters.default, Seed(20260813L)).get
    val df = cases.zipWithIndex
      .map { case (c, i) => (i.toLong, c.strs, c.ints, c.floats, c.bools) }
      .toDF("row_id", "meta", "meta_int", "meta_float", "meta_bool")
    val encoded = TypedMeta.encode(df)
    assert(encoded.columns.toSet == Set("row_id", "meta"),
      "encode must fold the typed columns into the wire map")
    val decoded = encoded.select(col("row_id"),
        TypedMeta.decodeStr(col("meta")).as("s"),
        TypedMeta.decodeInt(col("meta")).as("i"),
        TypedMeta.decodeFloat(col("meta")).as("f"),
        TypedMeta.decodeBool(col("meta")).as("b"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((c, i) <- cases.zipWithIndex) {
      val r = decoded(i.toLong)
      // a key has ONE type: int > float > bool > plain string
      val expectFloat = c.floats -- c.ints.keySet
      val expectBool = c.bools -- c.ints.keySet -- c.floats.keySet
      val expectStr = c.strs -- c.ints.keySet -- c.floats.keySet -- c.bools.keySet
      assert(r.getMap[String, String](1) == expectStr,
        s"row $i strings: got ${r.getMap[String, String](1)} want $expectStr")
      assert(r.getMap[String, Long](2) == c.ints, s"row $i ints")
      assert(r.getMap[String, Double](3) == expectFloat, s"row $i floats")
      assert(r.getMap[String, Boolean](4) == expectBool, s"row $i bools")
    }
  }
}
