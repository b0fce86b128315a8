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

  test("array encode -> decode is identity; JSON specials and sigils survive") {
    // elements that stress the JSON payload: quotes, backslashes,
    // commas, newlines, our own wire sigil/tags, unicode incl. a
    // surrogate pair, and the empty string; plus the empty array
    val nasty = Seq("plain", "with \"quotes\"", "back\\slash", "a,b|c",
      "line\nbreak", sigil, s"${sigil}l${sigil}[\"x\"]", "émoji 😀",
      "")
    val arrGen = Gen.listOf(Gen.oneOf(nasty)).map(_.take(5))
    val cases = Gen.listOfN(40,
        Gen.zip(genMap(arrGen.map(_.toSeq)), genMap(genStr),
          genMap(Gen.chooseNum(-1000L, 1000L))))
      .apply(Gen.Parameters.default, Seed(20260815L)).get
    val df = cases.zipWithIndex
      .map { case ((arrs, strs, ints), i) => (i.toLong, strs, ints, arrs) }
      .toDF("row_id", "meta", "meta_int", "meta_str_arr")
    // the client's chain order: encode() FIRST (escapes adversarial
    // sigil-prefixed user strings + folds typed scalars), tag-folding
    // stages after — run LAST, encode's escape would TagStr-wrap the
    // array entries and unlink them from decodeArrStr (the regression
    // the meta_int column here guards)
    val encoded = TypedMeta.encodeArrStr(TypedMeta.encode(df))
    assert(encoded.columns.toSet == Set("row_id", "meta"))
    val decoded = encoded.select(col("row_id"),
        TypedMeta.decodeArrStr(col("meta")).as("a"),
        TypedMeta.decodeStr(col("meta")).as("s"),
        TypedMeta.decodeInt(col("meta")).as("i"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (((arrs, strs, ints), i) <- cases.zipWithIndex) {
      val r = decoded(i.toLong)
      val gotArr = r.getMap[String, scala.collection.Seq[String]](1)
        .map { case (k, v) => k -> v.toSeq }.toMap
      // one type per key: the LAST fold stage (arrays) wins collisions
      assert(gotArr == arrs, s"row $i arrays: got $gotArr want $arrs")
      assert(r.getMap[String, Long](3) == (ints -- arrs.keySet),
        s"row $i ints")
      assert(r.getMap[String, String](2)
          == (strs -- arrs.keySet -- ints.keySet),
        s"row $i strings")
    }
  }

  test("int/float/bool array encode -> decode is identity; collisions " +
      "resolve by fold order") {
    // the four array folds run str -> int -> float -> bool
    // (TypedMeta.encodeArrays); each stage replaces colliding earlier
    // entries, so on a shared key the LATER type wins — one type per
    // key, the reference's union semantics
    val genIntArr = Gen.listOf(Gen.chooseNum(Long.MinValue / 2,
      Long.MaxValue / 2)).map(_.take(4).toSeq)
    val genFloatArr = Gen.listOf(Gen.oneOf(
      Gen.chooseNum(-1e9, 1e9), Gen.oneOf(0.0, -0.0, 0.1,
        1.0 / 3.0, Double.MinPositiveValue, 1.7976931348623157e308)))
      .map(_.take(4).toSeq)
    val genBoolArr = Gen.listOf(Gen.oneOf(true, false)).map(_.take(4).toSeq)
    val cases = Gen.listOfN(40,
        Gen.zip(genMap(genIntArr), genMap(genFloatArr), genMap(genBoolArr),
          genMap(genStr)))
      .apply(Gen.Parameters.default, Seed(20260816L)).get
    val df = cases.zipWithIndex
      .map { case ((is, fs, bs, ss), i) => (i.toLong, ss, is, fs, bs) }
      .toDF("row_id", "meta", "meta_int_arr", "meta_float_arr",
        "meta_bool_arr")
    val encoded = TypedMeta.encodeArrays(TypedMeta.encode(df))
    assert(encoded.columns.toSet == Set("row_id", "meta"))
    val decoded = encoded.select(col("row_id"),
        TypedMeta.decodeArrInt(col("meta")).as("i"),
        TypedMeta.decodeArrFloat(col("meta")).as("f"),
        TypedMeta.decodeArrBool(col("meta")).as("b"),
        TypedMeta.decodeStr(col("meta")).as("s"))
      .collect().map(r => r.getLong(0) -> r).toMap
    def seqMap[T](r: org.apache.spark.sql.Row, i: Int): Map[String, Seq[T]] =
      r.getMap[String, scala.collection.Seq[T]](i)
        .map { case (k, v) => k -> v.toSeq }.toMap
    for (((is, fs, bs, ss), i) <- cases.zipWithIndex) {
      val r = decoded(i.toLong)
      // fold order: bool > float > int (later stage wins the key)
      val expectF = fs -- bs.keySet
      val expectI = is -- fs.keySet -- bs.keySet
      assert(seqMap[Boolean](r, 3) == bs, s"row $i bool arrays")
      // doubles round-trip bit-exact through JSON shortest-repr
      assert(seqMap[Double](r, 2) == expectF, s"row $i float arrays: " +
        s"got ${seqMap[Double](r, 2)} want $expectF")
      assert(seqMap[Long](r, 1) == expectI, s"row $i int arrays")
      assert(r.getMap[String, String](4) ==
          (ss -- is.keySet -- fs.keySet -- bs.keySet),
        s"row $i strings")
    }
  }
}
