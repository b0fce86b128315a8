package graft

import graft.model.Where
import graft.model.Where._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based check of the Where compiler against a pure-Scala oracle
  * implementing the reference's filter semantics
  * (`chromadb/test/property/test_filtering.py:32-109`): random record sets
  * with randomly-missing typed metadata keys × random Where expressions,
  * Spark-filtered ids must equal oracle-filtered ids.
  *
  * ScalaCheck generators with fixed seeds (deterministic, mirrors
  * `strategies.py` RecordSet generation).
  */
class WherePropertySpec extends AnyFunSuite {
  import SparkTestSession._

  case class Rec(id: String, document: Option[String],
      mStr: Map[String, String], mInt: Map[String, Long],
      mFloat: Map[String, Double], mBool: Map[String, Boolean])

  private val keys = Seq("a", "b", "c")
  private val words = Seq("spark", "filter", "join", "scan", "sort")

  private val genRec: Gen[Rec] = for {
    id <- Gen.identifier.map(_.take(12))
    doc <- Gen.option(Gen.listOfN(4, Gen.oneOf(words)).map(_.mkString(" ")))
    ms <- Gen.mapOf(Gen.zip(Gen.oneOf(keys), Gen.oneOf(words)))
    mi <- Gen.mapOf(Gen.zip(Gen.oneOf(keys), Gen.chooseNum(-5L, 5L)))
    mf <- Gen.mapOf(Gen.zip(Gen.oneOf(keys), Gen.chooseNum(-2.0, 2.0)))
    mb <- Gen.mapOf(Gen.zip(Gen.oneOf(keys), Gen.oneOf(true, false)))
  } yield Rec(id, doc, ms, mi, mf, mb)

  private val genValue: Gen[Value] = Gen.oneOf(
    Gen.oneOf(words).map(VStr),
    Gen.chooseNum(-5L, 5L).map(VInt),
    Gen.chooseNum(-2.0, 2.0).map(VFloat),
    Gen.oneOf(true, false).map(VBool))

  private def genExpr(depth: Int): Gen[Expr] =
    if (depth == 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      1 -> Gen.listOfN(2, genExpr(depth - 1)).map(And(_)),
      1 -> Gen.listOfN(2, genExpr(depth - 1)).map(Or(_)))

  private val genLeaf: Gen[Expr] = Gen.oneOf(
    for { k <- Gen.oneOf(keys); op <- Gen.oneOf("$eq", "$ne", "$gt", "$gte", "$lt", "$lte");
          v <- genValue } yield Cmp(k, op, v),
    for { k <- Gen.oneOf(keys); n <- Gen.oneOf(false, true);
          vs <- Gen.nonEmptyListOf(genValue).map(_.take(3)) }
      yield SetIn(k, vs.map {
        // a set must be homogeneous like the reference's typed sets
        case v => vs.head match {
          case _: VStr => v match { case VStr(_) => v; case _ => vs.head }
          case _ => v
        }
      }.filter(_.getClass == vs.head.getClass), n),
    for { w <- Gen.oneOf(words); n <- Gen.oneOf(false, true) } yield DocContains(w, n))

  /** Pure-Scala oracle of the two-valued semantics. */
  private def oracle(e: Expr, r: Rec): Boolean = e match {
    case And(cs) => cs.forall(oracle(_, r))
    case Or(cs)  => cs.exists(oracle(_, r))
    case Cmp(k, op, v) =>
      val found: Option[Any] = v match {
        case VStr(_)  => r.mStr.get(k)
        case VBool(_) => r.mBool.get(k)
        case _        => r.mInt.get(k).map(_.toDouble).orElse(r.mFloat.get(k))
      }
      (found, v) match {
        case (None, _) => op == "$ne" // absent: $ne true, others false
        case (Some(x: String), VStr(s)) => cmpOp(op, x.compareTo(s))
        case (Some(x: Boolean), VBool(b)) =>
          op match {
            case "$eq" => x == b; case "$ne" => x != b
            case _ => cmpOp(op, x.compareTo(b))
          }
        case (Some(x: Double), VInt(i))   => cmpOp(op, x.compareTo(i.toDouble))
        case (Some(x: Double), VFloat(f)) => cmpOp(op, x.compareTo(f))
        case _ => op == "$ne"
      }
    case SetIn(k, vs, negated) =>
      if (vs.isEmpty) return negated
      val found: Option[Any] = vs.head match {
        case VStr(_)  => r.mStr.get(k)
        case VBool(_) => r.mBool.get(k)
        case _        => r.mInt.get(k).map(_.toDouble).orElse(r.mFloat.get(k))
      }
      found match {
        case None => negated
        case Some(x) =>
          val in = vs.exists {
            case VStr(s) => x == s
            case VBool(b) => x == b
            case VInt(i) => x == i.toDouble
            case VFloat(f) => x == f
          }
          if (negated) !in else in
      }
    case DocContains(w, negated) =>
      r.document match {
        case None => negated
        case Some(d) => if (negated) !d.contains(w) else d.contains(w)
      }
    case _ => throw new IllegalStateException("not generated")
  }

  private def cmpOp(op: String, c: Int): Boolean = op match {
    case "$eq" => c == 0; case "$ne" => c != 0
    case "$gt" => c > 0; case "$gte" => c >= 0
    case "$lt" => c < 0; case "$lte" => c <= 0
  }

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("offset_id", LongType),
    StructField("document", StringType),
    StructField("meta_str", MapType(StringType, StringType)),
    StructField("meta_int", MapType(StringType, LongType)),
    StructField("meta_float", MapType(StringType, DoubleType)),
    StructField("meta_bool", MapType(StringType, BooleanType))))

  test("mixed-type key collisions survive the facade write -> filter -> project round-trip") {
    // SURVEY §7.4's hard part: the SAME metadata key holds an int in one
    // record, a string in another, a float or bool elsewhere. Through
    // the FULL facade round-trip (TypedMeta tag-encode into the WAL
    // string map -> materializer fold -> typed shred on read) the
    // compiled Where must still match the two-valued missing-key oracle
    // record by record, and single-key projection must render each
    // record's OWN typed value — nothing may bleed across records.
    import graft.api.Client
    import spark.implicits._
    // one type per (record, key), chosen independently PER RECORD — the
    // cross-record collision generator
    val floats = Seq(-1.5, -0.5, 0.5, 2.5) // exact halves: stable rendering
    val genTyped: Gen[(Int, Any)] = Gen.oneOf(
      Gen.oneOf(words).map(0 -> _),
      Gen.chooseNum(-5L, 5L).map(1 -> _),
      Gen.oneOf(floats).map(2 -> _),
      Gen.oneOf(true, false).map(3 -> _))
    val genMixedRec: Gen[Rec] = for {
      doc <- Gen.option(Gen.listOfN(4, Gen.oneOf(words)).map(_.mkString(" ")))
      kvs <- Gen.sequence[List[Option[(String, (Int, Any))]], Option[(String, (Int, Any))]](
        keys.map(k => Gen.option(genTyped.map(k -> _))).toList)
    } yield {
      val present = kvs.flatten
      Rec("", doc,
        present.collect { case (k, (0, v: String)) => k -> v }.toMap,
        present.collect { case (k, (1, v: Long)) => k -> v }.toMap,
        present.collect { case (k, (2, v: Double)) => k -> v }.toMap,
        present.collect { case (k, (3, v: Boolean)) => k -> v }.toMap)
    }
    val params = Gen.Parameters.default
    for (caseIdx <- 0 until 4) {
      val seed = Seed(caseIdx.toLong * 104729 + 7)
      val recs = Gen.listOfN(30, genMixedRec).pureApply(params, seed)
        .zipWithIndex.map { case (r, i) => r.copy(id = f"r$i%03d") }
      // the generator must actually produce cross-record collisions
      val collided = keys.filter { k =>
        Seq(recs.exists(_.mStr.contains(k)), recs.exists(_.mInt.contains(k)),
          recs.exists(_.mFloat.contains(k)), recs.exists(_.mBool.contains(k)))
          .count(identity) >= 2
      }
      assert(collided.nonEmpty, s"case $caseIdx generated no type collision")

      val root = java.nio.file.Files.createTempDirectory("mixmeta").toString
      val coll = new Client(spark, root).createCollection(s"mix$caseIdx")
      coll.add(recs.map(r =>
          (r.id, r.document, r.mStr, r.mInt, r.mFloat, r.mBool))
        .toDF("id", "document", "meta", "meta_int", "meta_float", "meta_bool"))

      val exprs = Gen.listOfN(8, genExpr(2)).pureApply(params, seed.next)
      for (expr <- exprs) {
        val got = coll.get(where = Some(expr)).select("id")
          .collect().map(_.getString(0)).toSet
        val expected = recs.filter(oracle(expr, _)).map(_.id).toSet
        assert(got == expected,
          s"case $caseIdx expr=$expr\n missing=${expected -- got}\n " +
            s"extra=${got -- expected}")
      }

      // single-key projection renders each record's own typed value
      for (k <- collided.take(1)) {
        val proj = coll.get(include = Seq(s"meta:$k")).collect()
          .map(r => r.getString(0) -> Option(r.getString(1))).toMap
        for (r <- recs) {
          val want: Option[String] = r.mStr.get(k)
            .orElse(r.mInt.get(k).map(_.toString))
            .orElse(r.mFloat.get(k).map(_.toString))
            .orElse(r.mBool.get(k).map(_.toString))
          assert(proj(r.id) == want,
            s"case $caseIdx key=$k rec=${r.id}: projected ${proj(r.id)}, " +
              s"expected $want")
        }
      }
    }
  }

  test("ROUTED get == oracle over random nested trees " +
      "(indexed + disabled keys, FTS, missing keys)") {
    // the recursive bitmap router's narrow-only invariant under fuzz:
    // random And/Or trees over a PERSISTED collection where `a` (string)
    // and `b` (int) carry enabled inverted indexes, `c` is declared but
    // DISABLED, and documentFts serves $contains — whatever subset of a
    // tree routes, the verify pass must land exactly on the two-valued
    // oracle, record by record. Also asserts the fuzz actually exercised
    // BOTH the routed and the scan path (a router that silently stopped
    // routing would pass the semantics check).
    import graft.api.Client
    import graft.sources.Catalog
    import spark.implicits._
    // declared-type-honest records: a/c only ever string, b only int,
    // each independently missing per record
    val genTyped: Gen[Rec] = for {
      doc <- Gen.option(Gen.listOfN(4, Gen.oneOf(words)).map(_.mkString(" ")))
      a <- Gen.option(Gen.oneOf(words))
      b <- Gen.option(Gen.chooseNum(-5L, 5L))
      c <- Gen.option(Gen.oneOf(words))
    } yield Rec("", doc,
      Map.empty[String, String] ++ a.map("a" -> _) ++ c.map("c" -> _),
      Map.empty[String, Long] ++ b.map("b" -> _), Map.empty, Map.empty)
    val params = Gen.Parameters.default
    val seed = Seed(20260816L)
    val recs = Gen.listOfN(60, genTyped).pureApply(params, seed)
      .zipWithIndex.map { case (r, i) => r.copy(id = f"r$i%03d") }
    val root = java.nio.file.Files.createTempDirectory("routedfuzz").toString
    val coll = new Client(spark, root).createCollection("routed",
      Catalog.Schema(
        documentFts = true,
        keys = Map(
          "a" -> Catalog.KeyConfig(Catalog.VString, invertedIndex = Some(true)),
          "b" -> Catalog.KeyConfig(Catalog.VInt, invertedIndex = Some(true)),
          "c" -> Catalog.KeyConfig(Catalog.VString, invertedIndex = Some(false)))))
    coll.add(recs.map(r => (r.id, r.document.orNull, r.mStr, r.mInt))
      .toDF("id", "document", "meta", "meta_int"))
    coll.persist()
    val exprs = Gen.listOfN(40, genExpr(2)).pureApply(params, seed.next)
    var routed = 0; var scanned = 0
    for (expr <- exprs) {
      val df = coll.get(where = Some(expr))
      val got = df.select("id").collect().map(_.getString(0)).toSet
      val expected = recs.filter(oracle(expr, _)).map(_.id).toSet
      assert(got == expected,
        s"expr=$expr\n missing=${expected -- got}\n extra=${got -- expected}")
      if (df.inputFiles.exists(f =>
          f.contains("meta_inverted") || f.contains("meta_range") ||
            f.contains("fts/"))) routed += 1
      else scanned += 1
    }
    assert(routed > 0, "fuzz never exercised the routed path")
    assert(scanned > 0, "fuzz never exercised the scan path")
  }

  test("compiled Where == oracle over 30 random (recordset, expr) cases") {
    var params = Gen.Parameters.default
    for (caseIdx <- 0 until 30) {
      val seed = Seed(caseIdx.toLong * 7919 + 13)
      val recs0 = Gen.listOfN(40, genRec).pureApply(params, seed)
      // unique ids
      val recs = recs0.zipWithIndex.map { case (r, i) => r.copy(id = s"${r.id}_$i") }
      val expr = genExpr(2).pureApply(params, seed.next)
      val rows = recs.zipWithIndex.map { case (r, i) =>
        Row(r.id, i.toLong, r.document.orNull, r.mStr, r.mInt, r.mFloat, r.mBool)
      }
      val df = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        schema)
      val got = df.filter(Where.compile(expr)).select("id")
        .collect().map(_.getString(0)).toSet
      val expected = recs.filter(r => oracle(expr, r)).map(_.id).toSet
      assert(got == expected,
        s"case $caseIdx expr=$expr\n missing=${expected -- got}\n extra=${got -- expected}")
    }
  }
}
