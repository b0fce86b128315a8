package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed metadata over the WAL's string map — the reference keeps
  * metadata values typed end-to-end (`rust/types/src/metadata.rs:659-683`
  * `UpdateMetadataValue::{Bool,Int,Float,Str}`), while this facade's WAL
  * record carries one `map<string,string>`. The tagged-union equivalent:
  * typed values encode with a one-char 0x01 sigil + type tag prefix that
  * survives the materializer fold untouched, and decode back into the
  * typed maps on read — so int/float/bool metadata round-trips typed for
  * ANY key, declared in the collection schema or not.
  *
  * Plain strings stay unprefixed (existing writes are already valid);
  * a user string that happens to start with the sigil escapes behind the
  * string tag. All encode/decode steps are map expressions inside the
  * write/read plans — nothing touches the driver.
  */
object TypedMeta {

  private val Sigil = "\u0001"
  val TagInt: String = Sigil + "i" + Sigil
  val TagFloat: String = Sigil + "f" + Sigil
  val TagBool: String = Sigil + "b" + Sigil
  val TagStr: String = Sigil + "s" + Sigil

  /** Reserved KEY carrying the record's `uri` field through the WAL map
    * — the reference's blob-pointer record field
    * (`chromadb/api/models/Collection.py:96-109` uris surface,
    * `ProjectionRecord` `operator.rs:526-530`). Riding the map buys the
    * materializer's per-key LWW for free: an Update carrying only a new
    * uri replaces it and keeps document/metadata. Sigil-prefixed keys
    * are reserved — [[decodeStr]] strips them from user metadata.
    */
  val UriKey: String = Sigil + "uri"

  /** Fold typed metadata columns (`meta_int`, `meta_float`, `meta_bool`,
    * if present on the batch) into the WAL string map with type tags;
    * escape plain strings that collide with the sigil. A key present in
    * several sources resolves deterministically: int > float > bool >
    * plain string (a map value has exactly one type in the reference's
    * union; later sources filter against earlier winners so the concat
    * never sees a duplicate key).
    */
  def encode(records: DataFrame): DataFrame = {
    val typedCols = Seq("meta_int" -> TagInt, "meta_float" -> TagFloat,
      "meta_bool" -> TagBool).filter { case (c, _) => records.columns.contains(c) }
    // ALWAYS escape plain strings, even with no typed columns in the
    // batch — and therefore encode() must run FIRST in any encode chain
    // (before encodeUri/encodeSparse/encodeArrStr): escaping can only
    // distinguish user strings from our tags while the map holds ONLY
    // user strings. Run last, it would TagStr-wrap the sparse/array
    // entries the earlier stages just folded in, silently unlinking
    // them from their decoders.
    if (typedCols.isEmpty) {
      if (!records.columns.contains("meta")) return records
      return records.withColumn("meta", transform_values(
        coalesce(col("meta"),
          map_from_arrays(array(), array()).cast("map<string,string>")),
        (_, v) => when(v.startsWith(Sigil), concat(lit(TagStr), v))
          .otherwise(v)))
    }
    // Null-guard every map column first: a single NULL map (common after
    // unionByName or Option-built batches) would otherwise propagate —
    // transform_values(null) = null, the map_filter predicates go null
    // and drop the OTHER maps' entries, and the final map_concat fold
    // nulls out — silently wiping the row's entire metadata.
    val records1 = (Seq("meta") ++ typedCols.map(_._1))
      .filter(records.columns.contains)
      .foldLeft(records) { (df, c) =>
        df.withColumn(c, coalesce(col(c),
          map_from_arrays(array(), array()).cast(df.schema(c).dataType)))
      }
    val escaped = transform_values(col("meta"),
      (_, v) => when(v.startsWith(Sigil), concat(lit(TagStr), v)).otherwise(v))
    val tagged = typedCols.zipWithIndex.map { case ((c, tag), i) =>
      val base = transform_values(col(c), (_, v) => concat(lit(tag), v.cast("string")))
      typedCols.take(i).map(_._1).foldLeft(base) { (m, prior) =>
        map_filter(m, (k, _) => !map_contains_key(col(prior), k))
      }
    }
    val plainMinusTyped = typedCols.map(_._1).foldLeft(escaped) { (m, c) =>
      map_filter(m, (k, _) => !map_contains_key(col(c), k))
    }
    records1
      .withColumn("meta", tagged.foldLeft(plainMinusTyped)(map_concat(_, _)))
      .drop(typedCols.map(_._1): _*)
  }

  /** Entries of the WAL map carrying `tag`, values cast to `cast`. */
  private def taggedMap(meta: Column, tag: String, cast: String): Column =
    map_filter(
      transform_values(
        map_filter(meta, (_, v) => v.startsWith(tag)),
        (_, v) => v.substr(lit(tag.length + 1), length(v)).cast(cast)),
      (_, v) => v.isNotNull)

  /** Decode: typed maps out of the tagged entries. */
  def decodeInt(meta: Column): Column = taggedMap(meta, TagInt, "bigint")
  def decodeFloat(meta: Column): Column = taggedMap(meta, TagFloat, "double")
  def decodeBool(meta: Column): Column = taggedMap(meta, TagBool, "boolean")

  /** Sparse-vector metadata values — the reference's
    * `MetadataValue::SparseVector` (`rust/types/src/metadata.rs:39,659-683`)
    * — ride the WAL string map too: a `meta_sparse`
    * `map<string, struct<indices array<bigint>, values array<float>>>`
    * column encodes each entry as `TagSparse + "i1,i2|v1,v2"` (longs and
    * Float.toString shortest-reprs — both round-trip bit-exact through
    * string), so sparse metadata gets the materializer's per-key LWW and
    * the persist/reopen cycle for free, exactly like int/float/bool.
    * Compaction shreds it back to the typed serving column
    * ([[decodeSparse]] in `shredRecords`), mirroring the reference's
    * row-WAL → typed-segment split.
    */
  val TagSparse: String = Sigil + "v" + Sigil

  /** Fold a `meta_sparse` column (if present) into the WAL map. */
  def encodeSparse(records: DataFrame): DataFrame =
    if (!records.columns.contains("meta_sparse")) records
    else {
      val none = map_from_arrays(array(), array()).cast("map<string,string>")
      val sv = coalesce(col("meta_sparse"),
        map_from_arrays(array(), array())
          .cast(records.schema("meta_sparse").dataType))
      val encoded = transform_values(sv, (_, v) => concat(lit(TagSparse),
        array_join(transform(v.getField("indices"), _.cast("string")), ","),
        lit("|"),
        array_join(transform(v.getField("values"), _.cast("string")), ",")))
      records
        .withColumn("meta", map_concat(
          map_filter(coalesce(col("meta"), none),
            (k, _) => !map_contains_key(encoded, k)),
          encoded))
        .drop("meta_sparse")
    }

  /** The sparse map back out of the tagged entries. */
  def decodeSparse(meta: Column): Column =
    transform_values(
      map_filter(meta, (_, v) => v.startsWith(TagSparse)),
      (_, v) => {
        val payload = v.substr(lit(TagSparse.length + 1), length(v))
        val parts = split(payload, "\\|", 2)
        struct(
          transform(filter(split(element_at(parts, 1), ","), e => e =!= ""),
            _.cast("bigint")).as("indices"),
          transform(filter(split(element_at(parts, 2), ","), e => e =!= ""),
            _.cast("float")).as("values"))
      })

  /** Array-of-string metadata values — the reference's list metadata
    * (`rust/types/src/metadata.rs:2169` `ContainsOperator` over array
    * values) — ride the WAL string map as `TagArr + to_json(array)`:
    * JSON round-trips ANY element string exactly (separator-free), both
    * directions are codegen'd map expressions, and the per-key LWW fold
    * replaces whole arrays, the reference's update semantics.
    */
  val TagArr: String = Sigil + "l" + Sigil
  /** The other three primitive-array tags
    * (`MetadataValue::{IntArray,FloatArray,BoolArray}`,
    * `rust/types/src/metadata.rs:346-352`) — uppercase of the scalar
    * tag letters. JSON payloads round-trip each element type exactly
    * (longs and doubles print shortest-repr; from_json parses back
    * bit-identical).
    */
  val TagArrInt: String = Sigil + "I" + Sigil
  val TagArrFloat: String = Sigil + "F" + Sigil
  val TagArrBool: String = Sigil + "B" + Sigil

  private val ArrCols: Seq[(String, String, org.apache.spark.sql.types.DataType)] = {
    import org.apache.spark.sql.types._
    Seq(
      ("meta_str_arr", TagArr, StringType),
      ("meta_int_arr", TagArrInt, LongType),
      ("meta_float_arr", TagArrFloat, DoubleType),
      ("meta_bool_arr", TagArrBool, BooleanType))
  }

  private def encodeArrCol(records: DataFrame, colName: String,
      tag: String): DataFrame =
    if (!records.columns.contains(colName)) records
    else {
      val none = map_from_arrays(array(), array()).cast("map<string,string>")
      val av = coalesce(col(colName),
        map_from_arrays(array(), array())
          .cast(records.schema(colName).dataType))
      val encoded = transform_values(av,
        (_, v) => concat(lit(tag), to_json(v)))
      records
        .withColumn("meta", map_concat(
          map_filter(coalesce(col("meta"), none),
            (k, _) => !map_contains_key(encoded, k)),
          encoded))
        .drop(colName)
    }

  /** Fold a `meta_str_arr` column (if present) into the WAL map. */
  def encodeArrStr(records: DataFrame): DataFrame =
    encodeArrCol(records, "meta_str_arr", TagArr)

  /** Fold every typed-array metadata column present into the WAL map —
    * the four-way generalization of [[encodeArrStr]].
    */
  def encodeArrays(records: DataFrame): DataFrame =
    ArrCols.foldLeft(records) { case (df, (c, tag, _)) =>
      encodeArrCol(df, c, tag)
    }

  private def decodeArrCol(meta: Column, tag: String,
      elem: org.apache.spark.sql.types.DataType): Column =
    transform_values(
      map_filter(meta, (_, v) => v.startsWith(tag)),
      (_, v) => from_json(
        v.substr(lit(tag.length + 1), length(v)),
        org.apache.spark.sql.types.ArrayType(elem)))

  /** The string-array map back out of the tagged entries. */
  def decodeArrStr(meta: Column): Column =
    decodeArrCol(meta, TagArr, org.apache.spark.sql.types.StringType)
  def decodeArrInt(meta: Column): Column =
    decodeArrCol(meta, TagArrInt, org.apache.spark.sql.types.LongType)
  def decodeArrFloat(meta: Column): Column =
    decodeArrCol(meta, TagArrFloat, org.apache.spark.sql.types.DoubleType)
  def decodeArrBool(meta: Column): Column =
    decodeArrCol(meta, TagArrBool, org.apache.spark.sql.types.BooleanType)

  /** Fold a `uri` column (if present) into the WAL map under [[UriKey]],
    * dropping the column; null uris add no entry (absent ≠ empty).
    */
  def encodeUri(records: DataFrame): DataFrame =
    if (!records.columns.contains("uri")) records
    else {
      val none = map_from_arrays(array(), array()).cast("map<string,string>")
      records
        .withColumn("meta", map_concat(
          map_filter(coalesce(col("meta"), none), (k, _) => k =!= UriKey),
          when(col("uri").isNotNull, map(lit(UriKey), col("uri").cast("string")))
            .otherwise(none)))
        .drop("uri")
    }

  /** The record's uri out of the WAL map (null when absent). */
  def decodeUri(meta: Column): Column = element_at(meta, UriKey)

  /** The string remainder: tagged typed entries and reserved
    * sigil-prefixed keys ([[UriKey]]) removed, escaped strings
    * un-escaped.
    */
  def decodeStr(meta: Column): Column =
    transform_values(
      map_filter(meta, (k, v) =>
        !k.startsWith(Sigil) &&
        !(v.startsWith(TagInt) || v.startsWith(TagFloat) ||
          v.startsWith(TagBool) || v.startsWith(TagSparse) ||
          v.startsWith(TagArr) || v.startsWith(TagArrInt) ||
          v.startsWith(TagArrFloat) || v.startsWith(TagArrBool))),
      (_, v) => when(v.startsWith(TagStr), v.substr(lit(TagStr.length + 1), length(v)))
        .otherwise(v))
}
