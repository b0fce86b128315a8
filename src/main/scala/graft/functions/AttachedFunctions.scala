package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Server-side named functions bound to collections — the reference's
  * attached functions (`rust/frontend/src/impls/service_based_frontend.rs:
  * 3208-3460`: register by name, executor runs them over the collection,
  * outputs live beside it; accumulators in
  * `rust/worker/src/execution/functions/statistics.rs`). Here a function
  * is records-DataFrame → small output DataFrame, so it composes into one
  * Catalyst plan over the live state; the streaming face (incremental
  * catch-up by completion offset) is the same aggregation run under
  * Structured Streaming (`st_sessionize_stateful` shape).
  */
object AttachedFunctions {

  trait AttachedFunction {
    def name: String
    /** records in the standard shredded schema → output table */
    def apply(records: DataFrame): DataFrame
  }

  /** CounterFunction: live record count. */
  object RecordCount extends AttachedFunction {
    val name = "record_count"
    def apply(records: DataFrame): DataFrame =
      records.agg(count(lit(1)).as("n"))
  }

  /** Token-frequency statistic: global top-10 document tokens by
    * (count desc, token asc) — the TokenFreqAgg accumulator shape as a
    * two-phase partial aggregation.
    */
  object TokenStats10 extends AttachedFunction {
    val name = "token_stats_10"
    def apply(records: DataFrame): DataFrame =
      records
        .select(explode(graft.operators.TextStats.tokens(col("document"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("term")).limit(10)
  }

  /** Histogram over a string metadata key (absent key → bucket NULL). */
  final class MetaHistogram(key: String) extends AttachedFunction {
    val name = s"meta_histogram:$key"
    def apply(records: DataFrame): DataFrame =
      records.groupBy(element_at(col("meta_str"), key).as("value"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("value"))
  }

  /** NB quality scoring bound to the collection (the GPT-3 quality gate
    * as a server-side function): the target class is records whose
    * `meta_str[key] == value` (absent key = raw class — curated vs
    * everything else), the model fits on the LIVE records and scores
    * every record ([[graft.operators.TextStats.scoreWithNb]] self-score
    * shape). Output per record: (doc_id = record id, n_toks, logodds,
    * pred).
    */
  final class NbQuality(key: String, value: String) extends AttachedFunction {
    val name = s"nb_quality:$key=$value"
    def apply(records: DataFrame): DataFrame = {
      val docs = records.select(col("id").as("doc_id"),
        col("document").as("text"),
        coalesce(element_at(col("meta_str"), key) === value, lit(false))
          .as("is_target"))
      graft.operators.TextStats.nbQualityScore(docs,
        docs.select(col("doc_id"), col("text")))
    }
  }

  /** Map a function's output table into collection RECORDS for the
    * instance's output collection (the reference's attached functions
    * write their results as records into a dedicated output collection —
    * `attach_function`'s `output_collection`,
    * `rust/types/src/api_types.rs:2651`): the FIRST output column
    * renders as the record id (so it must be a key of the output —
    * every shipped function's leading column is), every remaining
    * column shreds by Spark type into the matching typed-metadata map
    * (int-like → `meta_int`, float-like → `meta_float`, boolean →
    * `meta_bool`, everything else stringifies into `meta_str`). A pure
    * projection — no shuffle, no action; NULL cells drop from their map
    * rather than ride as null-valued entries.
    */
  def toRecords(out: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val idCol = out.columns.head
    def group(p: DataType => Boolean): Seq[String] =
      out.schema.fields.tail.collect {
        case f if p(f.dataType) => f.name
      }.toSeq
    val ints = group {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val floats = group {
      case FloatType | DoubleType => true
      case _: DecimalType => true
      case _ => false
    }
    val bools = group { case BooleanType => true; case _ => false }
    val strs = out.schema.fields.tail.map(_.name)
      .filterNot((ints ++ floats ++ bools).toSet).toSeq
    def metaMap(keys: Seq[String], cast: String) =
      if (keys.isEmpty)
        map_from_arrays(array(), array()).cast(s"map<string,$cast>")
      else map_filter(
        map(keys.flatMap(k => Seq(lit(k), col(k).cast(cast))): _*),
        (_, v) => v.isNotNull)
    out.select(
      coalesce(col(idCol).cast("string"), lit("null")).as("id"),
      metaMap(ints, "long").as("meta_int"),
      metaMap(floats, "double").as("meta_float"),
      metaMap(bools, "boolean").as("meta_bool"),
      metaMap(strs, "string").as("meta"))
  }

  /** Resolve a registered function by name; `meta_histogram:<key>` and
    * `nb_quality:<key>=<value>` are parameterized families. The
    * parameterized families also resolve from their BARE id plus a
    * params map — the reference's functions read the attached
    * instance's stored params JSON at execution time
    * (`rust/worker/src/execution/functions/count_to_file_async.rs:73-78`
    * parses `af.params`), so `attach_function("meta_histogram",
    * params={"key": "lang"})` must configure the run, not ride along as
    * dead metadata. Missing required params reject HERE, which the
    * attach path calls — at attach, not first run, like every other
    * registration check.
    */
  def resolve(name: String,
      params: Map[String, String] = Map.empty): AttachedFunction = {
    def need(k: String): String = params.getOrElse(k,
      throw new IllegalArgumentException(
        s"attached function '$name' requires params['$k']"))
    name match {
      case RecordCount.name => RecordCount
      case TokenStats10.name => TokenStats10
      case "meta_histogram" => new MetaHistogram(need("key"))
      case h if h.startsWith("meta_histogram:") =>
        new MetaHistogram(h.stripPrefix("meta_histogram:"))
      case "nb_quality" => new NbQuality(need("key"), need("value"))
      case nb if nb.startsWith("nb_quality:") && nb.contains("=") =>
        val body = nb.stripPrefix("nb_quality:")
        val Array(k, v) = body.split("=", 2)
        new NbQuality(k, v)
      case other =>
        throw new IllegalArgumentException(
          s"unknown attached function '$other'")
    }
  }
}
