package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries plus their DuckDB oracle SQL.
  *
  * Contract (driver-enforced): the Spark result and the DuckDB result of
  * `oracle(name)` must hash-match at sf0.01 — same column names, same
  * values. Determinism rules applied throughout:
  *   - every query ends in an explicit ORDER BY on a unique key;
  *   - double aggregates are `round(...)`-ed identically on both sides
  *     (fp summation order differs between engines);
  *   - timestamps surface as formatted strings, never raw.
  *
  * Queries with no SQL-expressible oracle (approximate ANN, LSH
  * candidates, …) appear in `queries` but not in `oracle` → the driver
  * records a weaker rows-only check; their quality gates live in
  * ScalaTest (e.g. recall >= 0.95 vs exact).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
