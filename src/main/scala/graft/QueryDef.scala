package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark DataFrame program plus (when
  * SQL-expressible) an equivalent DuckDB oracle statement over the same
  * parquet tables. The driver harness hash-compares the two at sf0.01.
  *
  * Determinism contract (both sides):
  *   - double aggregation goes through exact DECIMAL accumulation and is
  *     cast back to DOUBLE only at the end (fp sums are order-dependent,
  *     decimal sums are not);
  *   - every ORDER BY / top-k has a unique tie-break key;
  *   - column names match the oracle exactly (driver sorts by name).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** Non-SQL-expressible op: driver records a weaker rows-only check. */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
