package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators beyond Spark's built-ins (SURVEY.md §2.F:
  * range/as-of joins are absent in the reference; the engine exposes
  * them because event-to-state alignment is a staple of training-data
  * assembly).
  *
  * The as-of join here is the UNION + running-window formulation: tag
  * both inputs, sort each key's rows by (ts, right-before-left,
  * tie-break), and carry the last right-side payload forward. ONE
  * shuffle on the key, linear in |L|+|R| — never the |L|×|R| range
  * explosion of a naive non-equi join, and no per-key memory beyond
  * the window frame. This is the shape that survives 100 TB event
  * streams (both sides co-partitioned by key).
  */
object JoinOps {

  /** For every left row, attach `payload` from the latest right row of
    * the same `key` with `rightTs <= leftTs` (NULL if none). `leftId`
    * must be a unique tie-break column; equal timestamps resolve
    * right-before-left (the standard ASOF backward semantics). Output:
    * left columns + `asof_<payload>` column.
    *
    * Nullable payloads are handled exactly: the window carries a
    * per-right-row STRUCT wrapper (non-null whenever a right row
    * exists), so a matched right row whose payload is genuinely NULL
    * yields NULL — it is never skipped in favor of an earlier row's
    * non-null payload. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, leftId: String, rightId: String,
      payload: String): DataFrame = {
    val l = left.select(col(key), col(leftTs).as("__ts"),
      col(leftId).as("__tiebreak"), lit(true).as("__is_left"),
      lit(null).cast(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("p", right.schema(payload).dataType))))
        .as("__payload"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__row"))
    val r = right.select(col(key), col(rightTs).as("__ts"),
      col(rightId).as("__tiebreak"), lit(false).as("__is_left"),
      struct(col(payload).as("p")).as("__payload"),
      lit(null).cast(l.schema("__row").dataType).as("__row"))
    // right rows sort before left rows at equal ts (false < true), so a
    // same-instant right row is visible to the left row
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__is_left"), col("__tiebreak"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__is_left"))
      .select(col("__row.*"), col("__asof.p").as(s"asof_$payload"))
  }

  /** FORWARD as-of: for every left row, attach `payload` from the
    * EARLIEST right row of the same `key` with `rightTs >= leftTs`
    * (NULL if none) — the "next event after" lookup (next view after a
    * click, next restock after an order). Same single-shuffle
    * union+window shape as [[asOfJoin]], scanned in descending time:
    * the running last-non-null right payload at each left row is the
    * nearest future right row. Same-instant right rows match (the
    * standard ASOF >= bound); ties among them resolve to the highest
    * right id — mirrored exactly by the oracle's window. Nullable
    * payloads are exact via the same struct wrapper as [[asOfJoin]]. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, leftId: String, rightId: String,
      payload: String): DataFrame = {
    val l = left.select(col(key), col(leftTs).as("__ts"),
      col(leftId).as("__tiebreak"), lit(true).as("__is_left"),
      lit(null).cast(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("p", right.schema(payload).dataType))))
        .as("__payload"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__row"))
    val r = right.select(col(key), col(rightTs).as("__ts"),
      col(rightId).as("__tiebreak"), lit(false).as("__is_left"),
      struct(col(payload).as("p")).as("__payload"),
      lit(null).cast(l.schema("__row").dataType).as("__row"))
    // descending scan; right rows sort before left at equal ts
    // (false < true), so a same-instant right row is visible
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").desc, col("__is_left"), col("__tiebreak"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__is_left"))
      .select(col("__row.*"), col("__asof.p").as(s"next_$payload"))
  }

  /** TOLERANCED as-of: [[asOfJoin]] with a staleness bound — the match
    * is NULLed when the latest prior right row is older than
    * `tolSeconds` (kdb's `wj`/pandas' `merge_asof(tolerance=...)`
    * semantics: an attribution window, not an unbounded lookback).
    * Same single-shuffle union+window shape; the right timestamp rides
    * inside the payload struct so the bound tests AFTER the running
    * last-non-null resolves, and the comparison is exact integer
    * microseconds on both engines. */
  def asOfJoinTolerance(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, leftId: String, rightId: String,
      payload: String, tolSeconds: Long): DataFrame = {
    val l = left.select(col(key), col(leftTs).as("__ts"),
      col(leftId).as("__tiebreak"), lit(true).as("__is_left"),
      lit(null).cast(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("p", right.schema(payload).dataType),
        org.apache.spark.sql.types.StructField("t", right.schema(rightTs).dataType))))
        .as("__payload"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__row"))
    val r = right.select(col(key), col(rightTs).as("__ts"),
      col(rightId).as("__tiebreak"), lit(false).as("__is_left"),
      struct(col(payload).as("p"), col(rightTs).as("t")).as("__payload"),
      lit(null).cast(l.schema("__row").dataType).as("__row"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__is_left"), col("__tiebreak"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__is_left"))
      .select(col("__row.*"),
        when(col("__asof").isNotNull &&
            unix_micros(col("__ts")) - unix_micros(col("__asof.t"))
              <= lit(tolSeconds * 1000000L),
          col("__asof.p")).as(s"asof_$payload"))
  }
}
