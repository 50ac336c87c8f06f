package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Landed-index COMPACTION — the maintenance stage that closes the
  * index lifecycle: build (landings) → grow at ingest (the s22–s25
  * `foreachBatch` appends) → retract (t87/s27 tombstones) → monitor
  * (t88/s26 drift) → COMPACT. After K growth micro-batches the landed
  * index dir holds the base files plus K small delta appends
  * ([[graft.streaming.StreamOps]]'s grow steps write `mode("append")`),
  * and a retraction pass leaves rows of forgotten ids physically
  * present; a production deployment periodically rewrites the index to
  * its canonical serving layout so gate-join cost doesn't decay with
  * ingest history.
  *
  * Reference anchor: the reference's cache only ever grows
  * (`wikipedia_page.py:350-373` inserts after every upload) and its A7
  * "rinse" deletes whole grains (`wcdimportbot_cli.py` --rinse-all);
  * compaction is the step a 100 TB deployment runs between the two.
  *
  * Scale: [[compact]] is one anti-join with the (small by construction)
  * tombstone set broadcast — an unbounded tombstone backlog would flip
  * to a hash-partitioned anti-join on the id, which is exactly what
  * Spark plans when the broadcast hint is dropped. [[writeCompacted]]
  * pays one repartition into the bucket layout; every subsequent ingest
  * gate then joins arriving rows against the bucketed index with NO
  * index-side Exchange (the index is read in place; only the
  * comparatively tiny batch shuffles) — plan-asserted in
  * IndexMaintenanceSpec.
  */
object IndexMaintenance {

  /** Logical compaction: the live rows of a fragmented index — delta
    * appends retained, every tombstoned id's rows dropped.
    *
    * `broadcastTombstones = true` (the default, and the normal case: a
    * retraction backlog is small by construction between compactions)
    * pins the anti-join's build side to the driver-collected tombstone
    * set; pass `false` when the backlog is unbounded — the hint drops
    * and Spark plans a hash-partitioned anti-join on the id instead of
    * risking a driver OOM. */
  def compact(index: DataFrame, tombstones: DataFrame, id: String,
      broadcastTombstones: Boolean = true): DataFrame = {
    val tomb = tombstones.select(col(id)).distinct()
    index.join(if (broadcastTombstones) broadcast(tomb) else tomb,
      Seq(id), "left_anti")
  }

  /** Physical compaction: rewrite the live rows bucketed AND sorted by
    * the gate-join key columns, one file per bucket (the repartition
    * pins files = buckets; a bare bucketBy writes tasks×buckets
    * fragments). Bucketing metadata needs the session catalog —
    * `bucketBy` + path-save is unsupported by design — hence a table
    * name rather than a path. */
  def writeCompacted(index: DataFrame, table: String, buckets: Int,
      layoutCols: String*): Unit = {
    require(layoutCols.nonEmpty, "compaction layout needs >=1 key column")
    index.repartition(buckets, layoutCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, layoutCols.head, layoutCols.tail: _*)
      .sortBy(layoutCols.head, layoutCols.tail: _*)
      .format("parquet").saveAsTable(table)
  }

  /** Measured broadcast-vs-shuffle ROUTE for the compaction anti-join
    * (the t93/measuredSalt move at the gate-join decision): price the
    * route from the two row counts instead of hand-picking
    * `broadcastTombstones`. Broadcast cost scales with the backlog
    * (driver-collected, shipped to every task); the shuffled anti-join
    * repartitions the whole index. So: broadcast while the backlog is
    * under an absolute driver budget (`maxBroadcastRows`) OR under
    * `1/indexFrac` of the index rows (a backlog that small shuffles
    * nothing worth saving). Integer arithmetic only — the ladder is
    * expressible in ANSI SQL, so the decision itself is hash-checked
    * (t94). Returns a 1-row card
    * (n_index_rows, n_backlog, broadcast_cap, route). */
  def gateRouteCard(index: DataFrame, tombstones: DataFrame, id: String,
      maxBroadcastRows: Long = 100000L, indexFrac: Long = 16L): DataFrame =
    index.agg(count(lit(1)).as("n_index_rows"))
      .crossJoin(tombstones.select(col(id)).distinct()
        .agg(count(lit(1)).as("n_backlog")))
      .withColumn("broadcast_cap", greatest(lit(maxBroadcastRows),
        expr(s"CAST(n_index_rows div $indexFrac AS BIGINT)")))
      .withColumn("route",
        when(col("n_backlog") <= col("broadcast_cap"), "broadcast")
          .otherwise("shuffle"))

  /** [[compact]] with the route picked BY MEASUREMENT from
    * [[gateRouteCard]] — the wired form of the decision. The collect is
    * a 1-row decision scalar off two counts (the measuredSalt class of
    * read): it runs once per compaction, never per row. */
  def compactMeasured(index: DataFrame, tombstones: DataFrame, id: String,
      maxBroadcastRows: Long = 100000L, indexFrac: Long = 16L): DataFrame = {
    val route = gateRouteCard(index, tombstones, id, maxBroadcastRows, indexFrac)
      .select(col("route")).head().getString(0)
    compact(index, tombstones, id, broadcastTombstones = route == "broadcast")
  }

  /** Fragmentation ledger for one index grain — the measured input to
    * the compact-or-not decision, all integer arithmetic: row counts by
    * provenance (`isDelta` marks rows the growth path appended) and
    * liveness (ids in `tombstones` are retracted but physically
    * present), the delta/dead fractions in portable micro-units, and
    * the due flag. Due when deltas ≥ rows/`deltaDueDenom` or dead rows
    * ≥ rows/`deadDueDenom` (integer cross-multiply — no float
    * threshold). One row; one pass over the index. */
  def fragmentationCard(index: DataFrame, tombstones: DataFrame, id: String,
      isDelta: Column, grain: String,
      deltaDueDenom: Long = 20L, deadDueDenom: Long = 50L,
      broadcastTombstones: Boolean = true): DataFrame = {
    val tombDistinct = tombstones.select(col(id)).distinct()
      .withColumn("__dead", lit(true))
    val tomb = if (broadcastTombstones) broadcast(tombDistinct) else tombDistinct
    decisionTail(index.join(tomb, Seq(id), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(isDelta, 1L).otherwise(0L)).as("n_delta_rows"),
        sum(when(col("__dead"), 1L).otherwise(0L)).as("n_dead_rows"))
      .select(lit(grain).as("grain"), col("n_rows"), col("n_delta_rows"),
        col("n_dead_rows")), deltaDueDenom, deadDueDenom)
  }

  /** The decision tail shared by the batch card and the streamed
    * monitor: (grain, n_rows, n_delta_rows, n_dead_rows) → the full
    * card with live count, micro-unit fractions and the due flag. */
  def decisionTail(counts: DataFrame,
      deltaDueDenom: Long = 20L, deadDueDenom: Long = 50L): DataFrame =
    counts.select(col("grain"), col("n_rows"), col("n_delta_rows"),
      col("n_dead_rows"),
      (col("n_rows") - col("n_dead_rows")).as("n_live_rows"),
      TextOps.round6p(col("n_delta_rows").cast("double")
        / col("n_rows").cast("double")).as("delta_frac"),
      TextOps.round6p(col("n_dead_rows").cast("double")
        / col("n_rows").cast("double")).as("dead_frac"),
      (col("n_delta_rows") * deltaDueDenom >= col("n_rows") ||
        col("n_dead_rows") * deadDueDenom >= col("n_rows")).as("compact_due"))
}
