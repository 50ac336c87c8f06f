package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader over the driver testdata layout
  * (`/root/testdata/sf{N}/<name>.parquet`, see TESTDATA.md).
  *
  * All engine queries read through here so that scan-level concerns
  * (schema, pushdown-friendly layout) stay in one place. At cluster
  * scale the same API would point at partitioned table roots; the
  * per-query filters/projections are written so Catalyst pushes them
  * into the parquet scan (verify via `.explain`: PushedFilters /
  * ReadSchema).
  *
  * Physical-type drift defense: the driver regenerates the testdata
  * every round and the parquet PHYSICAL encoding of logical types has
  * drifted between rounds (round 7: `events.ts` flipped from
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) to nanos-as-INT64 and 14
  * queries died with DATATYPE_MISMATCH). Timestamp columns are the
  * exposed class — nanos vs micros, NTZ vs UTC-adjusted, date32 —
  * because Spark surfaces each as a DIFFERENT Catalyst type while the
  * DuckDB oracle reads them all as a naive timestamp. Every load
  * therefore probes the footer-declared type of each canonical
  * timestamp column and adapts it to session-TZ TimestampType
  * (sessions run UTC), for EVERY table, not just events. Integer
  * widths are deliberately NOT coerced: both engines read the same
  * file, so a width drift moves both sides together, and coercing one
  * side would CREATE a schema mismatch.
  */
object Tables {
  import org.apache.spark.sql.functions._

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Canonical timestamp-typed columns per table (TESTDATA.md): the
    * columns every query and oracle treats as a naive UTC timestamp,
    * whatever physical encoding the driver generated this round. */
  val timestampCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"))

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // nanos-as-long must be set BEFORE the read so a nanos footer
    // surfaces as LongType instead of failing the scan outright
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    timestampCols.getOrElse(name, Nil).foldLeft(df)(normalizeTsCol)
  }

  /** Map whatever physical type `colName` landed as to TimestampType:
    * nanos-as-long → truncate to micros; micros-NTZ → reinterpret in
    * the (UTC) session TZ; date32 → midnight timestamp. Already-correct
    * columns pass through untouched. */
  def normalizeTsCol(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.types._
    if (!df.columns.contains(colName)) df
    else df.schema(colName).dataType match {
      case LongType => // nanos read as long → truncate to micros
        df.withColumn(colName, timestamp_micros(expr(s"$colName div 1000")))
      case _: TimestampNTZType => // micros NTZ → reinterpret in session TZ (UTC)
        df.withColumn(colName, col(colName).cast(TimestampType))
      case DateType => // date32 → midnight timestamp, DuckDB-comparable
        df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
    }
  }

  /** Back-compat shim for the streaming source: normalize `ts`. */
  def normalizeTs(df: DataFrame): DataFrame = normalizeTsCol(df, "ts")
}
