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
  */
object Tables {
  import org.apache.spark.sql.functions._

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // The driver has generated events.ts as parquet TIMESTAMP(NANOS)
      // in some rounds and TIMESTAMP(MICROS, isAdjustedToUTC=false) in
      // others. Normalize both to session-TZ TimestampType (sessions run
      // UTC), matching DuckDB's naive-timestamp view of the same file.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      normalizeTs(df)
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Map whatever physical type `ts` landed as to TimestampType. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => // nanos read as long → truncate to micros
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType => // micros NTZ → reinterpret in session TZ (UTC)
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
}
