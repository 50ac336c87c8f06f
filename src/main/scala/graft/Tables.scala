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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
      // to TimestampType. Read nanos as LONG and truncate to micros — the
      // same truncation DuckDB applies, so oracle comparisons line up.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
