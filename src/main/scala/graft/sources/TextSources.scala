package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CSV / JSON-lines source adapters at the [[graft.Tables]] seam.
  *
  * The engine's canonical storage is parquet; production corpora also
  * arrive as CSV exports and JSONL crawls. These adapters land the
  * documents table once per (sfDir, format) into scratch in the target
  * format, then read it back the way a 100 TB ingest must:
  *
  *   - EXPLICIT schema, never `inferSchema` — inference is a full extra
  *     pass over the data and can silently flip a column's type between
  *     snapshots (the parquet timestamp-drift lesson, at text grain);
  *   - standard RFC-4180 quoting/escaping for CSV (quote=`"`,
  *     escape=`"`, header), `multiLine=false` so the reader stays
  *     SPLITTABLE — a multiline CSV cannot be partitioned by byte range
  *     and serializes the scan through one task at scale;
  *   - `mode=FAILFAST` — a malformed row in a reproducibility-pinned
  *     corpus is a stop-the-world event, not a silent null (the F5
  *     strict-load posture at source grain).
  *
  * The round-trip proof is content-addressed: t106/t107 compute the
  * t104 manifest (doc counts, token sums, xor content signatures) FROM
  * the CSV/JSONL landing and hash-match the SAME DuckDB oracle that
  * reads the parquet — equal manifests mean byte-equal content through
  * the format round trip, not just equal row counts.
  */
object TextSources {

  /** documents schema, stated explicitly (TESTDATA.md). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val landed =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.CompletableFuture[String]]()

  /** Land-once memoization (the TrainingData.landDeriv pattern: install
    * an empty future, build OUTSIDE the map's lock, uninstall on
    * failure so a retry can rebuild). */
  private def landOnce(key: String)(build: String => Unit): String = {
    var installed: java.util.concurrent.CompletableFuture[String] = null
    val fut = landed.computeIfAbsent(key, _ => {
      installed = new java.util.concurrent.CompletableFuture[String]()
      installed
    })
    if (fut eq installed) {
      try {
        val root = graft.TempTrees.scratch("graft-sources")
        graft.TempTrees.deleteOnExit(root)
        val p = root.resolve(key.replace('/', '_')).toString
        build(p)
        fut.complete(p)
      } catch { case e: Throwable =>
        fut.completeExceptionally(e)
        landed.remove(key, fut)
        throw e
      }
    }
    fut.join()
  }

  /** The documents table through a CSV round trip (written once per
    * sfDir, read back with the explicit schema + FAILFAST). */
  def documentsCsv(spark: SparkSession, sfDir: String): DataFrame = {
    val path = landOnce(s"$sfDir/documents_csv") { p =>
      graft.Tables(spark, sfDir, "documents")
        .write.option("header", "true")
        .option("quote", "\"").option("escape", "\"")
        .csv(p)
    }
    spark.read.schema(documentsSchema)
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .option("multiLine", "false")
      .option("mode", "FAILFAST")
      .csv(path)
  }

  /** The documents table through a JSON-lines round trip. */
  def documentsJsonl(spark: SparkSession, sfDir: String): DataFrame = {
    val path = landOnce(s"$sfDir/documents_jsonl") { p =>
      graft.Tables(spark, sfDir, "documents").write.json(p)
    }
    spark.read.schema(documentsSchema)
      .option("mode", "FAILFAST")
      .json(path)
  }
}
