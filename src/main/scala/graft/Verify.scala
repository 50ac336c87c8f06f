package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name prefixes (dev loop
    // shortcut — the driver always passes exactly two args)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    def selected(name: String) =
      only.forall(_.exists(p => name.startsWith(p)))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // RAM-backed scratch (shuffle/spill + streaming checkpoints), same
    // rationale as Bench — see TempTrees.scratch
    val scratch = graft.TempTrees.scratch("graft-spark-scratch")
    graft.TempTrees.deleteOnExit(scratch)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", scratch.resolve("local").toString)
      .config("spark.ui.enabled", "false")
      // duplicate template keys fold like a Python dict: last value wins
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // per-query storage sweep (the Bench hygiene, checkpoints only): a
    // query's surviving localCheckpoint blocks are dead once its parquet
    // is written; Dataset caches stay — killing blocks under a live
    // CacheManager entry forces later matching plans through a dead
    // InMemoryRelation rebuild (see Bench).
    graft.queries.Citations.warmShared(spark, sfDir)
    val baseRdds = spark.sparkContext.getPersistentRDDs.keySet.toSet
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        finally spark.sparkContext.getPersistentRDDs.foreach { case (rddId, rdd) =>
          if (!baseRdds.contains(rddId) && rdd.isCheckpointed)
            rdd.unpersist(blocking = false)
        }
      }
    }
    // JSON escaping via the shared helper: a tab or CR in builder-
    // authored SQL would otherwise make the driver's json.load fail and
    // silently zero the round's correctness.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) => s"${JsonText.quote(k)}: ${JsonText.quote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
