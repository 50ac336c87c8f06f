package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm-phase timing harness (test scope): run the Bench warm sequence
  * (reland + warmSharedTimed) exactly as graft.Bench does and print the
  * wall time + per-table map — the A/B instrument for warm-chain
  * rebalancing.
  *
  *   sbt "Test/runMain graft.tools.WarmBench /root/testdata/sf0.1"
  */
object WarmBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scratch = graft.TempTrees.scratch("graft-spark-scratch")
    graft.TempTrees.deleteOnExit(scratch)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", scratch.resolve("local").toString)
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").sum("v").count()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val t0 = System.nanoTime()
    val parts = graft.queries.Citations.warmSharedTimed(spark, sfDir)
    val wall = (System.nanoTime() - t0) / 1e9
    parts.foreach { case (n, v) => println(f"WARMBENCH $n%-22s $v%.3f s") }
    println(f"WARMBENCH wall                   $wall%.3f s")
    spark.stop()
  }
}
