package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query timing harness (test scope — NOT part of the driver
  * contract): time a comma-separated subset of `SparkEntry.queries`
  * under the same session config as `graft.Bench`, without paying the
  * other ~110 queries. Usage:
  *
  *   sbt "Test/runMain graft.tools.MicroBench /root/testdata/sf0.1 g3_triangles,g5_bfs_layers 3"
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val iters = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").sum("v").count()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    graft.queries.Citations.warmShared(spark, sfDir)
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count() // same execution shape as graft.Bench
        (System.nanoTime() - t0) / 1e9
      }
      println(f"MICROBENCH $name%-26s min=${times.min}%.3f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
