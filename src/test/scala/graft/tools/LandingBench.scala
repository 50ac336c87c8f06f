package graft.tools

import org.apache.spark.sql.SparkSession

/** Landing-build timing harness (test scope — NOT part of the driver
  * contract): time individual warm-line landing builds SERIALLY on an
  * otherwise idle session, so a chain entry's cost is attributable to
  * its own build rather than to the concurrent warm-phase contention
  * the Bench record shows. Usage:
  *
  *   sbt "Test/runMain graft.tools.LandingBench /root/testdata/sf0.1 pq_books,kmeans_books 2"
  *
  * Each named landing builds in a FRESH SparkSession (cold plan, warm
  * JVM) `iters` times; landDeriv memoizes per (dir, name) key inside a
  * session, so each iteration uses a distinct scratch-suffixed dir
  * alias? No — landDeriv keys on the dir string; iterations re-time the
  * BUILD only on the first run and the memo read after, so we print
  * run 1 (build) separately. */
object LandingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM warm-up outside timings
    spark.range(100000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").sum("v").count()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    // match the Bench environment: re-land the single-row-group driver
    // tables first so raw scans parallelize (the round-9 finding) —
    // otherwise the first build touching a table pays a 1-core scan
    // and the serial numbers misattribute that cost
    val t0r = System.nanoTime()
    graft.Tables.reland(spark, sfDir,
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    println(f"LANDINGBENCH reland                 build=${(System.nanoTime() - t0r) / 1e9}%.3f s")
    import graft.queries.{TrainingData => TD, Pipelines => P}
    val builds: Map[String, () => Unit] = Map(
      "pq_books" -> (() => { TD.pqBooks(spark, sfDir).count(); () }),
      "kmeans_books" -> (() => { TD.kmeansBooks(spark, sfDir).count(); () }),
      "co_order_edges" -> (() => { P.partCoOrderEdges(spark, sfDir).count(); () }),
      "node_route_coorder" -> (() => { P.coorderRouteCardLanded(spark, sfDir).count(); () }),
      "node_route_pagerank" -> (() => { P.pagerankRouteCardLanded(spark, sfDir).count(); () }),
      "node_route_cc" -> (() => { TD.ccRouteCardLanded(spark, sfDir).count(); () }),
      "sp_pairs" -> (() => { P.supplierPartPairs(spark, sfDir).count(); () }),
      "doc_shingles" -> (() => { TD.docShingles(spark, sfDir).count(); () }),
      "minhash_sigs" -> (() => { TD.docMinhashSigs(spark, sfDir).count(); () }),
      "lm_unigrams" -> (() => { TD.lmUnigrams(spark, sfDir).count(); () }),
      "lm_bigrams" -> (() => { TD.lmBigrams(spark, sfDir).count(); () }),
      "seed_grams" -> (() => { TD.seedGramsLanded(spark, sfDir).count(); () }),
      "shared_runs" -> (() => { TD.sharedRunsLanded(spark, sfDir).count(); () }),
      "emb_buckets_neardup" -> (() => { TD.embBuckets(spark, sfDir,
        TD.NearDupLshTables, TD.NearDupLshPlanes).count(); () }),
      "emb_buckets_ann" -> (() => { TD.embBuckets(spark, sfDir,
        TD.AnnLshTables, TD.AnnLshPlanes).count(); () }),
      "dedup_clusters" -> (() => { TD.dedupClusters(spark, sfDir).count(); () })
    )
    for (name <- names) {
      val t0 = System.nanoTime()
      builds(name)()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"LANDINGBENCH $name%-22s build=$t%.3f s")
    }
    spark.stop()
  }
}
