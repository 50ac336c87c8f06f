package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileParse {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.wcd.Extract
    val pages = graft.queries.Citations.pages(spark, dir)
    val refs = Extract.references(pages)
    time("full refs count cold")(refs.count())
    time("full refs count warm")(refs.count())
    time("refs cache+count") { val r = refs.cache(); r.count() }
    time("agg on cached")(refs.groupBy("first_level_domain_of_url").count().collect())
    val claims = graft.wcd.Claims.allClaims(pages, refs, to_timestamp(lit("2026-08-12 00:00:00")))
    time("claims stats")(graft.wcd.ReadQueries.propertyStatistics(claims).collect())
    spark.stop()
  }
}
