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
    // mirror Citations.refs trimming
    val needed = Seq(
      "page_id", "page_title", "language_code", "ref_pos", "template_name",
      "md5hash", "date_ts", "first_level_domain_of_url", "persons_without_role")
    val pages = graft.queries.Citations.pages(spark, dir)
    val trimmed = graft.wcd.Extract.references(pages).select(needed.map(col): _*)
    time("trimmed refs count cold")(trimmed.count())
    time("trimmed refs count warm")(trimmed.count())
    time("c2-shaped agg")(trimmed.groupBy("first_level_domain_of_url").count().collect())
    println("[prof] trimmed plan exchanges: " +
      trimmed.queryExecution.executedPlan.toString.linesIterator.count(_.contains("Exchange")))
    spark.stop()
  }
}
