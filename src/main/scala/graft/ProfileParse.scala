package graft
import org.apache.spark.sql.SparkSession
/** Dev scratch main: smoke the driver entry + ad-hoc profiling. */
object ProfileParse {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows: $rows")
    spark.stop()
  }
}
