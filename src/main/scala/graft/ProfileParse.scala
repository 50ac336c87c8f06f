package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileParse {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    println("=== q1_agg plan ===")
    SparkEntry.queries("q1_agg")(spark, dir).explain("formatted")
    println("=== t9 pairs plan ===")
    SparkEntry.queries("t9_embed_top_pairs")(spark, dir).explain("formatted")
    println("=== q2 join plan ===")
    SparkEntry.queries("q2_join_broadcast")(spark, dir).explain("formatted")
    spark.stop()
  }
}
