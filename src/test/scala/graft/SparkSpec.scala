package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for operator specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.local.dir", {
      val scratch = TempTrees.scratch("graft-spark-scratch")
      TempTrees.deleteOnExit(scratch)
      scratch.resolve("local").toString
    })
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // duplicate template keys fold like a Python dict: last value wins
    .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    .getOrCreate()
}
