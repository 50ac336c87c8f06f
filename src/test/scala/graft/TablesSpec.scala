package graft

import org.apache.spark.sql.types._

/** Footer-drift defense: every table loads through [[Tables]] with its
  * canonical timestamp columns normalized to session-TZ TimestampType,
  * whatever physical encoding the driver generated this round (the
  * round-7 lesson: events.ts flipped nanos-as-INT64 ↔ micros-NTZ and 14
  * queries died before the loader probed the footer). */
class TablesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("every table loads and every canonical timestamp column is TimestampType") {
    for (name <- Tables.all) {
      val df = Tables(spark, sf, name)
      assert(df.limit(1).count() == 1, s"$name: empty or unreadable")
      for (c <- Tables.timestampCols.getOrElse(name, Nil))
        assert(df.schema(c).dataType == TimestampType,
          s"$name.$c: expected TimestampType, got ${df.schema(c).dataType}")
    }
  }

  test("normalizeTsCol adapts all three drift encodings to TimestampType") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // nanos-as-long: 2024-01-02 03:04:05.123456789 UTC
    val nanos = Seq(1704164645123456789L).toDF("ts")
    val fromNanos = Tables.normalizeTsCol(nanos, "ts")
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromNanos.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head().getString(0) == "2024-01-02 03:04:05.123456")
    // micros-NTZ: reinterpreted in the (UTC) session TZ, same wall time
    val ntz = Seq(1).toDF("i")
      .select(expr("TIMESTAMP_NTZ '2024-01-02 03:04:05.123456'").as("ts"))
    val fromNtz = Tables.normalizeTsCol(ntz, "ts")
    assert(fromNtz.schema("ts").dataType == TimestampType)
    assert(fromNtz.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head().getString(0) == "2024-01-02 03:04:05.123456")
    // date32: midnight timestamp
    val dt = Seq(1).toDF("i").select(expr("DATE '2024-01-02'").as("ts"))
    val fromDate = Tables.normalizeTsCol(dt, "ts")
    assert(fromDate.schema("ts").dataType == TimestampType)
    assert(fromDate.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .head().getString(0) == "2024-01-02 00:00:00")
    // a column already TimestampType (and one absent) pass through
    assert(Tables.normalizeTsCol(fromDate, "ts").schema("ts").dataType == TimestampType)
    assert(Tables.normalizeTsCol(fromDate, "nope").columns.toSeq == Seq("ts"))
  }

  test("embeddings landed as array<float> — the vector-kernel type contract") {
    // The native vector kernels (dot_product_f) and every VectorOps
    // micro-unit contract assume FLOAT elements, and the DuckDB oracle
    // reads the SAME file — so a driver regen that flips the element
    // type to double would diverge engine vs oracle on rounding
    // boundaries even if both sides "work". Fail HERE, loudly, instead
    // of as thirty cryptic ANN hash mismatches.
    val dt = Tables(spark, sf, "embeddings").schema("embedding").dataType
    assert(dt == ArrayType(FloatType, containsNull = true) ||
      dt == ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding drifted to $dt — the float micro-unit " +
        "contract (VectorOps/VectorExprs) and its oracles assume FLOAT " +
        "elements; adapt both sides together before trusting ANN results")
  }
}
