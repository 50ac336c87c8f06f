package graft.expr

import graft.SparkSpec

/** The SQL function surface: custom expressions and the template UDTF
  * callable from spark.sql after registration. */
class SqlSurfaceSpec extends SparkSpec {

  test("dot_product_f and winnow_fp work from SQL") {
    org.apache.spark.sql.graftshim.SqlFunctions.register(spark)
    val r = spark.sql(
      """SELECT dot_product_f(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                     array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS dot,
        |       winnow_fp('abc', 20) AS fp""".stripMargin).head()
    assert(r.getDouble(0) == 1.5 * 2.0 + 2.0 * 3.0)
    val expected = java.lang.Long.parseLong(md5hex("abc").take(15), 16)
    assert(r.getLong(1) == expected)
  }

  test("minhash_sigs_f works from SQL (k minima over word trigrams)") {
    org.apache.spark.sql.graftshim.SqlFunctions.register(spark)
    val r = spark.sql("SELECT minhash_sigs_f('a b c d', 2) AS sigs").head()
    val sigs = r.getSeq[Long](0)
    // two trigram shingles: "a b c", "b c d"; sig_i = min over both of
    // hx("i:" + shingle)
    def hx(s: String) = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    assert(sigs == Seq(
      math.min(hx("0:a b c"), hx("0:b c d")),
      math.min(hx("1:a b c"), hx("1:b c d"))))
    // sub-trigram text → null (the batch pipeline drops those docs)
    assert(spark.sql("SELECT minhash_sigs_f('a b', 2) AS s").head().isNullAt(0))
  }

  test("simhash_f and shot_count_f work from SQL") {
    org.apache.spark.sql.graftshim.SqlFunctions.register(spark)
    def hx(s: String) = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    val r = spark.sql(
      "SELECT simhash_f('a b a', 48) AS sig, shot_count_f('aaaa', 2, 12) AS shots")
      .head()
    // votes: bit i gets +1 per set occurrence, -1 otherwise — 'a' twice,
    // 'b' once, so bit i is set iff 2·bit_a(i) + bit_b(i) − 3 > 0, i.e.
    // iff hx("a") has bit i set
    val expected = hx("a") & ((1L << 48) - 1)
    assert(r.getLong(0) == expected)
    // uniform payload: every frame level equal → one single shot
    assert(r.getLong(1) == 1L)
  }

  test("extract_templates drives LATERAL VIEW from SQL") {
    import spark.implicits._
    graft.parse.TemplateFunctions.register(spark)
    Seq(("{{cite web|url=https://x.org}}{{cite book|isbn=1}}"))
      .toDF("wikitext").createOrReplaceTempView("sql_surface_pages")
    val names = spark.sql(
      """SELECT t.name FROM sql_surface_pages
        |LATERAL VIEW explode(extract_templates(wikitext)) e AS t
        |ORDER BY t.name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("cite book", "cite web"))
  }
}
