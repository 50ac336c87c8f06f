package graft.expr

import org.apache.spark.sql.graftshim.PslUtil
import org.scalatest.funsuite.AnyFunSuite

/** F11 against the full public-suffix list: the multi-label, wildcard,
  * exception and private-section cases the round-1 heuristic missed
  * (reference behavior: tld.get_fld, wikipedia_page_reference.py:695-714). */
class PslSpec extends AnyFunSuite {

  test("plain TLDs") {
    assert(PslUtil.fld("www.stereogum.com") == "stereogum.com")
    assert(PslUtil.fld("chkchkchk.net") == "chkchkchk.net")
    assert(PslUtil.fld("deep.sub.domain.example.org") == "example.org")
  }

  test("multi-label public suffixes the heuristic split wrong") {
    assert(PslUtil.fld("www.bbc.co.uk") == "bbc.co.uk")
    assert(PslUtil.fld("ahram.org.eg") == "ahram.org.eg")
    assert(PslUtil.fld("sub.site.com.eg") == "site.com.eg")
    assert(PslUtil.fld("bbc.gov.scot") == "bbc.gov.scot")
    assert(PslUtil.fld("news.walla.co.il") == "walla.co.il")
    assert(PslUtil.fld("www.kmk.a.se") == "kmk.a.se")
    assert(PslUtil.fld("city.nagoya.jp") == "city.nagoya.jp")
  }

  test("wildcard rules (*.kh etc.): one extra label is part of the suffix") {
    // *.kh is a wildcard rule: foo.kh is a public suffix itself
    assert(PslUtil.fld("foo.kh") == null)
    assert(PslUtil.fld("www.foo.kh") == "www.foo.kh")
  }

  test("exception rules beat their wildcard") {
    // !city.kawasaki.jp carves city.kawasaki.jp out of *.kawasaki.jp
    assert(PslUtil.fld("metro.city.kawasaki.jp") == "city.kawasaki.jp")
    assert(PslUtil.fld("city.kawasaki.jp") == "city.kawasaki.jp")
    // non-excepted sibling stays under the wildcard
    assert(PslUtil.fld("a.b.kawasaki.jp") == "a.b.kawasaki.jp")
  }

  test("private-section suffixes count (tld.get_fld default)") {
    assert(PslUtil.fld("someone.blogspot.com") == "someone.blogspot.com")
    assert(PslUtil.fld("app.github.io") == "app.github.io")
  }

  test("host that IS a public suffix, unlisted TLD, malformed → null") {
    assert(PslUtil.fld("co.uk") == null)
    assert(PslUtil.fld("com") == null)
    assert(PslUtil.fld("host.invalidtldzz") == null)
    assert(PslUtil.fld("192.168.0.1") == null)
    assert(PslUtil.fld("") == null)
    assert(PslUtil.fld("a..b.com") == null)
    assert(PslUtil.fld(null) == null)
  }

  test("trailing dot and case are normalized inside the resolver") {
    assert(PslUtil.fld("example.com.") == "example.com")
    assert(PslUtil.fld("WWW.BBC.CO.UK") == "bbc.co.uk")
  }

  test("punycode variants of unicode rules resolve") {
    // рф → xn--p1ai; the PSL lists the unicode form, we index both
    assert(PslUtil.fld("example.xn--p1ai") == "example.xn--p1ai")
    assert(PslUtil.fld("sub.example.xn--p1ai") == "example.xn--p1ai")
  }

  test("web.archive.org fallback (reference TldBadUrl branch)") {
    assert(PslUtil.fld("web.archive.org") == "archive.org")
    assert(PslUtil.fld("wayback.archive.org") == "archive.org")
  }
}

/** The SQL surface of the PSL expression (temp-function registration,
  * same path GraftSparkExtensions injects on a cluster). */
class PslSqlSpec extends graft.SparkSpec {
  test("first_level_domain is callable from SQL") {
    org.apache.spark.sql.graftshim.SqlFunctions.register(spark)
    val rows = spark.sql(
      """SELECT first_level_domain(h) AS fld FROM VALUES
        |  ('www.bbc.co.uk'), ('host.invalidtldzz'), ('sub.x.com.eg') t(h)""".stripMargin)
      .collect().map(r => Option(r.getString(0)).orNull)
    assert(rows.toSeq == Seq("bbc.co.uk", null, "x.com.eg"))
  }
}
