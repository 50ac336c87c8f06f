package graft.parse

import org.scalatest.funsuite.AnyFunSuite
import WikiTemplateParser.{extract, removeComments, Template}

/** Golden fixtures lifted from the reference's unit tests
  * (`tests/test_template_extraction.py:10-87`) plus grammar edge cases
  * pinned by mwparserfromhell/MediaWiki semantics (FIXTURES.md §2). */
class WikiTemplateParserSpec extends AnyFunSuite {

  test("comment stripping inside a template param (reference :11-24)") {
    val data =
      "{{url|1=https://books.google.com/books?id=28tmAAAAMAAJ&pg=PR7 <!--|alternate-full-text-url=" +
        "https://babel.hathitrust.org/cgi/pt?id=mdp.39015027915100&view=1up&seq=11 -->}}"
    assert(extract(data) == List(
      Template("url", Vector("1" -> "https://books.google.com/books?id=28tmAAAAMAAJ&pg=PR7"))))
  }

  test("remove_comments (reference :26-36)") {
    val text =
      "https://books.google.com/books?id=28tmAAAAMAAJ&pg=PR7 <!--|alternate-full-text-url=" +
        "https://babel.hathitrust.org/cgi/pt?id=mdp.39015027915100&view=1up&seq=11 -->"
    assert(removeComments(text) == "https://books.google.com/books?id=28tmAAAAMAAJ&pg=PR7")
  }

  test("13-param cite book with embedded comment (reference :37-86)") {
    val data =
      "{{cite book |last=von Mach |first=Edmund |author-link=Edmund von Mach " +
        "|title=Official Diplomatic Documents Relating to the Outbreak of the European War: " +
        "With Photographic Reproductions of Official Editions of the Documents " +
        "(Blue, White, Yellow, Etc., Books) |url=https://books.google.com/books?id=28tmAAAAMAAJ&pg=PR7 " +
        "<!--|alternate-full-text-url=" +
        "https://babel.hathitrust.org/cgi/pt?id=mdp.39015027915100&view=1up&seq=11 --> " +
        "|year=1916 |publisher=Macmillan |page=7 |location=New York |oclc=651023684 " +
        "|lccn=16019222 |access-date=2020-12-03 |archive-date=2021-07-23 " +
        "|archive-url=https://web.archive.org/web/20210723163014/" +
        "https://books.google.com/books?id=28tmAAAAMAAJ&pg=PR7 |url-status=live }}"
    val expected = Template("cite book", Vector(
      "last" -> "von Mach",
      "first" -> "Edmund",
      "author-link" -> "Edmund von Mach",
      "title" -> ("Official Diplomatic Documents Relating to the Outbreak of the European War: " +
        "With Photographic Reproductions of Official Editions of the Documents (Blue, White, Yellow, Etc., Books)"),
      "url" -> "https://books.google.com/books?id=28tmAAAAMAAJ&pg=PR7",
      "year" -> "1916",
      "publisher" -> "Macmillan",
      "page" -> "7",
      "location" -> "New York",
      "oclc" -> "651023684",
      "lccn" -> "16019222",
      "access-date" -> "2020-12-03",
      "archive-date" -> "2021-07-23",
      "archive-url" -> "https://web.archive.org/web/20210723163014/https://books.google.com/books?id=28tmAAAAMAAJ&pg=PR7",
      "url-status" -> "live"))
    assert(extract(data) == List(expected))
  }

  test("positional params are numbered among unnamed only") {
    assert(extract("{{a| foo | 2 = bar | baz }}") ==
      List(Template("a", Vector("1" -> "foo", "2" -> "baz"))))
  }

  test("duplicate key keeps first position, last value") {
    assert(extract("{{a|x=1|y=2|x=3}}") ==
      List(Template("a", Vector("x" -> "3", "y" -> "2"))))
  }

  test("nested template returned after outer, value kept raw") {
    val got = extract("{{cite web|url={{google books |plainurl=y |id=CDJpAAAAMAAJ}}|title=T}}")
    assert(got.map(_.name) == List("cite web", "google books"))
    assert(got.head.paramMap("url") == "{{google books |plainurl=y |id=CDJpAAAAMAAJ}}")
    assert(got(1).paramMap == Map("plainurl" -> "y", "id" -> "CDJpAAAAMAAJ"))
  }

  test("parser functions skipped, nested templates inside still found") {
    val got = extract("{{#if:x|{{cite web|title=T}}|y}}")
    assert(got == List(Template("cite web", Vector("title" -> "T"))))
  }

  test("pipe inside wikilink does not split params") {
    val got = extract("{{cite web|url=[[:sq:Shkrime|Shkrime]]|title=T}}")
    assert(got.head.paramMap("url") == "[[:sq:Shkrime|Shkrime]]")
  }

  test("bare = in a positional value makes it a named param (MediaWiki quirk)") {
    assert(extract("{{url|https://a.example?b=c}}") ==
      List(Template("url", Vector("https://a.example?b" -> "c"))))
    assert(extract("{{url|chkchkchk.net}}") ==
      List(Template("url", Vector("1" -> "chkchkchk.net"))))
  }

  test("multiple templates in document order; unclosed braces ignored") {
    val got = extract("text {{a|1}} more {{b|k=v}} {{unclosed")
    assert(got.map(_.name) == List("a", "b"))
  }

  test("degenerate inputs never throw") {
    assert(extract("") == Nil)
    assert(extract(null) == Nil)
    assert(extract("{}{{}}{{{x}}}") == List(Template("", Vector())))
    assert(extract("no templates here") == Nil)
  }
}
