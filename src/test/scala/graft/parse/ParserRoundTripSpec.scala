package graft.parse

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property: rendering a random template structure to wikitext and
  * parsing it back recovers the same (name, params) — the grammar
  * fidelity check from SURVEY §7.5 risk 1. Pure JVM, no Spark. */
class ParserRoundTripSpec extends AnyFunSuite {

  private val ident: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  // values free of template/param metachars (those are covered by the
  // golden nesting tests); may contain spaces and wiki link brackets
  private val value: Gen[String] =
    Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n, ident).map(_.mkString(" ")))

  private val template: Gen[(String, List[(String, String)])] = for {
    name <- ident
    n <- Gen.chooseNum(0, 8)
    keys <- Gen.listOfN(n, ident)
    vals <- Gen.listOfN(n, value)
  } yield (name, keys.distinct.zip(vals))

  test("render→parse round trip over 200 random templates") {
    val docs = Gen.listOfN(200, template).sample.get
    docs.foreach { case (name, params) =>
      val wikitext = "pre {{" + name +
        params.map { case (k, v) => s"|$k=$v" }.mkString + "}} post"
      val parsed = WikiTemplateParser.extract(wikitext)
      assert(parsed.length == 1, s"in: $wikitext")
      assert(parsed.head.name == name)
      val expected = params.map { case (k, v) => k -> v.trim }.toMap
      assert(parsed.head.paramMap == expected, s"in: $wikitext")
    }
  }

  test("parser is total over hostile garbage (never throws)") {
    val garbage = Gen.listOfN(300,
      Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n,
        Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('{', '}', '|', '=', '[', ']', '<', '>', '!', ' ')))
        .map(_.mkString))).sample.get
    garbage.foreach { g =>
      WikiTemplateParser.extract(g) // must not throw
    }
  }
}
