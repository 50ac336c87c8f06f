package graft.parse

import scala.collection.mutable

/** Recursive wikitext `{{template}}` extractor — the engine's one true
  * table-generating function (SURVEY.md §2.B F1/F2).
  *
  * Re-implements the *observable* behavior of the reference's template
  * extraction (`src/helpers/template_extraction.py:40-116`, a thin wrapper
  * over the public mwparserfromhell grammar) without porting its code:
  *
  *   - templates are returned in document order, outer before nested;
  *   - parser functions (`{{#if:...}}`) are skipped, but templates nested
  *     inside them are still returned;
  *   - unnamed parameters are keyed "1","2",... by position among the
  *     unnamed parameters; a duplicate key keeps its first position but
  *     takes the last value (MediaWiki semantics);
  *   - `|` and `=` inside nested `{{...}}` or `[[wikilinks]]` do not split
  *     parameters — but a bare `=` in a positional value does (real
  *     MediaWiki behavior: `{{url|https://a?b=c}}` is a *named* param);
  *   - HTML comments `<!-- ... -->` are removed and keys/values trimmed
  *     (`template_extraction.py:19-37`).
  *
  * Pure function over a string: used via `flatMap` on `Dataset[Page]` or
  * the UDF in [[TemplateFunctions]]; embarrassingly parallel, no state,
  * no shuffle — the parse stage scales linearly with input partitions.
  */
object WikiTemplateParser {

  /** One extracted template: trimmed name + parameters in document order
    * (duplicate keys already folded, last value wins). */
  final case class Template(name: String, params: Vector[(String, String)]) {
    def paramMap: Map[String, String] = params.toMap
    def apply(key: String): Option[String] = params.collectFirst { case (`key`, v) => v }
  }

  private val CommentRe = "(?s)<!--.*?-->".r

  /** Public comment-removal helper, mirroring the reference's
    * `remove_comments` (strip included). */
  def removeComments(text: String): String = stripComments(text).trim

  private def stripComments(text: String): String =
    if (text.indexOf("<!--") < 0) text else CommentRe.replaceAllIn(text, "")

  /** Extract every template in `text`, document order, nested included. */
  def extract(text: String): List[Template] = {
    if (text == null || text.isEmpty) return Nil
    val s = stripComments(text)
    val out = mutable.ListBuffer.empty[Template]
    scan(s, 0, s.length, out)
    out.toList
  }

  /** Scan a region for `{{` openings; emit each template then recurse into
    * its content (pre-order = document order). */
  private def scan(s: String, from: Int, until: Int, out: mutable.ListBuffer[Template]): Unit = {
    var i = from
    while (i < until - 1) {
      if (s.charAt(i) == '{' && s.charAt(i + 1) == '{') {
        var run = 2
        while (i + run < until && s.charAt(i + run) == '{') run += 1
        if (run > 2) {
          // `{{{...}}}` template-argument syntax — not a template; skip the
          // brace run and keep scanning inside.
          i += run
        } else {
          val close = findMatching(s, i + 2, until)
          if (close < 0) {
            i += 2 // unclosed — treat as text
          } else {
            emit(s, i + 2, close, out)
            i = close + 2
          }
        }
      } else i += 1
    }
  }

  /** Index of the `}}` closing a template whose content starts at `from`,
    * or -1. Tracks nested `{{`/`}}` pairs. */
  private def findMatching(s: String, from: Int, until: Int): Int = {
    var i = from
    var depth = 0
    while (i < until - 1) {
      val c = s.charAt(i)
      if (c == '{' && s.charAt(i + 1) == '{') { depth += 1; i += 2 }
      else if (c == '}' && s.charAt(i + 1) == '}') {
        if (depth == 0) return i
        depth -= 1; i += 2
      } else i += 1
    }
    -1
  }

  /** Build a Template from content `s[from, until)` and emit it (unless a
    * parser function), then scan the same region for nested templates. */
  private def emit(s: String, from: Int, until: Int, out: mutable.ListBuffer[Template]): Unit = {
    val segments = splitTopLevel(s, from, until)
    val name = segments.head.trim
    if (!name.startsWith("#")) {
      val params = mutable.LinkedHashMap.empty[String, String]
      var positional = 0
      segments.tail.foreach { seg =>
        val eq = topLevelEquals(seg)
        if (eq >= 0) {
          params.put(seg.substring(0, eq).trim, seg.substring(eq + 1).trim)
        } else {
          positional += 1
          params.put(positional.toString, seg.trim)
        }
      }
      out += Template(name, params.toVector)
    }
    scan(s, from, until, out) // nested templates, parser functions included
  }

  /** Split content on `|` at depth 0 w.r.t. `{{ }}` and `[[ ]]`. */
  private def splitTopLevel(s: String, from: Int, until: Int): Vector[String] = {
    val parts = Vector.newBuilder[String]
    var start = from
    var i = from
    var braces = 0
    var brackets = 0
    while (i < until) {
      val c = s.charAt(i)
      if (c == '{' && i + 1 < until && s.charAt(i + 1) == '{') { braces += 1; i += 2 }
      else if (c == '}' && i + 1 < until && s.charAt(i + 1) == '}' && braces > 0) { braces -= 1; i += 2 }
      else if (c == '[' && i + 1 < until && s.charAt(i + 1) == '[') { brackets += 1; i += 2 }
      else if (c == ']' && i + 1 < until && s.charAt(i + 1) == ']' && brackets > 0) { brackets -= 1; i += 2 }
      else if (c == '|' && braces == 0 && brackets == 0) {
        parts += s.substring(start, i)
        start = i + 1
        i += 1
      } else i += 1
    }
    parts += s.substring(start, until)
    parts.result()
  }

  /** First `=` at depth 0 in a parameter segment, or -1. */
  private def topLevelEquals(seg: String): Int = {
    var i = 0
    var braces = 0
    var brackets = 0
    val n = seg.length
    while (i < n) {
      val c = seg.charAt(i)
      if (c == '{' && i + 1 < n && seg.charAt(i + 1) == '{') { braces += 1; i += 2 }
      else if (c == '}' && i + 1 < n && seg.charAt(i + 1) == '}' && braces > 0) { braces -= 1; i += 2 }
      else if (c == '[' && i + 1 < n && seg.charAt(i + 1) == '[') { brackets += 1; i += 2 }
      else if (c == ']' && i + 1 < n && seg.charAt(i + 1) == ']' && brackets > 0) { brackets -= 1; i += 2 }
      else if (c == '=' && braces == 0 && brackets == 0) return i
      else i += 1
    }
    -1
  }
}
