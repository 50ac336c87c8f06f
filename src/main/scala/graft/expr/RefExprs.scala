package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference-record expression library (SURVEY.md §2.B/§2.C/§2.H):
  * every normalization/enrichment/hash the reference applies to a parsed
  * citation template, re-expressed as composable Catalyst `Column`
  * functions — no UDFs — so the whole chain stays inside whole-stage
  * codegen and survives predicate pushdown / column pruning.
  *
  * Reference citations (into /root/reference/):
  *   - F6 first-param dispatch   wikipedia_page_reference.py:907-931
  *   - F7 multi-format dates     wikipedia_page_reference.py:1101-1166
  *   - F9 URL scheme guard       wikipedia_page_reference.py:1073-1099
  *   - F10 archive detection     wikipedia_page_reference.py:469-506
  *   - F11 first-level domain    wikipedia_page_reference.py:695-714
  *   - F12 IA id                 wikipedia_page_reference.py:526-538
  *   - F13 Google Books id       wikipedia_page_reference.py:508-524
  *   - F14 ISBN classify         wikipedia_page_reference.py:949-970
  *   - F15 wiki-markup cleanup   wikipedia_page_reference.py:456-467
  *   - F16 alias merges          wikipedia_page_reference.py:887-905
  *   - F20 label truncation      crud/__init__.py:193-200,613-621
  *   - H1–H4 content hashes      wikipedia_page_reference.py:565-693,
  *                               wikipedia_page.py:303-309, google_books.py:47-54
  */
object RefExprs {

  /** Analog of the reference's `wikibase.title` hash-salt/config
    * (config.py.sample; every md5 input is prefixed with it). */
  val WikibaseTitle = "WikiCitations"

  /** Analog of `config.include_url_and_first_parameter_in_hash_algorithm`
    * (config.py.sample:14, default True). */
  val IncludeUrlInHash = true

  // ---------------------------------------------------------------- F7 dates

  private def tt(c: Column, fmt: String): Column = try_to_timestamp(c, lit(fmt))

  /** F7: the 9-format date parser. The reference tries every format and
    * keeps the last success (no break); the formats are semantically
    * disjoint (any input parses to at most one distinct instant), so a
    * first-wins `coalesce` is equivalent. Unparseable → NULL (lenient,
    * `:1163-1166`). The trailing-letter variant ("May 25, 2012a") applies
    * `v[:-1]` to the abbreviated-month format only, mirroring `:1133-1137`. */
  def parseDateMulti(c: Column): Column = coalesce(
    tt(c, "yyyy-MM-dd"),
    tt(c, "MMMM d, yyyy"),
    tt(c, "MMM d, yyyy"),
    tt(c.substr(lit(1), length(c) - 1), "MMM d, yyyy"),
    tt(c, "d MMMM yyyy"),
    tt(c, "d MMM yyyy"),
    tt(c, "MMMM yyyy"),
    tt(c, "MMM yyyy"),
    tt(c, "yyyy"))

  // ----------------------------------------------------------------- F6 / F9

  /** F6: template-dependent meaning of positional parameter "1":
    * `cite q` → wikidata_qid (must start q/Q), `url` → url (must contain
    * `://`), `isbn` → isbn. Returns the named struct of derived columns. */
  def firstParamDispatch(templateName: Column, firstParam: Column): (Column, Column, Column) = {
    val t = lower(templateName)
    val wikidataQid = when(t.isin("cite q", "citeq") && firstParam.rlike("^[qQ]"), firstParam)
    val urlFromFirst = when(t === "url" && firstParam.contains("://"), firstParam)
    val isbnFromFirst = when(t === "isbn", firstParam)
    (wikidataQid, urlFromFirst, isbnFromFirst)
  }

  /** F9: keep a URL only if it carries an explicit scheme — wikilink
    * pseudo-urls like `[[:sq:...]]` become NULL (`:1073-1099`; urlparse
    * round-trip is identity for real URLs). */
  def urlWithScheme(c: Column): Column =
    when(c.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), c)

  // ------------------------------------------------------------- F11/F12/F13

  /** F11: first-level (registered) domain of a URL, resolved against the
    * full Mozilla public-suffix list — same data the reference's
    * `tld.get_fld` uses (`:695-714`), including multi-label suffixes
    * (`co.uk`, `com.eg`, `gov.scot`), wildcard and exception rules, and
    * the `web.archive.org` fallback. NULL when the URL has no parseable
    * host, the host is itself a public suffix, or the TLD is unlisted
    * (the reference records those as unresolvable). See
    * [[org.apache.spark.sql.graftshim.PslUtil]]. */
  def firstLevelDomain(url: Column): Column = {
    import org.apache.spark.sql.graftshim.{ColumnBridge, FirstLevelDomain}
    val host = lower(parse_url(url, lit("HOST")))
    ColumnBridge.toColumn(FirstLevelDomain(ColumnBridge.toExpression(host)))
  }

  /** F12: Internet Archive item id — `/details/<id>` path segment on
    * archive.org URLs (`:526-538`). */
  def internetArchiveId(url: Column, fld: Column): Column =
    when(fld === "archive.org",
      nullif(regexp_extract(parse_url(url, lit("PATH")), "^/details/([^/]+)", 1), lit("")))

  /** F13: Google Books id — `id` query param on books.google.* URLs
    * (`:508-524`). */
  def googleBooksId(url: Column, fld: Column): Column =
    when(fld.contains("google.") && url.contains("books.google."),
      parse_url(url, lit("QUERY"), lit("id")))

  // -------------------------------------------------------------- F10 archives

  /** Known archive services (reference enum `wikibase/enums.py:6-15`;
    * ARCHIVE_PH aliases ARCHIVE_IS's value there — we keep them distinct
    * domains, the evident intent). */
  val KnownArchives = Seq(
    "archive.is", "archive.org", "archive.ph", "archive.today",
    "ghostarchive.org", "mementoweb.org", "webcitation.org")

  /** F10: classify the FLD of an (archive) URL against the known-archive
    * set; NULL = undetected (reference logs these). */
  def detectedArchive(fld: Column): Column =
    when(fld.isin(KnownArchives: _*), fld)

  // ------------------------------------------------------------------ F14 isbn

  /** F14: ISBN normalization — spaces→dashes first (`:957`), then classify
    * by dashless length into (isbn_10, isbn_13). Returns (normalized,
    * isbn10, isbn13). */
  def isbnColumns(isbn: Column): (Column, Column, Column) = {
    val norm = regexp_replace(isbn, " ", "-")
    val bare = regexp_replace(norm, "-", "")
    val isbn10 = when(length(bare) === 10, norm)
    val isbn13 = when(length(bare) === 13, norm)
    (norm, isbn10, isbn13)
  }

  // ------------------------------------------------------------- F15/F16/F20

  /** F15: wiki-markup cleanup, exactly as the reference applies it to
    * `publisher` (`:456-467`): drop `[[`/`]]`, and when a `|` is present
    * keep only the prefix of the whole (bracket-stripped) string. */
  def cleanWikiMarkup(c: Column): Column = {
    val stripped = regexp_replace(c, "\\[\\[|\\]\\]", "")
    when(c.contains("[[") && !c.contains("|"), stripped)
      .when(c.contains("[[") && c.contains("|"), split(stripped, "\\|").getItem(0))
      .otherwise(c)
  }

  /** F16: alias merge — fold `lang` into `language` / `place` into
    * `location` when the target is empty (`:887-905`). Conflict (both set)
    * keeps the target and flags the row for the rejects channel. */
  def aliasMerge(target: Column, alias: Column): Column = coalesce(target, alias)
  def aliasConflict(target: Column, alias: Column): Column =
    target.isNotNull && alias.isNotNull

  /** F20: label truncation to `max` chars on a word boundary with "..."
    * suffix, the observable behavior of `textwrap.shorten`
    * (crud/__init__.py:193-200). Short strings pass through unchanged. */
  def shorten(c: Column, max: Int): Column = {
    val collapsed = regexp_replace(trim(c), "\\s+", " ")
    when(length(collapsed) <= max, collapsed)
      .otherwise(concat(regexp_extract(substring(collapsed, 1, max - 3),
        "^(.*\\S)\\s+\\S*$", 1), lit("...")))
  }

  /** F20 label with hash suffix: `"{title} | {md5[:7]}"` (crud/__init__.py:200). */
  def labelWithHash(title: Column, md5hash: Column): Column =
    concat(shorten(title, 250), lit(" | "), substring(md5hash, 1, 7))

  // ------------------------------------------------------------------- hashes

  private def saltMd5(value: Column): Column =
    md5(concat(lit(WikibaseTitle), lower(regexp_replace(value, " ", ""))))

  /** H1: reference content hash — priority chain doi → pmid →
    * isbn(dash-stripped) → oclc → url → first_parameter (url/first gated
    * by config, and NOT falling through when the gate is off);
    * `md5(title + value.replace(" ","").lower())`; no candidate → NULL. */
  def referenceHash(doi: Column, pmid: Column, isbn: Column, oclc: Column,
      url: Column, firstParam: Column): Column = {
    val candidate =
      when(doi.isNotNull, doi)
        .when(pmid.isNotNull, pmid)
        .when(isbn.isNotNull, regexp_replace(isbn, "-", ""))
        .when(oclc.isNotNull, oclc)
        .when(url.isNotNull, if (IncludeUrlInHash) url else lit(null).cast("string"))
        .when(firstParam.isNotNull, if (IncludeUrlInHash) firstParam else lit(null).cast("string"))
    saltMd5(candidate)
  }

  /** H2: page hash — `md5(title + language_code + page_id)`
    * (wikipedia_page.py:303-309; no space-strip/lowercase there). */
  def pageHash(languageCode: Column, pageId: Column): Column =
    md5(concat(lit(WikibaseTitle), languageCode, pageId.cast("string")))

  /** H3: website hash over the FLD (`:565-571`). */
  def websiteHash(fld: Column): Column = saltMd5(fld)

  /** H4: Google Books hash over the id (google_books.py:47-54). */
  def googleBooksHash(id: Column): Column =
    md5(concat(lit(WikibaseTitle), lower(id)))

  // -------------------------------------------------------------- F19 persons

  /** F19: `full_name` (person/__init__.py:24-40) with Python-truthiness
    * dispatch: a non-empty name_string (even all-whitespace) wins and is
    * stripped; else, if given or surname is non-empty, trim their join;
    * else "". (The reference f-string would render a None given as the
    * literal "None" — we implement the evident intent and skip nulls.) */
  def fullName(nameString: Column, givenName: Column, surname: Column): Column = {
    val truthy = (c: Column) => c.isNotNull && c =!= ""
    when(truthy(nameString), trim(nameString))
      .when(truthy(givenName) || truthy(surname), trim(concat_ws(" ", givenName, surname)))
      .otherwise(lit(""))
  }

  /** F17: the single integer embedded in a string — exactly one number
    * required; zero → NULL; more than one is the caller's error case
    * (reference raises MoreThanOneNumberError), exposed as
    * [[hasMultipleNumbers]] for the rejects channel
    * (wikipedia_page_reference.py:551-563). */
  def numberFromString(s: Column): Column =
    when(size(regexp_extract_all(s, lit("\\d+"), lit(0))) === 1,
      regexp_extract(s, "(\\d+)", 1).cast("int"))
  def hasMultipleNumbers(s: Column): Column =
    size(regexp_extract_all(s, lit("\\d+"), lit(0))) > 1
}
