package graft.wcd

/** The citation-reference schema catalog: every template parameter the
  * reference's strict loader accepts, the key-normalization map, and the
  * supported-template list (SURVEY.md §2.B F3/F4/F5).
  *
  * Sources (into /root/reference/):
  *   - allowed keys: marshmallow schema `WikipediaPageReferenceSchema`
  *     (wikipedia_page_reference.py:1186-1501) — "1"/"2" positional
  *     aliases + template_name + the Meta.additional list;
  *   - alias renames + class + dash fixes: wikipedia_page.py:246-301;
  *   - supported templates: config.py.sample:22-54. That list contains an
  *     implicit-string-concatenation bug producing the bogus entry
  *     `"cite mailing listcite map"`; we implement the evident intent
  *     (both `cite mailing list` and `cite map` supported) — divergence
  *     noted in tests.
  */
object ReferenceSchema {

  /** config.py.sample:22-54, with the concatenation bug fixed. */
  val SupportedTemplates: Seq[String] = Seq(
    "citation", "cite q", "citeq", "isbn", "url",
    "cite arxiv", "cite av media notes", "cite av media", "cite biorxiv",
    "cite book", "cite cite seerx", "cite conference", "cite encyclopedia",
    "cite episode", "cite interview", "cite journal", "cite magazine",
    "cite mailing list", "cite map", "cite news", "cite newsgroup",
    "cite podcast", "cite press release", "cite report", "cite serial",
    "cite sign", "cite speech", "cite ssrn", "cite techreport",
    "cite thesis", "cite web")

  /** F4 alias fold (wikipedia_page.py:258-284). Applied after the
    * class-key fix and before dash→underscore. */
  val AliasRenames: Map[String, String] = Map(
    "accessdate" -> "access_date",
    "archiveurl" -> "archive_url",
    "archivedate" -> "archive_date",
    "ISBN" -> "isbn",
    "authorlink1" -> "author_link1",
    "authorlink2" -> "author_link2",
    "authorlink3" -> "author_link3",
    "authorlink4" -> "author_link4",
    "authorlink5" -> "author_link5",
    "authorlink" -> "author_link")

  /** F4 composed key fix: class→news_class, alias fold, dash→underscore
    * (wikipedia_page.py:297-301, same order). */
  def fixKey(k: String): String = {
    val k1 = if (k == "class") "news_class" else k
    val k2 = AliasRenames.getOrElse(k1, k1)
    k2.replace("-", "_")
  }

  /** Positional-parameter storage names ("1" → first_parameter, "2" →
    * second_parameter, wikipedia_page_reference.py:1191-1192). */
  val PositionalNames: Map[String, String] =
    Map("1" -> "first_parameter", "2" -> "second_parameter")

  /** Every allowed (post-fix) template parameter name — the strict-load
    * whitelist, verbatim from the marshmallow `Meta.additional` list
    * (wikipedia_page_reference.py:1195-1501; 299 names). An unknown key
    * rejects the whole reference (F5, wikipedia_page.py:431-444). */
  val ParamFields: Seq[String] = Seq(
    "df", "magazine", "newspaper", "author1", "author2", "author3",
    "author4", "author5", "author6", "author7", "author8", "author9",
    "author10", "editor1", "editor2", "editor3", "editor4", "editor5",
    "editor6", "editor7", "editor8", "editor9", "editor10", "number",
    "first7", "first8", "first9", "first10", "first11", "first12",
    "first13", "first14", "last7", "last8", "last9", "last10", "last11",
    "last12", "last13", "last14", "message_id", "newsgroup",
    "archive_format", "time", "interviewer", "medium", "contribution",
    "author1_first", "author1_last", "author1_link", "author2_first",
    "author2_last", "author2_link", "author3_first", "author3_last",
    "author3_link", "author4_first", "author4_last", "author4_link",
    "author5_first", "author5_last", "author5_link", "vauthors", "authors",
    "place", "lang", "periodical", "access_date", "archive_date", "date",
    "doi_broken_date", "orig_date", "orig_year", "pmc_embargo_date",
    "publication_date", "first1", "first2", "first3", "first4", "first5",
    "first6", "first", "last1", "last2", "last3", "last4", "last5",
    "last6", "last", "author_given", "author_given1", "author_given2",
    "author_given3", "author_given4", "author_given5", "author_first",
    "author_first1", "author_first2", "author_first3", "author_first4",
    "author_first5", "author_surname", "author_surname1",
    "author_surname2", "author_surname3", "author_surname4",
    "author_surname5", "author_last", "author_last1", "author_last2",
    "author_last3", "author_last4", "author_last5", "author",
    "author_link1", "author_link2", "author_link3", "author_link4",
    "author_link5", "author_link", "author_mask1", "author_mask2",
    "author_mask3", "author_mask4", "author_mask5", "author_mask",
    "editor1_first", "editor1_last", "editor1_link", "editor2_first",
    "editor2_last", "editor2_link", "editor3_first", "editor3_last",
    "editor3_link", "editor4_first", "editor4_last", "editor4_link",
    "editor5_first", "editor5_last", "editor5_link", "editor",
    "editor_first1", "editor_first2", "editor_first3", "editor_first4",
    "editor_first5", "editor_first", "editor_last1", "editor_last2",
    "editor_last3", "editor_last4", "editor_last5", "editor_last",
    "editor_link1", "editor_link2", "editor_link3", "editor_link4",
    "editor_link5", "editor_link", "editor_mask1", "editor_mask2",
    "editor_mask3", "editor_mask4", "editor_mask5", "editor_mask",
    "translator_first1", "translator_first2", "translator_first3",
    "translator_first4", "translator_first5", "translator_first",
    "translator_last1", "translator_last2", "translator_last3",
    "translator_last4", "translator_last5", "translator_last",
    "translator_link1", "translator_link2", "translator_link3",
    "translator_link4", "translator_link5", "translator_link",
    "translator_mask1", "translator_mask2", "translator_mask3",
    "translator_mask4", "translator_mask5", "translator_mask",
    "interviewer_given", "interviewer_first", "interviewer_surname",
    "interviewer_last", "host", "host1", "host2", "host3", "host4",
    "host5", "display_authors", "display_editors", "display_translators",
    "display_subjects", "agency", "archive_url", "arxiv", "asin",
    "asin_tld", "at", "bibcode", "bibcode_access", "biorxiv", "book_title",
    "chapter", "chapter_format", "chapter_url", "chapter_url_access",
    "citeseerx", "news_class", "conference", "conference_url", "degree",
    "department", "doi", "doi_access", "edition", "eissn", "encyclopedia",
    "eprint", "format", "hdl", "hdl_access", "id", "isbn", "ismn", "issn",
    "issue", "jfm", "journal", "jstor", "jstor_access", "language", "lccn",
    "location", "mode", "mr", "name_list_style", "no_pp", "oclc", "ol",
    "ol_access", "osti", "osti_access", "others", "page", "pages", "pmc",
    "pmid", "postscript", "publication_place", "publisher", "quote",
    "quote_page", "quote_pages", "ref", "registration", "rfc", "s2cid",
    "s2cid_access", "sbn", "script_chapter", "script_quote",
    "script_title", "series", "ssrn", "subject", "subject_mask",
    "subscription", "title", "title_link", "trans_chapter", "trans_quote",
    "trans_title", "type", "url", "url_access", "url_status", "via",
    "volume", "website", "work", "year", "zbl", "lay_date", "lay_format",
    "lay_source", "lay_url", "transcripturl").distinct

  /** Allowed keys as they appear in the fixed params map (positional keys
    * still "1"/"2", template_name injected later). */
  val AllowedKeys: Seq[String] = Seq("1", "2") ++ ParamFields

  /** Wide-column name for an allowed key. */
  def columnName(k: String): String = PositionalNames.getOrElse(k, k)

  /** All wide columns the reference record materializes from params. */
  val WideColumns: Seq[String] =
    Seq("first_parameter", "second_parameter") ++ ParamFields

  /** The 10 date-typed params (F7, wikipedia_page_reference.py:1101-1113). */
  val DateFields: Seq[String] = Seq(
    "access_date", "archive_date", "date", "doi_broken_date", "orig_date",
    "orig_year", "pmc_embargo_date", "publication_date", "time", "year")

  /** The 6 URL params normalized by F9 (wikipedia_page_reference.py:1073-1099). */
  val UrlFields: Seq[String] = Seq(
    "url", "archive_url", "lay_url", "chapter_url", "conference_url",
    "transcripturl")
}
