package graft.wcd

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A9 bootstrap: the static property/item catalogs the reference seeds
  * into a fresh Wikibase (SetupNewWikibase.setup_properties/setup_items,
  * setup_all_properties_and_items_on_new_wikibase.py:43-270; dicts
  * src/models/wikibase/dictionaries.py:9-124). In the Spark engine these
  * are plain seed dimension tables — created once, broadcast everywhere.
  */
object Dims {

  /** (property, datatype) — every property the claims table can carry,
    * with its Wikibase datatype (dictionaries.py:33-124). */
  val Properties: Seq[(String, String)] = {
    val externalId = Seq("DOI", "GOOGLE_BOOKS_ID", "INTERNET_ARCHIVE_ID",
      "ISBN_10", "ISBN_13", "MEDIAWIKI_PAGE_ID", "OCLC_CONTROL_NUMBER",
      "ORCID", "PMID", "WIKIDATA_QID").map(_ -> "external-id")
    val item = Seq("ARCHIVE", "AUTHOR", "CITATIONS", "EDITOR", "INSTANCE_OF",
      "PUBLISHED_IN", "SOURCE_WIKIPEDIA", "WEBSITE").map(_ -> "wikibase-item")
    val quantity = Seq("SERIES_ORDINAL").map(_ -> "quantity")
    val string = Seq("EDITOR_NAME_STRING", "FAMILY_NAME",
      "FIRST_LEVEL_DOMAIN_STRING", "FULL_NAME_STRING", "GIVEN_NAME", "HASH",
      "HOST_STRING", "INTERVIEWER_STRING", "ISSUE", "LOCATION_STRING",
      "LUMPED_AUTHORS", "NAME_MASK", "PAGES", "PAGE_REVISION_ID",
      "PERIODICAL_STRING", "PUBLISHER_STRING", "STRING_CITATIONS",
      "TEMPLATE_NAME", "TITLE", "TRANSLATOR_NAME_STRING", "VOLUME",
      "WEBSITE_STRING").map(_ -> "string")
    val url = Seq("ARCHIVE_URL", "CHAPTER_URL", "CONFERENCE_URL",
      "FULL_WORK_AVAILABLE_AT_URL", "LAY_URL", "TRANSCRIPT_URL", "URL")
      .map(_ -> "url")
    val time = Seq("ACCESS_DATE", "ARCHIVE_DATE", "LAST_UPDATE",
      "PUBLICATION_DATE", "RETRIEVED_DATE").map(_ -> "time")
    externalId ++ item ++ quantity ++ string ++ url ++ time
  }

  /** (item, label, kind) — semantic base items + archive-org items
    * (dictionaries.py:9-30; ARCHIVE_PH folded into ARCHIVE_IS there by
    * enum aliasing — we keep the evident intent of distinct items). */
  val KnownItems: Seq[(String, String, String)] = Seq(
    ("ARCHIVE_IS", "Archive.is", "web archive"),
    ("ARCHIVE_ORG", "Archive.org", "web archive"),
    ("ARCHIVE_TODAY", "Archive.today", "web archive"),
    ("GHOSTARCHIVE_ORG", "Ghostarchive.org", "web archive"),
    ("WEBCITATION_ORG", "Webcitation.org", "web archive"),
    ("ENGLISH_WIKIPEDIA", "English Wikipedia", "base"),
    ("WEBSITE_ITEM", "Website", "base"),
    ("WIKIPEDIA_PAGE", "Wikipedia page", "base"),
    ("WIKIPEDIA_REFERENCE", "Wikipedia reference", "base"))

  def properties(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Properties.toDF("property", "datatype")
  }

  def knownItems(spark: SparkSession): DataFrame = {
    import spark.implicits._
    KnownItems.toDF("item", "label", "kind")
  }
}
