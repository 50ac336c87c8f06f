package graft.wcd

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Q1–Q6: the read-side query surface the reference served over SPARQL
  * (SURVEY.md §2.E, crud/read.py), as DataFrame queries on the claims
  * table. The ~33 sequential SPARQL round trips of `--statistics` become
  * ONE grouped aggregation job (SURVEY §3.3).
  */
object ReadQueries {

  /** Q1: count items by class. */
  def countByClass(claims: DataFrame, itemClass: String): DataFrame =
    claims.filter(col("property") === "INSTANCE_OF" && col("value_qid") === itemClass)
      .agg(count(lit(1)).as("count"))

  /** Q2: per-property existence counts — the whole statistics report in
    * one shuffle instead of one query per property. */
  def propertyStatistics(claims: DataFrame): DataFrame =
    claims.groupBy(col("property"))
      .agg(countDistinct(col("item_id")).as("n_items"), count(lit(1)).as("n_claims"))

  /** Q1 for all classes at once (pages/references/websites). */
  def classCounts(claims: DataFrame): DataFrame =
    claims.filter(col("property") === "INSTANCE_OF")
      .groupBy(col("value_qid").as("item_class"))
      .agg(count(lit(1)).as("n_items"))

  /** Q3: hash → item point lookup; ≤1 row expected per hash (H7
    * invariant, wikipedia_page.py:152-157). */
  def lookupHash(claims: DataFrame, md5hash: String): DataFrame =
    claims.filter(col("property") === "HASH" && col("value_str") === md5hash)
      .select(col("item_id"), col("item_type"))

  /** Q4: all item ids of a type. */
  def itemsOfClass(claims: DataFrame, itemClass: String): DataFrame =
    claims.filter(col("property") === "INSTANCE_OF" && col("value_qid") === itemClass)
      .select(col("item_id"))

  /** Q5: point item fetch — all claims of one item, regrouped. */
  def fetchItem(claims: DataFrame, itemId: String): DataFrame =
    claims.filter(col("item_id") === itemId)

  /** A7 rinse: delete every item of a class — the anti-join rewrite of
    * the reference's select-then-delete-one-by-one loop
    * (crud/delete.py:18-68; including the evident intent that all three
    * item types are deletable, not the page-twice bug of :63-68). */
  def deleteItemsOfClass(claims: DataFrame, itemClass: String): DataFrame =
    claims.join(itemsOfClass(claims, itemClass), Seq("item_id"), "left_anti")

  /** Q6: per-page reference/hash statistics (wikipedia_page.py:63-84):
    * total refs, hashed refs, integer percent hashed. */
  def pageHashStatistics(refs: DataFrame): DataFrame =
    refs.groupBy(col("page_id"))
      .agg(
        count(lit(1)).as("number_of_references"),
        count(col("md5hash")).as("number_of_hashed_references"))
      .withColumn("percent_hashed",
        (col("number_of_hashed_references") * 100 / col("number_of_references"))
          .cast("int"))
}
