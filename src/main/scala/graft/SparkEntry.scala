package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a [[QueryDef]]
  * in one of the packs below; SQL-expressible ones carry a DuckDB oracle
  * for the driver's hash-compare at sf0.01.
  */
object SparkEntry {

  private def packs: Seq[QueryDef] =
    graft.queries.Relational.defs ++ graft.queries.Citations.defs ++
      graft.queries.TrainingData.defs ++ graft.queries.Pipelines.defs ++
      graft.queries.Catalog.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * c2_top_fld is the reference's headline capability ("overview of most
    * cited websites", README.md): the full parse→normalize→hash→dedup
    * pipeline into a top-domains aggregation. */
  def entry(spark: SparkSession): DataFrame =
    queries("c2_top_fld")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
