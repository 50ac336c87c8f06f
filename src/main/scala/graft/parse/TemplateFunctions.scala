package graft.parse

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Spark surface for the template extractor: a UDF returning
  * `ARRAY<STRUCT<name:STRING, params:MAP<STRING,STRING>>>`, used with
  * `explode(...)` as the engine's UDTF (SURVEY.md §2.B F1).
  *
  * A plain Scala UDF is the right tool here: the parser is genuinely
  * novel logic (no builtin composes it), runs once per page, and its
  * output feeds a codegen'd expression pipeline. The UDF breaks
  * whole-stage codegen only at the parse boundary, which is the
  * CPU-bound stage anyway.
  */
object TemplateFunctions {

  /** Row-shaped template for DataFrame use. */
  final case class TemplateRow(name: String, params: Map[String, String])

  private val extractFn: String => Seq[TemplateRow] = { text =>
    WikiTemplateParser.extract(text).map(t => TemplateRow(t.name, t.paramMap))
  }

  private val extractUdf = udf(extractFn)

  /** `extract_templates(wikitext)` as a Column. */
  def extractTemplates(wikitext: Column): Column = extractUdf(wikitext)

  /** F1 as a native Catalyst Generator (see
    * [[org.apache.spark.sql.graftshim.ExtractTemplatesGen]]): generates
    * (pos, name, params) rows straight off the UTF8String — one fewer
    * serialization of every parsed template than
    * `posexplode(extractTemplates(...))`. The flagship parse path uses
    * this; the UDF above stays as the SQL-surface fallback. Alias the
    * three generated columns with `.as(Seq(...))`. */
  def extractTemplatesRows(wikitext: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.toColumn(
      org.apache.spark.sql.graftshim.ExtractTemplatesGen(
        org.apache.spark.sql.graftshim.ColumnBridge.toExpression(wikitext)))

  /** Register `extract_templates` for SQL use (`LATERAL VIEW explode(...)`). */
  def register(spark: SparkSession): Unit =
    spark.udf.register("extract_templates", extractFn)
}
