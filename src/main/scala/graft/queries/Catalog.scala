package graft.queries

import graft.QueryDef
import graft.wcd.Dims

/** A9 bootstrap seed tables as oracle-checked queries — the Scala seqs
  * are the single source of truth, generating both the DataFrame and
  * the DuckDB VALUES oracle. */
object Catalog {

  private def sq(s: String) = s"'${s.replace("'", "''")}'"

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "w1_property_catalog",
      s"""SELECT * FROM (VALUES
         |${Dims.Properties.map { case (p, d) => s"  (${sq(p)}, ${sq(d)})" }.mkString(",\n")}
         |) AS t(property, datatype) ORDER BY property""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.functions.col
      Dims.properties(s).orderBy(col("property"))
    },

    QueryDef.sql(
      "w2_known_items",
      s"""SELECT * FROM (VALUES
         |${Dims.KnownItems.map { case (i, l, k) => s"  (${sq(i)}, ${sq(l)}, ${sq(k)})" }.mkString(",\n")}
         |) AS t(item, label, kind) ORDER BY item""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.functions.col
      Dims.knownItems(s).orderBy(col("item"))
    },
  )
}
