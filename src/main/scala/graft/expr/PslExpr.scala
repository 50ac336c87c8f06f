/* Lives in the graftshim sql package for the same reason as
 * ColumnBridge: custom Catalyst expressions extend private[sql]
 * supertypes in Spark 4. */
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F11: first-level (registered) domain via the full Mozilla Public
  * Suffix List — the same public dataset the reference consumes through
  * `tld.get_fld` (wikipedia_page_reference.py:695-714). The list ships
  * as a bundled resource (public data, MPL-2.0, from the distro's
  * `publicsuffix` package == publicsuffix.org) and is loaded once per
  * executor JVM — nothing is serialized into tasks.
  *
  * Matching follows the PSL algorithm: among all rules whose labels
  * match a suffix of the host, an exception rule prevails, else the
  * longest rule; wildcard `*.X` matches exactly one extra label. Like
  * `tld.get_fld` (and unlike the spec's implicit-`*` rule) a host whose
  * TLD is absent from the list yields NULL — the reference treats those
  * URLs as unresolvable. Unicode rules are additionally indexed in
  * punycode so both host encodings resolve.
  */
object PslUtil {

  private val (exceptions, wildcards, normals): (
      java.util.HashSet[String], java.util.HashSet[String], java.util.HashSet[String]) = {
    val ex = new java.util.HashSet[String](64)
    val wc = new java.util.HashSet[String](2048)
    val nm = new java.util.HashSet[String](16384)
    val in = getClass.getResourceAsStream("/public_suffix_list.dat")
    require(in != null, "public_suffix_list.dat resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      for (raw <- src.getLines()) {
        val line = raw.trim.toLowerCase(java.util.Locale.ROOT)
        if (line.nonEmpty && !line.startsWith("//")) {
          def addWithPunycode(set: java.util.HashSet[String], rule: String): Unit = {
            set.add(rule)
            try {
              val ascii = java.net.IDN.toASCII(rule)
              if (ascii != rule) set.add(ascii)
            } catch { case _: IllegalArgumentException => () }
          }
          if (line.startsWith("!")) addWithPunycode(ex, line.substring(1))
          else if (line.startsWith("*.")) addWithPunycode(wc, line.substring(2))
          else addWithPunycode(nm, line)
        }
      }
    } finally src.close()
    (ex, wc, nm)
  }

  private def join(labels: Array[String], from: Int): String = {
    val sb = new java.lang.StringBuilder
    var i = from
    while (i < labels.length) {
      if (i > from) sb.append('.')
      sb.append(labels(i))
      i += 1
    }
    sb.toString
  }

  /** Registered domain of a host (case-normalized here, so the SQL
    * surface behaves the same as the Column wrapper), or null when the
    * host is malformed, is itself a public suffix, or has an unlisted
    * TLD. */
  def fld(host: String): String = {
    if (host == null) return null
    // Locale.ROOT: a Turkish default locale would map 'I' to dotless 'ı'
    // and silently break every rule lookup containing an i
    val lower = host.toLowerCase(java.util.Locale.ROOT)
    val h = if (lower.nonEmpty && lower.charAt(lower.length - 1) == '.')
      lower.substring(0, lower.length - 1) else lower
    if (h.isEmpty) return null
    // the reference's TldBadUrl fallback for archive-wrapper URLs
    if (h == "web.archive.org" || h.endsWith(".archive.org")) return "archive.org"
    val labels = h.split('.')
    val n = labels.length
    var i = 0
    while (i < n) {
      if (labels(i).isEmpty) return null
      val cand = join(labels, i)
      if (exceptions.contains(cand)) {
        // exception prevails: its own match IS the registrable domain
        return cand
      }
      val psLen =
        if (i + 1 < n && wildcards.contains(join(labels, i + 1))) n - i
        else if (normals.contains(cand)) n - i
        else -1
      if (psLen >= 0) {
        return if (psLen >= n) null else join(labels, n - psLen - 1)
      }
      i += 1
    }
    null // unlisted TLD — tld.get_fld raises, the reference records None
  }

  /** Codegen entry point. */
  def fldUtf8(host: UTF8String): UTF8String = {
    val r = fld(host.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
}

/** Native expression wrapping [[PslUtil.fld]]: stays inside whole-stage
  * codegen (no ScalaUDF row conversion) on the hot parse path. */
case class FirstLevelDomain(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "first_level_domain"

  override protected def nullSafeEval(input: Any): Any =
    PslUtil.fldUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("fld")
      s"""
         |UTF8String $r = org.apache.spark.sql.graftshim.PslUtil.fldUtf8($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FirstLevelDomain =
    copy(child = newChild)
}
