package graft.wcd

import graft.expr.RefExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F18: person assembly — the wide numbered name columns folded into
  * per-role `ARRAY<STRUCT>` person lists, as pure Column expressions
  * (no UDF, no shuffle, fully codegen'd; SURVEY.md §2.B F18).
  *
  * Replicates the observable behavior of `__parse_persons__`
  * (wikipedia_page_reference.py:972-1071) and `__get_numbered_person__`
  * (:716-836):
  *
  *   - both attribute shapes are honored, `author_first1` winning over
  *     `author1_first` when both are set (dir() iteration order puts the
  *     underscore shape last, and the reference's loop lets the last
  *     assignment win);
  *   - numbered persons (1..13) require (given AND surname) OR
  *     name_string — the validity guard at :780-790;
  *   - unnumbered known-role persons trigger on the five exact fields
  *     `role`, `role_first`, `role_last`, `role_link`, `role_mask`
  *     (intent; the reference's substring match would also trigger on
  *     e.g. `vauthors`, producing empty persons — divergence documented
  *     in PersonsSpec);
  *   - unnumbered roleless persons come from bare `first`/`last`;
  *   - the reference mislabels numbered non-author persons with
  *     role=author (crud bug, SURVEY §0.1); we assign the list's role.
  */
object Persons {

  /** Person struct columns (model `src/models/person/__init__.py:9-53`).
    * full_name is the F19 derivation; url is the scheme-guarded link. */
  private def personStruct(givenName: Column, surname: Column, nameString: Column,
      link: Column, mask: Column, ordinal: Column, role: String): Column =
    struct(
      givenName.as("given"),
      surname.as("surname"),
      nameString.as("name_string"),
      link.as("link"),
      mask.as("mask"),
      lit(null).cast("string").as("orcid"),
      ordinal.as("number_in_sequence"),
      lit(role).as("role"),
      RefExprs.fullName(nameString, givenName, surname).as("full_name"),
      RefExprs.urlWithScheme(link).as("url"))

  private val nullStr = lit(null).cast("string")

  /** Assemble all six person-list columns onto the wide reference row. */
  def assemble(wide: DataFrame): DataFrame = {
    val have = wide.columns.toSet
    def c(name: String): Column = if (have(name)) col(name) else nullStr

    def knownRole(role: String): Column = {
      val unnumberedFields =
        Seq(role, s"${role}_first", s"${role}_last", s"${role}_link", s"${role}_mask")
      val unnumbered = when(
        unnumberedFields.map(f => c(f).isNotNull).reduce(_ || _),
        personStruct(c(s"${role}_first"), c(s"${role}_last"), c(role),
          c(s"${role}_link"), c(s"${role}_mask"), lit(null).cast("int"), role))
      val numbered = (1 to 13).map { n =>
        val givenName = coalesce(c(s"${role}_first$n"), c(s"${role}${n}_first"))
        val surname = coalesce(c(s"${role}_last$n"), c(s"${role}${n}_last"))
        val nameString = c(s"$role$n")
        val link = coalesce(c(s"${role}_link$n"), c(s"${role}${n}_link"))
        val mask = coalesce(c(s"${role}_mask$n"), c(s"${role}${n}_mask"))
        when((givenName.isNotNull && surname.isNotNull) || nameString.isNotNull,
          personStruct(givenName, surname, nameString, link, mask, lit(n), role))
      }
      filter(array(unnumbered +: numbered: _*), p => p.isNotNull)
    }

    val roleless = {
      val unnumbered = when(c("first").isNotNull || c("last").isNotNull,
        personStruct(c("first"), c("last"), nullStr, nullStr, nullStr,
          lit(null).cast("int"), "unknown"))
      val numbered = (1 to 13).map { n =>
        val givenName = c(s"first$n")
        val surname = c(s"last$n")
        when(givenName.isNotNull && surname.isNotNull,
          personStruct(givenName, surname, nullStr, nullStr, nullStr, lit(n), "unknown"))
      }
      filter(array(unnumbered +: numbered: _*), p => p.isNotNull)
    }

    // single projection — see the planning note in Extract.enrich
    wide.withColumns(Map(
      "authors_list" -> knownRole("author"),
      "editors_list" -> knownRole("editor"),
      "hosts_list" -> knownRole("host"),
      "interviewers_list" -> knownRole("interviewer"),
      "translators_list" -> knownRole("translator"),
      "persons_without_role" -> roleless))
  }
}
