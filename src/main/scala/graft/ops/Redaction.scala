package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction — the scrub pass a training pipeline runs over raw text
  * before anything else sees it: emails, phone numbers, and IPv4
  * addresses are replaced with typed placeholder tags, and per-category
  * match counts are kept for curation reporting.
  *
  * Scale design: pure codegen'd `regexp_replace`/`regexp_count` column
  * expressions — map-only, no shuffle, no UDFs; patterns compile once
  * per expression instance and stream through whole-stage codegen.
  * Patterns deliberately use no lookarounds or lazy quantifiers so the
  * same regex runs identically on backtracking (java.util.regex) and
  * automaton (RE2-family) engines — which also keeps the op
  * oracle-checkable against DuckDB.
  *
  * The reference (SmartX-Team/connected-data-lake) has no curation ops —
  * this extends the engine for training pipelines (SURVEY §2.8).
  */
object Redaction {

  /** Engine-portable PII patterns (no lookarounds, no lazy quantifiers). */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "(\\+[0-9]{1,2}-)?[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern: String = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Number of matches of each category in `text`. */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))

  /** `text` with every email/phone/IPv4 match replaced by its tag.
    * Order matters: emails first (an address can contain digit runs a
    * phone pattern might claim), then IPv4 (dotted digit runs), then
    * phones. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")
}
