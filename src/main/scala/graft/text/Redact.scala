package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass every pretraining pipeline runs
  * before packing: emails, phone numbers, and IPv4 addresses are counted
  * and replaced with typed placeholder tokens. Pure in-scan regexp
  * column expressions (codegen'd, zero shuffles, embarrassingly
  * parallel) — the only correct shape at 100 TB, where redaction rides
  * the same scan as tokenization and never materializes an intermediate
  * corpus. Patterns stay inside the RE2-compatible subset (character
  * classes, bounded repeats, no lookaround) so the DuckDB oracle executes
  * the IDENTICAL expression.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\d{3}[-.]\\d{3}[-.]\\d{4}"
  val Ipv4Re = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  /** Matches of each PII class in `text` (counted on the raw text,
    * before any replacement). */
  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(EmailRe)),
      regexp_count(text, lit(PhoneRe)),
      regexp_count(text, lit(Ipv4Re)))

  /** `text` with all PII replaced by placeholder tokens. Replacement
    * order (email, phone, IP) is fixed: the dotted-phone form would
    * otherwise be half-eaten by the IPv4 pattern. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")
}
