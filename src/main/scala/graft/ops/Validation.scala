package graft.ops

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Input validation — the reference's request-contract checks rebuilt:
  * driver-side (fail fast before any job starts) and in-engine (filter /
  * flag malformed rows at scale, where one bad row must not kill a
  * 100 TB job).
  *
  * Semantics mirror ref `controller/app.py:682-718` +
  * `controller/script.py:7-15`: dates must parse as `yyyy-MM-dd`, the
  * range must be ordered, email must match the reference's regex.
  */
object Validation {

  /** The reference's email regex, verbatim (ref `controller/app.py:706`). */
  val EmailRegex = "^[a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+\\.[a-zA-Z0-9-.]+$"

  // STRICT + proleptic-year pattern: the default SMART resolver silently
  // adjusts impossible dates (2024-02-30 → 02-29), which would let a
  // date through here that the in-engine `to_date` filter rejects —
  // caught by PropertySpec.
  private val fmt = DateTimeFormatter.ofPattern("uuuu-MM-dd")
    .withResolverStyle(java.time.format.ResolverStyle.STRICT)

  /** Driver-side date check (ref `controller/script.py:7-15`). */
  def isValidDate(s: String): Boolean =
    try { LocalDate.parse(s, fmt); true } catch { case _: Exception => false }

  /** Driver-side request validation; returns the field-level errors
    * (empty = valid), mirroring the reference's first-error-wins
    * messages as a full report instead. */
  def validateJobRequest(initialDate: String, finalDate: String,
                         email: String): Seq[String] = {
    val errs = Seq.newBuilder[String]
    if (!isValidDate(initialDate)) errs += s"initial_date not yyyy-MM-dd: $initialDate"
    if (!isValidDate(finalDate)) errs += s"final_date not yyyy-MM-dd: $finalDate"
    if (isValidDate(initialDate) && isValidDate(finalDate) &&
        LocalDate.parse(initialDate, fmt).isAfter(LocalDate.parse(finalDate, fmt)))
      errs += "initial_date after final_date"
    if (!email.matches(EmailRegex)) errs += s"invalid email: $email"
    errs.result()
  }

  /** In-engine: TRUE where the string column parses as `yyyy-MM-dd`
    * (`to_date` yields NULL on garbage under non-ANSI semantics —
    * the scale-safe row filter). */
  def isValidDateCol(c: Column): Column = to_date(c, "yyyy-MM-dd").isNotNull

  /** In-engine email validity flag. */
  def isValidEmailCol(c: Column): Column = c.rlike(EmailRegex)
}
