package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PII redaction for training corpora: replace emails, IPv4 addresses,
  * and phone-shaped digit runs with stable placeholder tokens, and count
  * what was redacted (for corpus reporting).
  *
  * Pure `regexp_replace` chains — codegen'd, scan-speed. The patterns
  * deliberately use the regex subset shared by java.util.regex and RE2
  * (no lookaround, no backreferences), so any SQL engine can audit or
  * replicate a redaction pass byte-for-byte.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  /** 7+ digit runs with at most two separator chars between digits, led
    * by an optional +country: the usual cheap phone heuristic (high
    * recall, some false positives — acceptable for pretraining
    * scrubbing). The per-digit structure (not a bare `[0-9 ().-]{4,}`
    * filler, which would need only 4 digits total) keeps ordinary
    * numeric prose like "pages 100 - 104" out of the match.
    */
  val PhoneRe = "\\+?([0-9][ ().-]{0,2}){6,}[0-9]"

  /** Redact emails → `[EMAIL]`, IPv4 → `[IP]`, phones → `[PHONE]`.
    * Email first (its local part contains digits that the phone pattern
    * could otherwise eat), then IP (dotted digits look phone-shaped),
    * then phone.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Per-kind redaction counts (on the ORIGINAL text, same order-of-
    * application semantics as [[redact]]: emails counted first, then IPs
    * in the email-free text, then phones in the ip-free text).
    */
  def counts(text: Column): (Column, Column, Column) = {
    val emails = size(regexp_extract_all(text, lit(EmailRe), lit(0)))
    val noEmail = regexp_replace(text, EmailRe, "[EMAIL]")
    val ips = size(regexp_extract_all(noEmail, lit(Ipv4Re), lit(0)))
    val noIp = regexp_replace(noEmail, Ipv4Re, "[IP]")
    val phones = size(regexp_extract_all(noIp, lit(PhoneRe), lit(0)))
    (emails, ips, phones)
  }
}
