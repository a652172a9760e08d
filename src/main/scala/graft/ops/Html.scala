package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WET-style text extraction from HTML markup — the first stage of
  * every web-crawl curation pipeline (CommonCrawl WARC → WET is
  * exactly this shape), which the reference's notebook corpus skips
  * (its CSV arrives pre-extracted) but a 100 TB pipeline cannot.
  *
  * Everything here is a chain of codegen'd built-ins
  * (`regexp_replace` / `replace`) — no UDF, so the whole extraction
  * stays inside WholeStageCodegen and pushes through the scan like any
  * other projection. Patterns are deliberately RE2-compatible (no
  * backreferences, no lookarounds): Spark's Java regex and an
  * RE2-based engine (DuckDB, Go) agree on them byte-for-byte, which is
  * what lets the oracle replicate the transform exactly.
  *
  * This is tag stripping, not DOM parsing: script/style payloads and
  * comments are dropped wholesale, every other tag becomes a space,
  * the five XML/HTML core entities plus `&nbsp;` are decoded, and
  * whitespace collapses to single spaces. That is the WET contract —
  * boilerplate REMOVAL (nav/footer classification) is a separate,
  * model-driven stage ([[TextAnalysis]] quality scores downstream).
  */
object Html {

  /** Drop `<script>`/`<style>` elements with their payloads, then
    * comments, then every remaining tag (each becomes one space so
    * adjacent text never fuses: `a<br>b` → `a b`).
    */
  def stripTags(c: Column): Column = {
    val noScript =
      regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    regexp_replace(noComment, "(?s)<[^>]+>", " ")
  }

  /** Decode the HTML core entities. `&amp;` decodes LAST — the
    * standard order, so `&amp;lt;` yields the literal `&lt;` instead
    * of double-decoding to `<`.
    */
  def decodeEntities(c: Column): Column = {
    val nbsp = regexp_replace(c, "&nbsp;", " ")
    val lt = regexp_replace(nbsp, "&lt;", "<")
    val gt = regexp_replace(lt, "&gt;", ">")
    val quot = regexp_replace(gt, "&quot;", "\"")
    val apos = regexp_replace(quot, "&#39;", "'")
    regexp_replace(apos, "&amp;", "&")
  }

  /** Full extraction: strip tags, decode entities, collapse all
    * whitespace runs to single spaces, trim.
    *
    * The whitespace class is EXPLICIT, not `\s`: Java's `\s` includes
    * vertical tab (0x0B) while RE2's does not, so `\s+` would silently
    * break the cross-engine byte-for-byte claim on a document carrying
    * a VT. Both engines accept the spelled-out class identically.
    */
  def extractText(c: Column): Column =
    trim(regexp_replace(decodeEntities(stripTags(c)),
      "[ \\t\\n\\x0B\\f\\r]+", " "))
}
