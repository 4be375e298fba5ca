package graft.etl

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Narrative-cleaning chain.
  *
  * Reproduces the reference preprocessing semantics
  * (`01_merchcat_etl.py:52-66`, `utils/regex_utils.py:1-109`) as pure
  * Catalyst column expressions: the date/time scrubber that the reference
  * runs as a pandas_udf (`01_merchcat_etl.py:52-54`) is expressed here as a
  * native `regexp_replace` with the combined pattern translated from Python
  * verbose-regex to Java syntax. That keeps the whole chain inside
  * whole-stage codegen — no Python worker, no Arrow hop, no UDF at all on
  * the hot path (a Scala UDF variant is still provided to cover the UDF
  * surface).
  *
  * Translation notes (Python `re` → `java.util.regex`):
  *   - `(?P<name>...)` → `(?<name>...)`; Java group names cannot contain
  *     underscores, so `num_date`/`wordy_date` become `numdate`/`wordydate`.
  *   - `(?P=name)` → `\k<name>`.
  *   - `re.IGNORECASE | re.VERBOSE | re.UNICODE` → inline flags `(?iux)`.
  */
object Cleaning {

  // --- date / time pattern, ported from utils/regex_utils.py:4-105 ---

  private val nDAY   = """(?:[0-3]?\d)"""
  private val nMNTH  = """(?:11|12|10|0?[1-9])"""
  private val nYR    = """(?:(?:19|20)\d\d)"""

  /** utils/regex_utils.py:12-29 — numeric dates in 4 orders, the delimiter
    * captured per-branch and backreference-matched. */
  private val NUM_DATE = s"""
    (?<numdate>
        (?:^|\\D)
        (?:
        # YYYY-MM-DD
        (?:$nYR(?<delim1>[\\/\\-\\._]?)$nMNTH\\k<delim1>$nDAY)
        |
        # YYYY-DD-MM
        (?:$nYR(?<delim2>[\\/\\-\\._]?)$nDAY\\k<delim2>$nMNTH)
        |
        # DD-MM-YYYY
        (?:$nDAY(?<delim3>[\\/\\-\\._]?)$nMNTH\\k<delim3>$nYR)
        |
        # MM-DD-YYYY
        (?:$nMNTH(?<delim4>[\\/\\-\\._]?)$nDAY\\k<delim4>$nYR)
        )
        (?:\\D|$$)
    )"""

  /** utils/regex_utils.py:31-38 */
  private val DAY = """
(?:
    (?:[23]?1st|2{1,2}nd|\d{1,2}th|2?3rd|first|second|third|fourth|fifth|sixth|seventh|eighth|ninth)
    |
    (?:[0123]?\d)
)"""

  /** utils/regex_utils.py:40 */
  private val MONTH =
    """(?:january|february|march|april|may|june|july|august|september|october|november|december|jan|feb|mar|apr|may|jun|jul|aug|sep|sept|oct|nov|dec)"""

  /** utils/regex_utils.py:42 */
  private val YEAR = """(?:(?:[12]?\d|')?\d\d)"""

  /** utils/regex_utils.py:44 */
  private val DELIM = """(?:\s*(?:[\s\.\-\\/,]|(?:of))\s*)"""

  /** utils/regex_utils.py:46 */
  private val YEAR_4D = """(?:[12]\d\d\d)"""

  /** utils/regex_utils.py:48-79 — wordy dates. */
  private val DATE_PATTERN = s"""(?<wordydate>
    (?:^|\\W)
        (?:
            (?:
                (?:$YEAR_4D$DELIM)?
                    (?:
                    # Day - Month
                    (?:$DAY$DELIM$MONTH)
                    |
                    # Month - Day
                    (?:$MONTH$DELIM$DAY)
                    )
                (?:$DELIM$YEAR)?
            )
            |
            # Month - Year
            (?:$MONTH$DELIM$YEAR)
            |
            (?:$DAY$MONTH$YEAR)
            |
            (?:$DAY$MONTH$YEAR_4D)
            |
            (?:xx$DELIM${"xx"}$DELIM$YEAR_4D)
        )
    (?:$$|\\W)
)"""

  /** utils/regex_utils.py:81-92 */
  private val TIME = """(?:
(?:
[012345]?\d
(:|\.|h)[012345]\d
)
(?::[012345]\d)?
(?:\s*(?:a|p)\.?m\.?)?
)"""

  /** utils/regex_utils.py:94-105 — dates and/or times, combined. */
  private val COMBINED = s"""(?<combined>
    (?:
        $TIME?$DATE_PATTERN$TIME?
        |
        $TIME?$NUM_DATE$TIME?
    )
    |
    (?:$TIME)
)"""

  /** Java-syntax equivalent of `regex_utils.date_pattern`
    * (utils/regex_utils.py:109). Python's `re.U` makes `\d`/`\w`
    * Unicode-aware; Java spells that `U` (UNICODE_CHARACTER_CLASS —
    * lower-case `u` is UNICODE_CASE only, which would leave `\d`
    * ASCII-bound and diverge on non-ASCII digit dates). */
  val datePattern: String = "(?iUx)" + COMBINED

  /** utils/regex_utils.py:107 */
  val priceRegex: String =
    """(((?:\d+\.)*\d+,\d+)|(\d+\.\d+))(?:[/\s]*)(?:(gbp|\%))"""

  private val compiledDate = java.util.regex.Pattern.compile(datePattern)

  // --- pure-function form (mirrors tests/tests_regex.py:8-16, no trim) ---

  /** Strip dates/times only — the `dates_udf` kernel
    * (`01_merchcat_etl.py:52-54`). */
  def stripDates(text: String): String =
    compiledDate.matcher(text).replaceAll(" ")

  /** The reference unit-test chain (`tests/tests_regex.py:8-16`): date sub,
    * price strip, parens, `&`→" and ", non-alphanumeric→space, collapse
    * whitespace, masked-PAN drop. NOTE: deliberately no trim — the
    * reference test chain omits the notebook's final trim. */
  def cleanText(text: String): String = {
    var t = stripDates(text)
    t = t.replaceAll(priceRegex, "")
    t = t.replaceAll("""(\(+)|(\)+)""", "")
    t = t.replaceAll("&", " and ")
    t = t.replaceAll("[^a-zA-Z0-9]+", " ")
    t = t.replaceAll("""\s+""", " ")
    t = t.replaceAll("""\s+x{2,}\s+""", " ")
    t
  }

  // --- Column form (mirrors 01_merchcat_etl.py:56-66, with trim) ---

  /** Date/time scrub as a native column expression — replaces the
    * reference's pandas_udf with codegen'd `regexp_replace`. */
  def stripDatesCol(c: Column): Column = regexp_replace(c, datePattern, " ")

  /** Basic chain only (no date scrub) — RE2-compatible patterns, used for
    * the DuckDB-oracle query (RE2 has no backreferences, so the date
    * pattern itself cannot be oracled). */
  def cleanBasicCol(c: Column): Column = {
    var t = regexp_replace(c, priceRegex, "")
    t = regexp_replace(t, """(\(+)|(\)+)""", "")
    t = regexp_replace(t, "&", " and ")
    t = regexp_replace(t, "[^a-zA-Z0-9]+", " ")
    t = regexp_replace(t, """\s+""", " ")
    t = regexp_replace(t, """\s+x{2,}\s+""", " ")
    trim(t)
  }

  /** Full cleaning chain (`01_merchcat_etl.py:56-66`), including trim. */
  def cleanCol(c: Column): Column = cleanBasicCol(stripDatesCol(c))

  /** Multilingual variant of [[cleanBasicCol]]: the reference chain's
    * `[^a-zA-Z0-9]+` squeeze deletes every non-ASCII codepoint (right
    * for UK card narratives, fatal for a multilingual corpus) — here
    * the squeeze keeps Unicode letters and digits via `\p{L}\p{N}`,
    * which Java regex and RE2 both evaluate per-codepoint with the
    * same category tables (oracle-proven on the unicode zoo). Same
    * price/paren/& stages; same squeeze-and-trim discipline. */
  def cleanMultilingualCol(c: Column): Column = {
    var t = regexp_replace(c, priceRegex, "")
    t = regexp_replace(t, """(\(+)|(\)+)""", "")
    t = regexp_replace(t, "&", " and ")
    t = regexp_replace(t, """[^\p{L}\p{N}]+""", " ")
    t = regexp_replace(t, """\s+""", " ")
    trim(t)
  }

  // --- UDF surface (covers SURVEY §2.9 U1) ---

  /** Register `clean_text` / `strip_dates` for the SQL surface; the UDF
    * closes over the precompiled JVM-local pattern (thread-safe). */
  def registerUdfs(spark: SparkSession): Unit = {
    spark.udf.register("strip_dates", (s: String) => if (s == null) null else stripDates(s))
    spark.udf.register("clean_text", (s: String) => if (s == null) null else cleanText(s).trim)
  }
}
