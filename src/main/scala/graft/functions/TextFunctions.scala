package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar kernels for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All are compositions of
  * codegen'd built-ins (no UDFs), so they vectorize inside whole-stage
  * codegen and push through the parquet scan unimpeded.
  */
object TextFunctions {

  /** Occurrences of literal `tok` in `c` via the length-delta trick —
    * engine-portable (identical semantics in DuckDB for the oracle).
    * Literal `replace`, not regexp: ~4x cheaper per pass and the kernels
    * below run many passes over every document. The divisor is tok's
    * CODE-POINT count (`length` counts code points, `String.length`
    * counts UTF-16 units — a supplementary-plane tok would halve the
    * count); empty tok is refused rather than dividing by zero. */
  def occurrences(c: Column, tok: String): Column = {
    require(tok.nonEmpty, "occurrences: empty token")
    val cps = tok.codePointCount(0, tok.length)
    ((length(c) - length(call_function("replace", c, lit(tok), lit("")))) / cps).cast("long")
  }

  /** Non-empty whitespace tokens. */
  def tokens(c: Column): Column = filter(split(c, " "), x => x =!= "")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Stopword-marker hit counts per language (n-gram heuristic language ID:
    * the padded function words are near-unambiguous markers). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " que "),
    "fr" -> Seq(" le ", " les ", " et "),
    "de" -> Seq(" der ", " und ", " die "))

  def langHits(c: Column, lang: String): Column =
    langMarkers(lang).map(occurrences(c, _)).reduce(_ + _)

  /** Predicted language = argmax of marker hits, fixed tie-break order,
    * "und" (undetermined) when no marker fires. */
  def langId(c: Column): Column = {
    val scored = langMarkers.keys.toSeq.sorted.map(l => (l, langHits(c, l)))
    val best = scored.map(_._2).reduce(greatest(_, _))
    scored.foldRight(lit("und"): Column) { case ((l, hits), els) =>
      when(hits > 0 && hits === best, lit(l)).otherwise(els)
    }
  }

  def punctCount(c: Column): Column =
    Seq(".", ",", "!", "?", ";", ":").map(occurrences(c, _)).reduce(_ + _)

  /** Quality heuristics: word stats + punctuation density + stopword ratio.
    * Returns (n_chars, n_words, avg_word_len, punct_ratio, stop_ratio). */
  def qualityMetrics(c: Column): Seq[(String, Column)] = {
    val nChars = length(c).cast("long")
    val nWords = tokenCount(c).cast("long")
    Seq(
      "n_chars" -> nChars,
      "n_words" -> nWords,
      "avg_word_len" -> round(length(regexp_replace(c, " ", "")).cast("double") / nWords, 4),
      "punct_ratio" -> round(punctCount(c).cast("double") / nChars, 4),
      "stop_ratio" -> round(langHits(c, "en").cast("double") / nWords, 4))
  }

  /** Composite quality score in [0,1]: length band + word-length band. */
  def qualityScore(c: Column): Column = {
    val m = qualityMetrics(c).toMap
    val lenOk = when(m("n_chars").between(100, 10000), 0.5).otherwise(0.0)
    val wordOk = when(m("avg_word_len").between(3.0, 12.0), 0.5).otherwise(0.0)
    lenOk + wordOk
  }

  /** Rolling document fingerprint: md5 over the alphanumeric skeleton. */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(c), "[^a-z0-9]", ""))

  // ---- cleaning / PII scrubbing (training-data hygiene: models must not
  // memorize contact details; every kernel is a codegen'd regexp_replace
  // chain — map-side only, no shuffle, linear scan at any scale) ----

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"
  private val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  private val UrlRe = "https?://[^\\s]+"

  /** Redact emails, URLs, IPv4 addresses and phone-like digit runs with
    * stable placeholder tokens (order matters: URLs first so their host
    * parts aren't half-eaten by the IP/phone rules). */
  def scrubPii(c: Column): Column = {
    val noUrl = regexp_replace(c, UrlRe, "<URL>")
    val noMail = regexp_replace(noUrl, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noMail, Ipv4Re, "<IP>")
    regexp_replace(noIp, PhoneRe, "<PHONE>")
  }

  /** Collapse whitespace runs to single spaces and trim — the canonical
    * pre-tokenization cleanup. */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  // ---- URL canonicalization (URL-level dedup: the cheapest and first
  // dedup pass of a web-corpus pipeline keys on the canonical URL before
  // any content hash is computed) ----

  /** Tracking query params stripped by [[canonicalizeUrl]]. Anchored to a
    * leading `?`/`&` separator (kept via `$1`) so parameter names that
    * merely CONTAIN a tracking name (`href=`, `xutm_source=`) and path
    * segments (`/ref=x/`) never match; separator runs left behind by
    * adjacent tracking params are collapsed afterwards. */
  private val TrackingParamRe = "([?&])(utm_[a-z0-9_]+|fbclid|gclid|ref)=[^&]*"

  /** Canonical URL form for URL-level dedup: drop the `#fragment`, drop the
    * scheme, lowercase the HOST only (paths stay case-sensitive), drop a
    * leading `www.`, strip tracking query params (`utm_*`, `fbclid`,
    * `gclid`, `ref`), collapse a directory slash before the query, and trim
    * dangling `?`/`&`/`/`. A codegen'd regexp chain — map-side only, no
    * shuffle, linear scan at any scale. Replacement semantics are
    * replace-ALL-matches (Java `replaceAll`); the DuckDB oracle passes the
    * `g` flag everywhere to match. */
  def canonicalizeUrl(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*", "")
    val noScheme = regexp_replace(noFrag, "^[hH][tT][tT][pP][sS]?://", "")
    val host = lower(regexp_extract(noScheme, "^[^/?#]*", 0))
    val bareHost = regexp_replace(host, "^www\\.", "")
    val rest = regexp_replace(noScheme, "^[^/?#]*", "")
    val noTrack = regexp_replace(rest, TrackingParamRe, "$1")
    // adjacent tracking params leave separator runs: '?&&id=3' → '?id=3'
    val noAmpRun = regexp_replace(regexp_replace(noTrack, "&&+", "&"), "\\?&", "?")
    val noDangling = regexp_replace(noAmpRun, "[?&]+$", "")
    val noDirSlash = regexp_replace(noDangling, "/\\?", "?")
    val noTrailSlash = regexp_replace(noDirSlash, "/$", "")
    concat(bareHost, noTrailSlash)
  }
}
