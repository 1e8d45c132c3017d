package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the LLM-data-pipeline operators
  * (builder brief; SURVEY.md §7.4): tokenization, shingling, hashing and
  * normalization over `documents.text`-shaped columns.
  *
  * Everything here is a pure Catalyst expression (codegen'd built-ins —
  * no UDFs), so whole-stage codegen keeps the scan→project pipeline
  * fused; at 100 TB the cost is one pass over the strings.
  *
  * Cross-engine parity notes (for the DuckDB oracles): tokenization is a
  * single-space split; hashes derive from md5 hex (identical in every
  * engine), not from engine-specific hash functions.
  */
object TextOps {

  /** Whitespace tokens. The corpus is single-space separated; a `\\s+`
    * split would also work but `split(_, " ")` matches DuckDB's
    * `string_split(text, ' ')` exactly, including empty-token edge cases.
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count as BIGINT (DuckDB len() is BIGINT). */
  def nTokens(text: Column): Column = size(tokens(text)).cast("long")

  /** Content-defined chunking over a token array (the LBFS/FastCDC
    * idea at word granularity: Muthitacharoen et al. 2001): a chunk
    * boundary falls AFTER every token whose portable 60-bit hash is
    * ≡ 0 (mod `divisor`), so expected chunk length is `divisor` tokens
    * and — unlike n45's fixed-width chunks — an insertion near the
    * start of a document shifts NO boundary after the next cut point.
    * That shift-resistance is what makes chunk hashes a block-level
    * dedup key across edited near-duplicate documents. Returns the
    * array of space-joined chunk strings in document order.
    *
    * Shape: one per-row fused codegen loop (the native
    * [[graft.functions.CdcChunks]] expression — the aggregate-HOF fold
    * it replaced was CodegenFallback and profiled as the chunk
    * family's wall; bit-parity property-tested in EngineLawsProps) —
    * zero exchanges; the chunk relation only shuffles AFTER chunks are
    * hashed to longs.
    */
  def cdcChunks(ws: Column, divisor: Int): Column = {
    require(divisor >= 1)
    call_function("graft_cdc_chunks", ws, lit(divisor))
  }

  /** The aggregate-HOF spelling [[cdcChunks]] fused away — kept as the
    * independent reference the parity property tests against (the
    * shinglesFromTokensHof discipline). The accumulator keeps the open
    * chunk as a token array (not a joined string) so empty tokens
    * can't be confused with "no open chunk". */
  private[graft] def cdcChunksHof(ws: Column, divisor: Int): Column = {
    require(divisor >= 1)
    val empty = array().cast("array<string>")
    val folded = aggregate(
      ws,
      struct(empty.as("done"), empty.as("cur")),
      (acc, w) => {
        val cur2 = concat(acc("cur"), array(w))
        val cut = hexHash60(w) % divisor === 0
        struct(
          when(cut, concat(acc("done"), array(concat_ws(" ", cur2))))
            .otherwise(acc("done")).as("done"),
          when(cut, empty).otherwise(cur2).as("cur"))
      },
      acc => when(size(acc("cur")) === 0, acc("done"))
        .otherwise(concat(acc("done"), array(concat_ws(" ", acc("cur"))))))
    folded
  }

  /** Adjacent-token bigrams from a token array, as an array of
    * (w1, w2) structs in position order — shared by the collocation
    * (n48) and fluency (n52) queries so the pairing logic cannot
    * diverge between them. DuckDB twin: [[graft.queries.NorthStar]]'s
    * shared bigram CTE (ws[i], ws[i+1] over generate_series(1, n-1)).
    * Docs with <2 tokens yield an empty array (explode drops them,
    * matching the empty generate_series). */
  def bigrams(ws: Column): Column =
    zip_with(
      slice(ws, lit(1), size(ws) - 1),
      slice(ws, lit(2), size(ws) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))

  /** Word n-gram shingles (distinct, space-joined, first-occurrence
    * order) from a token array column — one fused codegen'd pass per
    * row ([[graft.functions.ShingleSetFromTokens]]). Documents shorter
    * than n words, and null token arrays, yield an empty set (the
    * coalesce preserves the legacy null fold).
    */
  def shinglesFromTokens(ws: Column, n: Int): Column =
    coalesce(
      call_function("graft_shingles", ws, lit(n)),
      array().cast("array<string>"))

  /** The original higher-order-function spelling of
    * [[shinglesFromTokens]] — kept as the parity witness for the fused
    * [[graft.functions.ShingleSetFromTokens]] expression that replaced
    * it on the hot path (the HOF chain is CodegenFallback: interpreted
    * lambda dispatch + a sliced array per shingle per row, then a
    * second distinct pass — profiled as the wall of the whole shingle
    * family). EngineLawsProps proves new ≡ old on adversarial token
    * arrays; production call sites all route through
    * [[shinglesFromTokens]]. */
  private[graft] def shinglesFromTokensHof(ws: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(ws) - n),
      i => concat_ws(" ", slice(ws, i + lit(1), lit(n))))
    array_distinct(
      when(size(ws) >= n, grams)
        .otherwise(array().cast("array<string>")))
  }

  /** 60-bit positive hash from the md5 hex prefix — engine-portable
    * (DuckDB: ('0x' || substr(md5(x),1,15))::UBIGINT::BIGINT). 15 hex
    * digits keep the value under 2^60, clear of BIGINT sign issues.
    * Rides the native [[graft.functions.Hash60]] expression: same
    * value, no hex-string round-trip (law-tested against the
    * conv/substring/md5 SQL spelling).
    */
  def hexHash60(c: Column): Column =
    call_function("graft_hash60", c)

  /** HTML → text extraction (the trafilatura-shaped cleaning step a
    * web-crawl pipeline runs before any text op): drop head and
    * script/style blocks WITH their contents, drop comments (before
    * tag removal, so commented-out markup can't leak), strip remaining
    * tags, unescape the five XML entities (`&amp;` LAST — single-pass
    * semantics, so `&amp;lt;` correctly yields the literal `&lt;`),
    * collapse whitespace, trim. One codegen'd regexp_replace chain —
    * map-only at any scale. Gated by n140's closed-form twin: the
    * stripper must reproduce the original text's md5 from a
    * deterministic adversarial wrapping (tags mid-word-stream, markup
    * inside comments, angle brackets inside script). */
  def stripHtml(html: Column): Column = {
    val noHead = regexp_replace(html, "(?s)<head.*?</head>", " ")
    val noScript = regexp_replace(
      noHead, "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", "")
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) =>
        regexp_replace(c, e, r)
      }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Whitespace-collapsed lowercase normalization (fingerprint input).
    * DuckDB twin needs the 'g' flag: regexp_replace(lower(x),'\\s+',' ','g').
    */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), "\\s+", " ")

  /** Count of regex matches, as BIGINT (DuckDB:
    * len(regexp_extract_all(x, pat))). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  // --- PII scrubbing ---------------------------------------------------
  // Training corpora are redacted before anything ships: replace every
  // match with a typed placeholder token (so downstream stats can still
  // count redactions) rather than deleting, preserving token positions
  // for chunking/packing done later. Patterns are deliberately RE2-safe
  // (no backrefs/lookarounds) so the same regex runs in Spark (Java
  // regex), DuckDB (RE2) and any downstream scrubber. Spark's
  // regexp_replace is global by default; the DuckDB twin needs the 'g'
  // flag.

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b555-[0-9]{3,}\\b"

  /** Redact emails then phone numbers with typed placeholders. Order
    * matters and is fixed: email first, so a phone-looking local part
    * inside an address is consumed by the email pass. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")
}
