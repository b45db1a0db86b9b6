package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * quality scoring, language-ID heuristics, fingerprinting. All pure Column
  * expressions (whole-stage codegen, no UDFs), each with an exact DuckDB
  * replica used by the correctness gate.
  */
object Text {

  /** Whitespace tokens (single-space splitter — matches the corpus shape;
    * use `bpeTokenCount` for subword-ish counting). */
  def tokens(c: Column): Column = split(c, " ")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token counting: runs of letters, runs of digits, or single
    * non-alphanumeric non-space chars — the classic pre-tokenizer shape. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  /** All overlapping n-token word grams of a document, in position order
    * (NOT distinct — exact-substring dedup needs every occurrence). A doc
    * with fewer than n tokens yields an empty array. Pure Column expression:
    * `transform(sequence(...), i -> concat_ws(' ', slice(toks, i, n)))`,
    * entirely inside whole-stage codegen. */
  def wordGrams(c: Column, n: Int): Column = {
    require(n >= 1, "n must be >= 1")
    val toks = tokens(c)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** PII scrubbing: redact emails and phone numbers — the standard
    * training-corpus hygiene pass. Patterns stay in the regex subset that
    * Java and RE2-style engines interpret identically, so the oracle
    * replays them verbatim. */
  def scrubPii(c: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
    regexp_replace(regexp_replace(c, email, "<EMAIL>"), phone, "<PHONE>")
  }

  /** Punctuation chars / total chars. */
  def punctRatio(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[.,!?;:]", ""))).cast("double") /
      length(c)

  private[graft] val Stopwords = Seq("the", "a", "an", "of", "and", "to",
    "in", "is", "it", "that")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(c: Column): Column =
    size(filter(tokens(c), t => t.isin(Stopwords: _*))).cast("double") /
      tokenCount(c)

  /** Composite quality score in [0,1]: length sweet-spot + stopword signal
    * - punctuation noise. Deterministic, engine-portable arithmetic. */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / 500.0, lit(1.0))
    val stop = stopwordRatio(c)
    val punct = punctRatio(c)
    round(least(greatest(
      lenScore * 0.5 + least(stop * 4.0, lit(1.0)) * 0.4 - punct * 0.5,
      lit(0.0)), lit(1.0)), 4)
  }

  /** Word n-gram repetition ratio in [0,1]: 1 - distinct/total n-grams —
    * the Gopher-style boilerplate/loop detector (a doc that repeats the
    * same phrases has few distinct n-grams relative to its length). 0 for
    * docs shorter than n tokens. One-pass codegen kernel
    * ([[RepetitionExpr]]); [[repetitionRatioRef]] is the declarative
    * formula it is parity-tested against. */
  def repetitionRatio(c: Column, n: Int): Column =
    RepetitionExpr.repetition_ratio(c, n)

  /** Declarative reference form of [[repetitionRatio]] (transform +
    * array_distinct — higher-order functions, interpreted; ~35x slower at
    * corpus scale). Kept as the kernel's parity oracle. */
  def repetitionRatioRef(c: Column, n: Int): Column = {
    val sh = Hashing.shingles(tokens(c), n) // ordered, duplicates kept
    when(size(sh) === 0, lit(0.0))
      .otherwise(round(lit(1.0) -
        size(array_distinct(sh)).cast("double") / size(sh), 4))
  }

  /** Language-ID by stopword-list hits — the classic n-gram/function-word
    * heuristic, restricted to portable string ops. Scores each language by
    * the fraction of tokens in its function-word list; argmax wins, 'und'
    * if nothing hits. */
  val LangWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "y", "que"))

  def langScores(c: Column): Column = {
    val t = tokens(c)
    val n = size(t)
    struct(LangWords.map { case (lang, words) =>
      (size(filter(t, x => x.isin(words: _*))).cast("double") / n).as(lang)
    }: _*)
  }

  def langId(c: Column): Column = {
    val scores = langScores(c)
    val best = greatest(LangWords.map { case (l, _) => scores.getField(l) }: _*)
    when(best <= 0, lit("und")).otherwise(
      LangWords.foldRight(lit("und")) { case ((l, _), acc) =>
        when(scores.getField(l) === best, lit(l)).otherwise(acc)
      })
  }

  /** Document fingerprint (rolling hash over tokens) — see Hashing. */
  def docFingerprint(c: Column): Column = Hashing.fingerprint(tokens(c))

  /** URL canonicalization — the key function under exact URL dedup
    * (gate t40): lowercase scheme+host, strip a `www.` prefix, drop the
    * fragment, drop a path's trailing slash, remove `utm_*` tracking
    * parameters, and SORT the surviving query parameters so parameter
    * order never splits a dedup group. Pure regex/HOF column work shared
    * construct-for-construct with the DuckDB oracle.
    *
    * Scheme-less / relative URLs (common in crawl data) pass through
    * UNCHANGED: every extraction above anchors on `scheme://`, so without
    * the guard all non-absolute URLs would collapse to the same
    * degenerate `://` key and falsely merge into one dedup group. */
  def urlCanonicalize(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*$", "")
    val base = regexp_extract(noFrag, "^([^?]*)", 1)
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val scheme = lower(regexp_extract(base, "^([A-Za-z]+)://", 1))
    val host = regexp_replace(
      lower(regexp_extract(base, "^[A-Za-z]+://([^/]*)", 1)), "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(base, "^[A-Za-z]+://[^/]*(/.*)?$", 1), "/$", "")
    val params = array_join(array_sort(filter(split(query, "&"),
      p => length(p) > 0 && !startswith(p, lit("utm_")))), "&")
    when(c.rlike("^[A-Za-z]+://"),
      concat(scheme, lit("://"), host, path,
        when(params =!= "", concat(lit("?"), params)).otherwise(lit(""))))
      .otherwise(c)
  }

  /** LENIENT HTML boilerplate strip — tag-soup to main text with a rule
    * chain that never errors on malformed markup (there is no parse to
    * fail): comments, then whole script/style blocks, then tags (a `<`
    * not followed by a letter or `/` is literal text and survives), then
    * the five common entities, then whitespace collapse. All builtin
    * string functions (codegen'd, map-only at any scale) using only
    * regex constructs RE2 and Java agree on, so an oracle can replay the
    * rules text-identically — see gate t38. */
  def htmlStrip(c: Column): Column = {
    val noComment = regexp_replace(c, "(?s)<!--.*?-->", " ")
    val noScript =
      regexp_replace(noComment, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "</?[a-zA-Z][^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&nbsp;" -> " ", "&amp;" -> "&").foldLeft(noTags) {
      case (acc, (e, ch)) => replace(acc, lit(e), lit(ch))
    }
    trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " "))
  }
}
