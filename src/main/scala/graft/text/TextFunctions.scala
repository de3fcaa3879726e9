package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: tokenization
  * stats, quality scoring, stopword-based language scoring, document
  * fingerprinting. Composed from built-in (codegen'd) Spark functions —
  * no UDFs — so they stay inside whole-stage codegen; the hot token/
  * stopword/punctuation counters additionally share ONE fused native
  * pass over the string ([[graft.functions.TextStats]]) instead of
  * re-splitting the document per statistic.
  */
object TextFunctions {

  /** Whitespace tokenization (the baseline tokenizer; a BPE-ish regex
    * variant is [[bpeTokenCount]]). */
  def words(text: Column): Column = split(text, "\\s+")

  /** struct(n_tokens, stop_cnt, punct_cnt) in one fused codegen pass;
    * split-equivalent semantics property-pinned by `TextStatsSpec`.
    * [[tokenCount]]/[[stopwordCount]]/[[punctCount]]/[[qualityScore]]
    * all extract fields of this ONE expression, so any subset used in
    * the same projection costs a single string scan (codegen
    * subexpression elimination unifies the equal instances). */
  def textStats(text: Column, stopwords: Seq[String] = DefaultStopwords): Column =
    org.apache.spark.sql.graft.GraftSql.column(
      graft.functions.TextStats(
        org.apache.spark.sql.graft.GraftSql.expression(text), stopwords))

  def tokenCount(text: Column): Column = textStats(text).getField("n_tokens")

  /** BPE-ish subword proxy: maximal letter runs, digit runs, and
    * non-alphanumeric symbol runs (whitespace dropped) — a cheap
    * deterministic stand-in for a byte-pair encoder's pretokenizer. Run
    * extraction instead of a lookaround split, so RE2-based engines
    * (DuckDB, Go) compute the identical token stream. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  def stopwordCount(text: Column, stopwords: Seq[String] = DefaultStopwords): Column =
    textStats(text, stopwords).getField("stop_cnt")

  /** Counted in the same fused pass (the regex form —
    * `regexp_count(text, "[.,;:!?]")` — is what the DuckDB oracle keeps,
    * via `length - length(regexp_replace(...))`; values are identical). */
  def punctCount(text: Column): Column =
    textStats(text).getField("punct_cnt")

  /** Composite quality score in [0,1]: balanced length, low punctuation
    * density, healthy stopword ratio. Deterministic double arithmetic
    * (identical expression order cross-engine); all three counters come
    * from the one shared [[textStats]] pass. */
  def qualityScore(text: Column): Column =
    qualityScoreFrom(textStats(text), text)

  /** [[qualityScore]] over an ALREADY-COMPUTED [[textStats]] struct
    * column — the shape for callers that must guarantee one text_stats
    * evaluation per row structurally (a materialized `__st` projection)
    * instead of relying on codegen subexpression elimination, which
    * projections get but Filter conditions do not. */
  def qualityScoreFrom(st: Column, text: Column): Column = {
    val n = st.getField("n_tokens")
    val stopRatio = st.getField("stop_cnt") * lit(1.0) / n
    val punctRatio = st.getField("punct_cnt") * lit(1.0) / greatest(length(text), lit(1))
    val lenScore = least(n, lit(200)) * lit(1.0) / lit(200.0)
    least(greatest(lenScore * lit(0.5) + stopRatio * lit(0.3) + (lit(1.0) - punctRatio) * lit(0.2), lit(0.0)), lit(1.0))
  }

  /** Stopword-hit language scores (n-gram-free heuristic: function words
    * are the strongest cheap signal). Returns the per-language hit counts;
    * [[langGuess]] argmaxes them with a fixed priority order. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to", "a"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "und", "ist", "das", "nicht"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"))

  def langScore(text: Column, lang: String): Column =
    langScoreWords(words(lower(text)), lang)

  /** Variant over a pre-split lowercase word array — reuse one split
    * across the four language scores instead of re-tokenizing per score. */
  def langScoreWords(ws: Column, lang: String): Column = {
    val markers = LangMarkers.toMap.apply(lang)
    size(filter(ws, w => w.isInCollection(markers)))
  }

  /** Argmax of [[langScore]] with deterministic tie-break (declaration
    * order); all-zero scores → "und" (undetermined). */
  def langGuess(text: Column): Column = langGuessWords(words(lower(text)))

  def langGuessWords(ws: Column): Column = {
    val scores = LangMarkers.map { case (l, _) => l -> langScoreWords(ws, l) }
    val maxScore = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === maxScore && maxScore > 0, lit(l)).otherwise(acc)
    }
  }

  /** Single-pass language profile: all four scores + the argmax guess in
    * one tokenization, returning struct(_1.._4 scores, _5 guess).
    * Composed column expressions re-tokenize per score (Catalyst's
    * CollapseProject inlines the shared array alias — measured 4.6s vs
    * 0.6s at sf0.1); this was a tuple UDF, now a native codegen
    * expression ([[graft.functions.LangProfile]] — no String conversion,
    * no lowercase copy, no split array; UDF-equivalence property-pinned
    * in `TextStatsSpec`). Semantics identical to
    * [[langScore]]/[[langGuess]]. */
  val langProfile: Column => Column = c =>
    org.apache.spark.sql.graft.GraftSql.column(
      graft.functions.LangProfile(
        org.apache.spark.sql.graft.GraftSql.expression(c), LangMarkers))

  /** Canonical-form content fingerprint: lowercase, collapse whitespace,
    * md5. Equal fingerprints = exact duplicates modulo case/whitespace.
    * The canonicalization is one fused pass
    * ([[graft.functions.CanonicalText]]) instead of
    * `lower(regexp_replace(...))`'s regex engine + two copies. */
  def fingerprint(text: Column): Column =
    md5(org.apache.spark.sql.graft.GraftSql.column(
      graft.functions.CanonicalText(
        org.apache.spark.sql.graft.GraftSql.expression(text))))

  /** Linear quality-classifier logit (fastText/logreg-shaped scorer over
    * the engine's own text features, with fixed illustrative weights —
    * in production the weights come from a trained model and drop in
    * unchanged). Pure +,-,*,/ over doubles in a FIXED association order,
    * so the value is bit-reproducible across engines (IEEE 754 defines
    * those ops exactly; a transcendental `exp` would not be). */
  def classifierLogit(text: Column): Column = {
    val n = tokenCount(text)
    val stopRatio = stopwordCount(text) * lit(1.0) / greatest(n, lit(1))
    val punctRatio = punctCount(text) * lit(1.0) / greatest(length(text), lit(1))
    val lenScore = least(n, lit(200)) * lit(1.0) / lit(200.0)
    lit(-1.2) + stopRatio * lit(3.5) - punctRatio * lit(8.0) + lenScore * lit(2.0)
  }

  /** Hard-sigmoid link: clamp(0.25·z + 0.5, 0, 1) — the piecewise-linear
    * sigmoid used by quantized inference runtimes. Chosen over 1/(1+e^-z)
    * because it is exactly defined in IEEE arithmetic (deterministic
    * across engines) and order-preserving, so thresholding decisions are
    * identical to the smooth link's. */
  def hardSigmoid(z: Column): Column =
    least(greatest(z * lit(0.25) + lit(0.5), lit(0.0)), lit(1.0))
}
