package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (SURVEY.md §2.8): quality
  * scoring, token counting, language id, document fingerprinting. All
  * codegen'd column expressions, no UDFs. */
object TextAnalysis {

  /** Whitespace token count. */
  def wsTokens(text: Column): Column = size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** BPE-ish token count: letter runs, digit runs, punctuation singles. */
  def bpeTokens(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality metrics per document. */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      length(t).as("n_chars_m"),
      wsTokens(t).as("n_tokens"),
      size(array_distinct(split(lower(t), "\\s+"))).as("n_uniq_tokens"),
      size(regexp_extract_all(t, lit("[.,;:!?]"), lit(0))).as("n_punct"),
      size(regexp_extract_all(t, lit("\\b(the|a|of|and|in|to|is)\\b"), lit(0))).as("n_stopwords"),
      // single division of exact ints -> bit-deterministic double
      (size(array_distinct(split(lower(t), "\\s+"))).cast("double") /
        wsTokens(t).cast("double")).as("uniq_ratio"))
  }

  /** Heuristic language id from stopword evidence; deterministic argmax with
    * fixed precedence (en > de > fr > es > zh). */
  def langId(text: Column): Column = {
    def hits(pat: String) = size(regexp_extract_all(lower(text), lit(pat), lit(0)))
    val en = hits("\\b(the|and|of|is|was|a)\\b")
    val de = hits("\\b(der|die|das|und|ist)\\b")
    val fr = hits("\\b(le|la|les|et|est)\\b")
    val es = hits("\\b(el|los|las|es|y)\\b")
    val zh = hits("[\\u4e00-\\u9fff]")
    when(zh > en && zh > de && zh > fr && zh > es, "zh")
      .when(de > en && de > fr && de > es, "de")
      .when(fr > en && fr > es, "fr")
      .when(es > en, "es")
      .otherwise("en")
  }

  /** Rolling polynomial fingerprint over token lengths (mod 1e9+7) plus an
    * md5 content fingerprint of whitespace-normalized text. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = regexp_replace(lower(col(textCol)), "\\s+", " ")
    val tokens = split(norm, " ")
    val poly = aggregate(tokens, lit(0L),
      (acc, t) => (acc * 31L + length(t).cast("long")) % 1000000007L)
    df.select(col(idCol), md5(norm).as("md5_fp"), poly.as("poly_fp"))
  }

  /** Deterministic stratified sampling: keep a document iff
    * hash32(idCol) mod 100 < rate(lang) — per-stratum rates balance a skewed
    * corpus without an RNG (reproducible across retries/engines, the same
    * property the salted join relies on). `rates` is small and broadcast
    * inside the literal CASE; the filter is a pushdown-friendly narrow scan
    * at 100 TB — no shuffle at all. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultRate: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.filter(Dedup.hash32(col(idCol).cast("string")) % 100 < rate)
  }

  /** Within-document repetition score: 1 - |distinct words| / |words| (0 =
    * no repetition); a standard boilerplate/spam signal in corpus filters. */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Dedup.words(col(textCol))
    df.select(col(idCol),
      size(w).as("n_words"),
      size(array_distinct(w)).as("n_uniq"),
      (lit(1.0) - size(array_distinct(w)).cast("double") / size(w).cast("double"))
        .as("repetition"))
  }
}
