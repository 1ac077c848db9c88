package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (SURVEY.md §2.8): quality
  * scoring, token counting, language id, document fingerprinting. All
  * codegen'd column expressions, no UDFs. */
object TextAnalysis {

  /** Whitespace token count. */
  def wsTokens(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** BPE-ish token count: letter runs, digit runs, punctuation singles. */
  def bpeTokens(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Quality metrics per document. */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      length(t).as("n_chars_m"),
      wsTokens(t).as("n_tokens"),
      size(array_distinct(split(lower(t), "\\s+"))).as("n_uniq_tokens"),
      // r21 OPT (guide §2.3 narrow the work): count matches without
      // materializing the match arrays — regexp_count is the same
      // non-overlapping scan regexp_extract_all runs, minus the per-row
      // array allocation; the punctuation count is a single translate pass
      // (length delta over the 6 stripped chars — exactly the class count)
      (length(t) - length(translate(t, ".,;:!?", ""))).as("n_punct"),
      regexp_count(t, lit("\\b(the|a|of|and|in|to|is)\\b")).as("n_stopwords"),
      // single division of exact ints -> bit-deterministic double
      (size(array_distinct(split(lower(t), "\\s+"))).cast("double") /
        wsTokens(t).cast("double")).as("uniq_ratio"))
  }

  /** Heuristic language id from stopword evidence; deterministic argmax with
    * fixed precedence (en > de > fr > es > zh). */
  def langId(text: Column): Column = {
    def hits(pat: String) = regexp_count(lower(text), lit(pat))
    // r22 (guide §2.3): the former when-chain referenced each hit count up
    // to 4 times and codegen re-evaluated the regexp per reference — the
    // committed plan ran 20 regexp scans per row. The chain's semantics —
    // "first language in (zh, de, fr, es, en) order strictly greater than
    // every LATER one" — is exactly argmax over the counts with ties going
    // to the later language: for any earlier E and the last max L*, E > L*
    // would need count(E) > max (impossible), so every earlier entry fails
    // its chain test, and L* strictly beats everything after it (all < max
    // by L* being last). array_max over (count, priority, lang) structs
    // evaluates each regexp ONCE and picks the same language, including the
    // all-zero -> 'en' case (en carries the top priority). A null text made
    // every chain condition null and fell through to 'en'; the explicit
    // isNull arm keeps that exact behavior.
    val langs = Seq(
      ("zh", "[\\u4e00-\\u9fff]", 0),
      ("de", "\\b(der|die|das|und|ist)\\b", 1),
      ("fr", "\\b(le|la|les|et|est)\\b", 2),
      ("es", "\\b(el|los|las|es|y)\\b", 3),
      ("en", "\\b(the|and|of|is|was|a)\\b", 4))
    val best = array_max(array(langs.map { case (l, pat, pri) =>
      struct(hits(pat).as("c"), lit(pri).as("p"), lit(l).as("l")) }: _*))
    when(text.isNull, lit("en")).otherwise(best.getField("l"))
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

  /** TF-IDF-style keyword extraction: top-`k` words per document ranked by
    * tf/df (term frequency over corpus document frequency), deterministic
    * word-ascending tie-break. The idf log is deliberately avoided — ranking
    * by tf/df orders identically to tf*log(N/df) for fixed tf monotone in df,
    * and a single int/int double division is exactly rounded (bit-identical
    * across engines), where libm log is not.
    *
    * Scale shape: words explode once; tf and df are both partial-agg
    * (map-side combine) groupBys; the df side joins back on the word key —
    * vocabulary-sized, so AQE broadcasts it when small and shuffle-joins
    * otherwise; the final top-k is one window partitioned by document. No
    * driver-side state, no cartesian anything. */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = df.select(col(idCol), explode(Dedup.words(col(textCol))).as("word"))
    val tf = w.groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "word")
      .withColumn("score", col("tf").cast("double") / col("df"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("word"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("word"), col("tf"), col("df"), col("score"))
  }

  /** Context-window chunking for training prep: split each document's token
    * stream into windows of `chunk` tokens advancing by `stride` (overlap =
    * chunk - stride), the standard sliding-window shaping of long documents
    * into model-context-sized training rows. Chunk count =
    * 1 + ceil((n - chunk) / stride) for n > chunk else 1, so every token is
    * covered and the tail window is allowed to run short. Pure narrow ops
    * (split / sequence / explode / slice) — zero shuffles at any scale. */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
      chunk: Int, stride: Int): DataFrame = {
    require(chunk > 0 && stride > 0 && stride <= chunk,
      s"chunkWindows: need 0 < stride <= chunk, got chunk=$chunk stride=$stride")
    val w = Dedup.words(col(textCol))
    val nw = size(w)
    val nChunks = when(nw <= chunk, lit(1))
      .otherwise(ceil((nw - chunk).cast("double") / stride).cast("int") + 1)
    df.select(col(idCol), w.as("w"), nChunks.as("nc"))
      .select(col(idCol), col("w"), explode(sequence(lit(0), col("nc") - 1)).as("i"))
      .select(
        col(idCol),
        col("i").cast("long").as("chunk_idx"),
        size(slice(col("w"), col("i") * stride + 1, lit(chunk))).as("n_tokens"),
        array_join(slice(col("w"), col("i") * stride + 1, lit(chunk)), " ").as("chunk_text"))
  }

  /** Sequence packing for training batches: assign documents, in doc-id
    * order, to contiguous token bins of `binTokens` — doc d lands in the bin
    * where its first token falls (bins may run over by less than one doc;
    * splitting to exact capacity is [[chunkWindows]]' job upstream).
    *
    * bin(d) = floor(tokensBefore(d) / binTokens) needs a GLOBAL running
    * token sum — the one primitive a naive window makes a single-partition
    * bottleneck at scale. Two-level prefix sum instead, deterministic under
    * ANY partitioning because the level split keys on the id VALUE, not the
    * physical partition: docs bucket by id range (`bucketWidth` ids per
    * bucket ≈ millions of rows each at corpus scale); per-bucket totals
    * (map-side partial agg, bucket-count rows) take a driver-scale window
    * for their exclusive prefix, broadcast back, and each doc adds its
    * within-bucket running sum (window per bucket — the corpus's one
    * shuffle). */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      binTokens: Long, bucketWidth: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(binTokens > 0 && bucketWidth > 0, "packSequences: positive sizes required")
    val t = df.select(col(idCol), col(tokensCol),
      floor(col(idCol).cast("long") / bucketWidth).as("_bucket"))
    // bucket-count-sized frame: the unpartitioned window is deliberate
    val offsets = t.groupBy("_bucket").agg(sum(col(tokensCol)).as("_btot"))
      .withColumn("_base", coalesce(
        sum("_btot").over(Window.orderBy("_bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_bucket"), col("_base"))
    val wb = Window.partitionBy("_bucket").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.join(broadcast(offsets), Seq("_bucket"))
      .withColumn("_cum", col("_base") + sum(col(tokensCol)).over(wb))
      .select(col(idCol), col(tokensCol),
        floor((col("_cum") - col(tokensCol)).cast("double") / binTokens)
          .cast("long").as("bin"))
  }

  /** Corpus-trained unigram surprisal score — the CCNet-style statistical
    * language-model quality signal, in INTEGER-exact form. The corpus is its
    * own LM: a word seen c times in a T-token corpus carries
    * `bits(w) = len2(T) - len2(c)` bits of surprisal, where `len2(n)` is the
    * binary digit count (floor(log2 n) + 1 — computed as the LENGTH OF THE
    * BINARY STRING, never floating log, so there is no libm rounding to
    * diverge between engines). A doc's score is its mean per-token
    * surprisal: low = common/boilerplate text, high = rare-vocabulary or
    * gibberish — both tails are what corpus filters cut.
    *
    * Scale shape: word counts are a partial-aggregating groupBy; the
    * token→count join shuffles on the word key (AQE splits the hot stopword
    * keys); the corpus total is a one-row broadcast. Nothing driver-side,
    * nothing quadratic. Emits (id, n_tokens, sum_bits, avg_bits) — avg is
    * the only division, one exact-int quotient per doc. */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc"), explode(Dedup.words(col(textCol))).as("w"))
    val counts = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val totalDf = counts.agg(sum("c").as("t"))
    def len2(n: Column): Column = length(conv(n, 10, 2)).cast("long")
    toks.join(counts, Seq("w"))
      .crossJoin(broadcast(totalDf)) // one row: a join in name only
      .select(col("doc"), (len2(col("t")) - len2(col("c"))).as("bits"))
      .groupBy("doc")
      .agg(count(lit(1)).as("n_tokens"), sum("bits").as("sum_bits"))
      .select(col("doc").as(idCol), col("n_tokens"), col("sum_bits"),
        (col("sum_bits").cast("double") / col("n_tokens")).as("avg_bits"))
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

  /** Training-mixture rebalancing: deterministically down-sample each domain
    * so the surviving corpus follows the target mixture `weightsPpm`
    * (parts-per-million per domain; domains absent from the map drop) while
    * keeping as much data as possible — the binding domain (largest
    * observed-count-to-weight deficit) keeps EVERYTHING and every other
    * domain thins to match it.
    *
    * All rate arithmetic is 64-bit integer (`DIV`), so the per-domain accept
    * thresholds — and therefore the exact surviving row set — are
    * bit-reproducible across engines and runs: achievable total
    * T = min_d(n_d*1e6 DIV ppm_d), per-domain threshold = T*ppm_d DIV n_d ∈
    * [0, 1e6], row survives iff md5-hash32(id) % 1e6 < threshold.
    *
    * Scale shape: one partial-agg count per domain (domain-count rows), a
    * one-row global min, both broadcast back; the corpus itself sees only a
    * narrow filter — zero corpus shuffles at any size. */
  def mixtureSample(df: DataFrame, idCol: String, domainCol: String,
      weightsPpm: Map[String, Long]): DataFrame = {
    require(weightsPpm.nonEmpty && weightsPpm.values.forall(_ > 0),
      "mixtureSample: positive ppm weights required")
    val ppm = weightsPpm.foldLeft(lit(null).cast("long")) { case (acc, (k, w)) =>
      when(col(domainCol) === k, lit(w)).otherwise(acc)
    }
    val withPpm = df.withColumn("_ppm", ppm).filter(col("_ppm").isNotNull)
    val counts = withPpm.groupBy(col(domainCol), col("_ppm"))
      .agg(count(lit(1)).as("_n"))
    val total = counts.agg(min(expr("_n * 1000000L DIV _ppm")).as("_t"))
    val thr = counts.crossJoin(broadcast(total))
      .select(col(domainCol), expr("_t * _ppm DIV _n").as("_thr"))
    withPpm.join(broadcast(thr), Seq(domainCol))
      .filter(Dedup.hash32(col(idCol).cast("string")) % 1000000L < col("_thr"))
      .select(df.columns.map(c => col(s"`$c`")).toIndexedSeq: _*)
  }

  /** Composite quality gate (Gopher-style corpus filter): each document gets
    * a deterministic comma-joined `reasons` string naming every violated
    * rule (empty = pass) — keeping the WHY makes filter-rate dashboards and
    * rule ablations possible downstream, where a bare boolean cannot.
    * Thresholds compare exactly-rounded int/int divisions, so pass/fail is
    * engine-reproducible. */
  def qualityGate(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 10, maxTokens: Int = 100000,
      maxRepetition: Double = 0.8, minStopRatio: Double = 0.01): DataFrame = {
    val t = col(textCol)
    val nTok = wsTokens(t)
    val nUniq = size(array_distinct(split(lower(t), "\\s+")))
    val rep = lit(1.0) - nUniq.cast("double") / nTok.cast("double")
    val nStop = regexp_count(t, lit("\\b(the|a|of|and|in|to|is)\\b"))
    val stopRatio = nStop.cast("double") / nTok.cast("double")
    val reasons = concat_ws(",",
      when(nTok < minTokens, lit("too_short")),
      when(nTok > maxTokens, lit("too_long")),
      when(rep > maxRepetition, lit("repetitive")),
      when(stopRatio < minStopRatio, lit("low_stopword")))
    df.select(col(idCol), reasons.as("reasons"),
      (length(reasons) === 0).as("pass"))
  }

  /** PII scrubbing: replace emails, phone-shaped numbers, and IPv4 literals
    * with typed placeholder tokens — the standard redaction pass before
    * training-corpus publication. Pure narrow regexp_replace (codegen'd,
    * zero shuffles); patterns deliberately conservative (no lookaround) so
    * they run identically across regex engines. */
  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}"
    val ipv4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    df.select(col(idCol),
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), email, "<EMAIL>"),
          ipv4, "<IP>"),
        phone, "<PHONE>").as("scrubbed"))
  }

  /** Deterministic train/val/test assignment by document-id hash with
    * ppm-exact boundaries: the same doc lands in the same split on every
    * engine and every run (no RNG, no global sort), and joining any derived
    * table back re-derives the split — the property that prevents
    * train/test leakage across pipeline stages. */
  def datasetSplit(df: DataFrame, idCol: String,
      trainPpm: Long = 980000L, valPpm: Long = 10000L): DataFrame = {
    require(trainPpm > 0 && valPpm >= 0 && trainPpm + valPpm <= 1000000L,
      "datasetSplit: ppm thresholds must fit in a million")
    val h = Dedup.hash32(col(idCol).cast("string")) % 1000000L
    df.withColumn("split",
      when(h < trainPpm, "train")
        .when(h < trainPpm + valPpm, "val")
        .otherwise("test"))
  }

  /** Unicode normalization (NFC/NFKC, optional accent strip) via the native
    * [[graft.functions.NormalizeText]] expression — byte-canonicalizes
    * visually-identical strings before fingerprint/dedup hashing. */
  def normalize(df: DataFrame, idCol: String, textCol: String,
      nfkc: Boolean = false, stripAccents: Boolean = false): DataFrame = {
    graft.functions.NormalizeText.register(df.sparkSession)
    df.select(col(idCol),
      call_function("graft_normalize", col(textCol), lit(nfkc), lit(stripAccents))
        .as("norm_text"))
  }
}
