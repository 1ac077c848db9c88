package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Mixture sampling, the composite quality gate, and Unicode normalization:
  * integer-exact mixture thresholds (binding domain keeps everything,
  * others thin to the target ratio), reason strings name every violated
  * rule, and normalization canonicalizes combining sequences / ligatures /
  * accents with an ASCII fast path. */
class TextPipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("mixtureSample: binding domain keeps all, others thin toward target, deterministic") {
    // a: 100 rows, b: 400 rows; target 50/50 → a binds (keeps all 100),
    // b thins to threshold 50*1e6... T = min(100*2, 400*2) = 200;
    // thr_a = 200*500000/100 = 1e6 (all), thr_b = 200*500000/400 = 250000 (25%)
    val docs = ((0L until 100L).map(i => (i, "a")) ++ (100L until 500L).map(i => (i, "b")))
      .toDF("doc_id", "dom")
    val out = TextAnalysis.mixtureSample(docs, "doc_id", "dom",
      Map("a" -> 500000L, "b" -> 500000L)).cache()
    val byDom = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom("a") == 100L, s"binding domain must keep everything: $byDom")
    // b accepts hash%1e6 < 250000: expectation 100, binomial spread
    assert(byDom("b") > 60L && byDom("b") < 140L, s"b should thin to ~25%: $byDom")
    // deterministic: identical row set on re-run
    val again = TextAnalysis.mixtureSample(docs, "doc_id", "dom",
      Map("a" -> 500000L, "b" -> 500000L))
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    out.unpersist()
  }

  test("mixtureSample: domains absent from the weight map drop entirely") {
    val docs = Seq((1L, "keep"), (2L, "drop"), (3L, "keep")).toDF("doc_id", "dom")
    val out = TextAnalysis.mixtureSample(docs, "doc_id", "dom", Map("keep" -> 1000000L))
    assert(out.select("dom").distinct().as[String].collect().toSeq == Seq("keep"))
  }

  test("qualityGate: every rule fires with its reason, clean docs pass") {
    val docs = Seq(
      (1L, "the of and in to is a short"), // 8 tokens < 20 -> too_short
      (2L, ("the quick brown fox jumps over lazy dogs while many other animals watch " +
        "from distant hills and valleys beyond the horizon today quietly").trim), // passes
      (3L, Seq.fill(30)("word").mkString(" ")), // repetitive + low_stopword
      (4L, ("the " * 25).trim) // 25 tokens, rep = 1-1/25 -> repetitive (stopwords fine)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityGate(docs, "doc_id", "text",
      minTokens = 20, maxTokens = 100, maxRepetition = 0.6, minStopRatio = 0.04)
      .as[(Long, String, Boolean)].collect().sortBy(_._1).toSeq
    assert(out(0)._2 == "too_short" && !out(0)._3, out(0))
    assert(out(1)._2 == "" && out(1)._3, out(1))
    assert(out(2)._2 == "repetitive,low_stopword" && !out(2)._3, out(2))
    assert(out(3)._2 == "repetitive" && !out(3)._3, out(3))
  }

  test("normalize: NFC composes combining marks; NFKC folds ligatures; accents strip; ASCII untouched") {
    val decomposed = "e\u0301te\u0301" // e + COMBINING ACUTE, twice
    val composed = "\u00e9t\u00e9"     // NFC
    val docs = Seq(
      (1L, decomposed),
      (2L, "\uFB01nance"), // fi ligature
      (3L, "plain ascii stays"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val nfc = TextAnalysis.normalize(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(nfc(1L) == composed)
    assert(nfc(2L) == "\uFB01nance") // NFC keeps compatibility chars
    assert(nfc(3L) == "plain ascii stays")
    assert(nfc(4L) == null)
    val nfkc = TextAnalysis.normalize(docs, "doc_id", "text", nfkc = true)
      .as[(Long, String)].collect().toMap
    assert(nfkc(2L) == "finance") // ligature folds
    val stripped = TextAnalysis.normalize(docs, "doc_id", "text", stripAccents = true)
      .as[(Long, String)].collect().toMap
    assert(stripped(1L) == "ete")
  }

  test("scrubPii replaces emails, IPs and phone shapes with typed tokens") {
    val docs = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org today"),
      (2L, "server 192.168.001.1 and backup 10.0.0.7"),
      (3L, "call +1 555 867-5309 now"),
      (4L, "nothing to hide here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubPii(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "mail me at <EMAIL> today")
    assert(out(2L) == "server <IP> and backup <IP>")
    assert(out(3L).contains("<PHONE>") && !out(3L).exists(_.isDigit), out(3L))
    assert(out(4L) == "nothing to hide here")
  }

  test("datasetSplit: ppm-exact, deterministic, roughly proportioned") {
    val docs = spark.range(20000).toDF("doc_id")
    val out = TextAnalysis.datasetSplit(docs, "doc_id", trainPpm = 800000L, valPpm = 100000L)
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts("train") > 15000 && counts("train") < 17000, counts.toString)
    assert(counts("val") > 1600 && counts("val") < 2400, counts.toString)
    assert(counts("test") > 1600 && counts("test") < 2400, counts.toString)
    // deterministic re-derivation: same assignment on every call
    val again = TextAnalysis.datasetSplit(docs, "doc_id", trainPpm = 800000L, valPpm = 100000L)
    assert(out.exceptAll(again).isEmpty)
  }

  test("normalize round-trips through the nimble format (canonicalized text is what lands on disk)") {
    val dir = tmpDir("norm-rt")
    Seq((1L, "é"), (2L, "ok")).toDF("doc_id", "text")
      .write.format("nimble").mode("overwrite").save(dir)
    val norm = TextAnalysis.normalize(
      spark.read.format("nimble").load(dir), "doc_id", "text")
    norm.write.format("nimble").mode("overwrite").save(dir + "-n")
    val back = spark.read.format("nimble").load(dir + "-n")
      .as[(Long, String)].collect().toMap
    assert(back(1L) == "\u00e9" && back(2L) == "ok")
  }

  test("unigramSurprisal: binary-digit surprisal matches a driver-side replay; rare > common") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the the the the"),
      (3L, "zyzzyva qwertyuiop")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // driver replay
    val toks = Seq(1L -> "the cat sat on the mat", 2L -> "the the the the",
      3L -> "zyzzyva qwertyuiop").flatMap { case (d, t) =>
      t.toLowerCase.split("\\s+").map(d -> _) }
    val counts = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val total = toks.size.toLong
    def len2(n: Long) = java.lang.Long.toBinaryString(n).length.toLong
    val want = toks.groupBy(_._1).map { case (d, ws) =>
      val bits = ws.map { case (_, w) => len2(total) - len2(counts(w)) }
      d -> ((ws.size.toLong, bits.sum, bits.sum.toDouble / ws.size))
    }
    assert(got == want, s"got $got want $want")
    // the all-stopword doc scores lower than the rare-vocab doc
    assert(got(2L)._3 < got(3L)._3)
  }
}
