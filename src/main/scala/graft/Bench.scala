package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.format._

/** Headline benchmarks (BASELINE.md engine benchmark plan): write throughput,
  * full scan vs the built-in parquet reader, pruned scan (pushdown win),
  * stats-answerable aggregates, encoded size ratio, per-codec grid on the
  * reference's benchmark patterns (reference:
  * dwio/nimble/encodings/benchmarks/README.md).
  *
  * Prints ONE JSON line {"metric":"total","value":N,"unit":"sec",
  * "queries":{...},"sf":...}. Seconds for timings; *_ratio and *_nspe entries
  * are dimensionless/ns-per-element metrics riding in the same map.
  */
object Bench {
  private def time[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  /** Warm once (codegen + JIT + footer caches), then report the median AND
    * min of five timed runs — steady-state cost with outlier (GC/compile/
    * co-tenant load) rejection, so round-over-round deltas are attributable
    * to code changes, not noise. Five because single-query 2-20x spikes from
    * other processes on the box routinely survive a median of three; the min
    * rides along because a SUSTAINED co-tenant spike covering all five
    * repeats survives any median (it happened in round 7) — min vs median
    * divergence is the detectable signature. */
  private[graft] def timeWarmStats[A](body: => A): (Double, Double, A) = {
    body
    val ts = new Array[Double](5)
    var r: A = null.asInstanceOf[A]
    var i = 0
    while (i < ts.length) {
      val (t, x) = time(body)
      ts(i) = t; r = x; i += 1
    }
    java.util.Arrays.sort(ts)
    (ts(2), ts(0), r)
  }

  /** A metric is suspect when even its best repeat sits far from the median:
    * >2x ratio plus an absolute gap floor (so micro-timings' scheduler
    * jitter doesn't trip it — 10 ms for seconds metrics, 0.5 ns/el for the
    * codec grid). On a healthy box min and median of five warmed runs track
    * within tens of percent; a sustained external load inflates both but
    * never equally. */
  private[graft] def isLoadSuspect(min: Double, median: Double, floor: Double = 0.010): Boolean =
    median > 2.0 * min && median - min > floor

  private def dirBytes(path: String): Long = {
    val f = new java.io.File(path)
    if (f.isFile) f.length()
    else if (f.isDirectory) f.listFiles().map(dirBytes_).sum
    else 0L
  }
  private def dirBytes_(f: java.io.File): Long =
    if (f.isFile) f.length() else if (f.isDirectory) f.listFiles().map(dirBytes_).sum else 0L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val mins = scala.collection.mutable.LinkedHashMap[String, Double]()
    // record a timed metric: median under the plain name, min alongside
    def timed[A](name: String)(body: => A): A = {
      val (med, mn, r) = timeWarmStats(body)
      results(name) = med
      mins(name) = mn
      r
    }

    // ---- write throughput: parquet -> nimble conversion of lineitem ----
    // Timed region = the write alone: the source is cached and pre-shuffled
    // into the cluster write shape (one file per task), and both writers get
    // a small untimed JIT warmup — steady-state throughput, mirroring
    // timeWarm on the scans.
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val li = li0.repartition(cpus.toInt).cache()
    val liRows = li.count()
    val nimbleLi = s"${System.getProperty("java.io.tmpdir")}/graft-bench/lineitem"
    // The write stack (codec candidate search + selection) is deep Scala that
    // takes several invocations to reach C2-compiled steady state; a single
    // untimed warmup still measures tier-1 code (observed: iterations 2-4 run
    // 0.15-0.38s, steady state 0.09-0.11s). Both writers get the same extra
    // warm passes — the metric is steady-state throughput, which is what a
    // long-running ingest job sees.
    for (_ <- 0 until 3) li.write.format("nimble").mode("overwrite").save(nimbleLi)
    timed("write_lineitem") {
      li.write.format("nimble").mode("overwrite").save(nimbleLi)
    }
    val wSec = results("write_lineitem")
    results("write_rows_per_sec") = liRows / wSec
    val pqDir = s"${System.getProperty("java.io.tmpdir")}/graft-bench/lineitem-parquet"
    for (_ <- 0 until 3) li.write.mode("overwrite").parquet(pqDir)
    timed("write_parquet_sec") {
      li.write.mode("overwrite").parquet(pqDir)
    }
    results("write_vs_parquet_ratio") = wSec / results("write_parquet_sec")

    // pre-convert the rest (not timed per-table)
    for (t <- Seq("orders", "customer", "documents", "embeddings", "events"))
      Tables.nimbleDir(spark, sfDir, t)

    val nb = spark.read.format("nimble").load(nimbleLi)
    // layout-matched parquet control: the same 32-file write as the nimble
    // table, so scan ratios compare format decode cost, not task-count
    // overhead of 32 small files vs the driver's single original file (that
    // single-file number is still reported as *_parquet_1file)
    val pq = spark.read.parquet(s"${System.getProperty("java.io.tmpdir")}/graft-bench/lineitem-parquet")

    // ---- scans ----
    def fullScan(df: DataFrame): Long =
      df.agg(sum("l_extendedprice"), sum("l_quantity"), count(lit(1))).collect()(0).getLong(2)
    timed("scan_full_nimble")(fullScan(nb))
    timed("scan_full_parquet")(fullScan(pq))
    timed("scan_full_parquet_1file")(fullScan(li))
    results("scan_full_vs_parquet_ratio") = results("scan_full_nimble") / results("scan_full_parquet")

    def prunedScan(df: DataFrame): Long =
      df.filter(col("l_quantity") > 45).select("l_orderkey", "l_quantity")
        .agg(count(lit(1))).collect()(0).getLong(0)
    timed("scan_pruned_nimble")(prunedScan(nb))
    timed("scan_pruned_parquet")(prunedScan(pq))
    timed("scan_pruned_parquet_1file")(prunedScan(li))

    // ---- stats-answerable aggregate ----
    timed("agg_from_stats") {
      nb.agg(count(lit(1)), min("l_orderkey"), max("l_orderkey"),
        min("l_quantity"), max("l_quantity")).collect()
    }

    // ---- index-assisted point probe (SelectiveNimbleIndexReader in the
    // DSv2 path): same data + layout, with and without a hash index; keys
    // hash-scrambled so stats/bloom-era chunk skipping is blind and the
    // delta isolates index-driven chunk selection ----
    val ordScrambled = spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("okey", expr("xxhash64(o_orderkey)"))
    val ordIdxDir = s"${System.getProperty("java.io.tmpdir")}/graft-bench/orders-idx"
    val ordNoIdxDir = s"${System.getProperty("java.io.tmpdir")}/graft-bench/orders-noidx"
    ordScrambled.coalesce(4).write.format("nimble")
      .option("indexColumns", "okey").option("rowsPerChunk", "4096")
      .mode("overwrite").save(ordIdxDir)
    ordScrambled.coalesce(4).write.format("nimble")
      .option("rowsPerChunk", "4096").mode("overwrite").save(ordNoIdxDir)
    val probeKey = ordScrambled.select("okey").limit(1).collect()(0).getLong(0)
    // wall time at this scale is dominated by fixed Spark job overhead; the
    // chunk-skip counter delta is the noise-free signal that the index
    // restricted decode (skips per single probe run, not per timed repeat)
    val skipped0 = graft.spark.NimbleSource.chunksSkipped.get()
    spark.read.format("nimble").load(ordIdxDir).filter(col("okey") === probeKey).count()
    results("point_probe_chunks_skipped") =
      (graft.spark.NimbleSource.chunksSkipped.get() - skipped0).toDouble
    timed("point_probe_indexed") {
      spark.read.format("nimble").load(ordIdxDir).filter(col("okey") === probeKey).count()
    }
    timed("point_probe_scan") {
      spark.read.format("nimble").load(ordNoIdxDir).filter(col("okey") === probeKey).count()
    }

    // ---- encoded size ----
    results("size_nimble_bytes") = dirBytes(nimbleLi).toDouble
    results("size_parquet_bytes") = dirBytes(s"$sfDir/lineitem.parquet").toDouble
    results("encoded_size_ratio") = results("size_nimble_bytes") / results("size_parquet_bytes")

    // ---- headline queries over the connector ----
    val headline = Seq("q13_tpch_q1", "q14_tpch_q6", "q15_join_agg", "q16_window",
      "x01_dedup_fingerprint", "x02_neardup_jaccard", "x05_embed_topk", "x07_text_quality")
    for (name <- headline) {
      val fn = SparkEntry.queries(name)
      // warm plan + conversion outside the timed region
      fn(spark, sfDir).limit(1).collect()
      timed(name)(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    }

    // ---- codec grid (ns/element, encode+decode on 100K longs) ----
    val n = 100000
    val rnd = new scala.util.Random(42)
    val patterns: Seq[(String, Array[Long])] = Seq(
      "random" -> Array.fill(n)(rnd.nextLong()),
      "narrow8" -> Array.fill(n)(rnd.nextInt(256).toLong),
      "constant" -> Array.fill(n)(42L),
      "mainly_const" -> Array.tabulate(n)(i => if (rnd.nextInt(100) < 95) 7L else rnd.nextLong()),
      "runlength" -> {
        val a = new Array[Long](n); var i = 0
        while (i < n) { val v = rnd.nextInt(50).toLong; val run = math.min(10 + rnd.nextInt(50), n - i)
          java.util.Arrays.fill(a, i, i + run, v); i += run }
        a
      },
      "increasing" -> { var v = 0L; Array.tabulate(n) { _ => v += rnd.nextInt(8); v } },
      "lowcard64" -> { val alpha = Array.fill(64)(rnd.nextLong()); Array.fill(n)(alpha(rnd.nextInt(64))) })
    for ((pname, data) <- patterns) {
      val col = LongsCol(data, PhysType.I64)
      val sink0 = new ByteSink(); Codecs.encodeColumn(col, sink0)
      val bytes = sink0.toArray
      val iters = 20
      // median+min of 5 passes (2 warmup) — GC pauses and JIT recompiles land
      // in single-shot numbers and made this metric bounce across rounds
      def statsPass(body: => Unit): (Double, Double) = {
        def pass(): Double = time { var k = 0; while (k < iters) { body; k += 1 } }._1
        pass(); pass()
        val ts = Array.fill(5)(pass())
        java.util.Arrays.sort(ts)
        (ts(2), ts(0))
      }
      val (encSec, encMin) = statsPass { val s = new ByteSink(); Codecs.encodeColumn(col, s) }
      val (decSec, decMin) = statsPass { Codecs.decodeColumn(new ByteCursor(bytes)) }
      results(s"codec_${pname}_enc_nspe") = encSec * 1e9 / (n.toLong * iters)
      mins(s"codec_${pname}_enc_nspe") = encMin * 1e9 / (n.toLong * iters)
      results(s"codec_${pname}_dec_nspe") = decSec * 1e9 / (n.toLong * iters)
      mins(s"codec_${pname}_dec_nspe") = decMin * 1e9 / (n.toLong * iters)
      results(s"codec_${pname}_ratio") = bytes.length.toDouble / (n * 8.0)
    }

    val total = results.filter(_._1.matches("write_lineitem|scan_.*|agg_from_stats|q.*|x.*")).values.sum
    // contamination audit: flag any metric whose best-of-five still sits >2x
    // under the median (round-7's driver artifact recorded a sustained
    // co-tenant spike as a 10-25x regression; only a judge re-run caught it)
    val suspects = mins.collect {
      case (k, mn) if isLoadSuspect(mn, results(k),
        if (k.endsWith("_nspe")) 0.5 else 0.010) => k
    }.toSeq
    // codec compression ratios are deterministic (same seed, same selection):
    // any drift vs the previous round's artifact is a code change, and ratio
    // drift WITHOUT a deliberate codec change alongside timing swings means
    // the timings moved for non-code reasons
    val prevRatios = previousBenchRatios()
    val ratioDrift = results.collect {
      case (k, v) if k.endsWith("_ratio") && k.startsWith("codec_") &&
        prevRatios.get(k).exists(p => math.abs(v - p) > 1e-9) => k
    }.toSeq
    val all = results ++ mins.map { case (k, v) => (k + "_min", v) }
    val qs = all.map { case (k, v) => "\"" + k + "\":" + (if (v.isNaN || v.isInfinite) -1.0 else v) }
      .mkString("{", ",", "}")
    val suspectJson = suspects.map("\"" + _ + "\"").mkString("[", ",", "]")
    val driftJson = ratioDrift.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""load_suspect":${suspects.nonEmpty},"suspect_metrics":$suspectJson,""" +
      s""""codec_ratio_drift":$driftJson,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Codec ratios from the newest committed BENCH_r*.json, for the
    * drift-vs-previous-round assertion; empty when none is readable. */
  private[graft] def previousBenchRatios(dir: String = "."): Map[String, Double] = {
    try {
      val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.matches("BENCH_r\\d+\\.json"))
      if (files.isEmpty) return Map.empty
      val newest = files.maxBy(f => "\\d+".r.findFirstIn(f.getName).get.toInt)
      val text = new String(java.nio.file.Files.readAllBytes(newest.toPath), "UTF-8")
      // the driver wraps the bench line in its own JSON (quotes escaped, or
      // re-emitted with spaces) — accept both shapes
      "\"(codec_\\w+_ratio)\\\\?\":\\s*([-0-9.eE+]+)".r.findAllMatchIn(text)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Exception => Map.empty }
  }
}
