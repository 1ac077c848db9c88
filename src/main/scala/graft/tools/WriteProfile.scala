package graft.tools

import graft.format._

/** Write-path stage profiler (no Spark): per-pattern cost split between
  * stats collection, candidate encoding, and chunk compression — locates
  * which stage of the encode pipeline eats the write budget. */
object WriteProfile {
  private def time(iters: Int)(body: => Unit): Double = {
    body; body
    val t0 = System.nanoTime()
    var k = 0
    while (k < iters) { body; k += 1 }
    (System.nanoTime() - t0) / 1e9 / iters
  }

  def main(args: Array[String]): Unit = {
    val n = 16384 // one writer chunk
    val rnd = new scala.util.Random(42)
    val patterns: Seq[(String, Array[Long])] = Seq(
      "constant" -> Array.fill(n)(42L),
      "narrow8" -> Array.fill(n)(rnd.nextInt(256).toLong),
      "random" -> Array.fill(n)(rnd.nextLong()),
      "increasing" -> { var v = 0L; Array.tabulate(n) { _ => v += rnd.nextInt(8); v } },
      "lowcard64" -> { val a = Array.fill(64)(rnd.nextLong()); Array.fill(n)(a(rnd.nextInt(64))) },
      "orderkey_like" -> Array.tabulate(n)(i => (i / 4).toLong * 8 + 1),
      "price_like" -> Array.fill(n)((90000 + rnd.nextInt(1000000)).toLong))
    println(f"${"pattern"}%-14s ${"encode ns/el"}%14s ${"zstd ns/el"}%12s")
    for ((name, data) <- patterns) {
      val col = LongsCol(data, PhysType.I64)
      val enc = time(50) { val s = new ByteSink(); Codecs.encodeColumn(col, s) }
      val sink = new ByteSink(); Codecs.encodeColumn(col, sink)
      val bytes = sink.toArray
      val comp = time(50) { Tablet.compressChunk(bytes, "zstd") }
      println(f"$name%-14s ${enc * 1e9 / n}%14.1f ${comp * 1e9 / n}%12.1f")
    }
    // doubles (price columns are double in lineitem)
    val dcol = DoublesCol(Array.fill(n)(90000 + rnd.nextInt(1000000) / 100.0), isFloat = false)
    val dEnc = time(50) { val s = new ByteSink(); Codecs.encodeColumn(dcol, s) }
    println(f"${"double_price"}%-14s ${dEnc * 1e9 / n}%14.1f")
    // strings (returnflag-like low-card)
    val flags = Array.tabulate(n)(i => Seq("A", "N", "R")(i % 3))
    val offs = new Array[Int](n + 1)
    val bb = new java.io.ByteArrayOutputStream()
    for (i <- 0 until n) { val b = flags(i).getBytes; bb.write(b); offs(i + 1) = offs(i) + b.length }
    val scol = BytesCol(offs, bb.toByteArray)
    val sEnc = time(50) { val s = new ByteSink(); Codecs.encodeColumn(scol, s) }
    println(f"${"string_flag"}%-14s ${sEnc * 1e9 / n}%14.1f")
  }
}

/** Isolate the stats-pass cost: replicate LongStats' loops on locals. */
object StatsProfile {
  def main(args: Array[String]): Unit = {
    val n = 16384
    val values = Array.fill(n)(scala.util.Random.nextInt(256).toLong)
    def pass(): Long = {
      var min = Long.MaxValue; var max = Long.MinValue
      var runCount = 1
      var dMin = Long.MaxValue; var dMax = Long.MinValue
      var deltaOverflow = false
      var varintBytes = 0L
      var bmCandidate = 0L; var bmCount = 0
      var prev = 0L
      var i = 0
      while (i < n) {
        val v = values(i)
        if (v < min) min = v
        if (v > max) max = v
        val zz = (v << 1) ^ (v >> 63)
        varintBytes += (if (zz == 0) 1 else (70 - java.lang.Long.numberOfLeadingZeros(zz)) / 7)
        if (bmCount == 0) { bmCandidate = v; bmCount = 1 }
        else if (v == bmCandidate) bmCount += 1
        else bmCount -= 1
        if (i > 0) {
          if (v != prev) runCount += 1
          val d = v - prev
          if (((v ^ prev) & (v ^ d)) < 0) deltaOverflow = true
          if (d < dMin) dMin = d
          if (d > dMax) dMax = d
        }
        prev = v
        i += 1
      }
      varintBytes + min + max + runCount + dMin + dMax + (if (deltaOverflow) 1 else 0) + bmCount
    }
    var sink = 0L
    sink += pass(); sink += pass()
    val t0 = System.nanoTime()
    var k = 0
    while (k < 200) { sink += pass(); k += 1 }
    val sec = (System.nanoTime() - t0) / 1e9 / 200
    println(f"local-vars stats pass: ${sec * 1e9 / n}%.1f ns/el (sink=$sink)")
  }
}

