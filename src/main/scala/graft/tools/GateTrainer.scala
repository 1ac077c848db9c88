package graft.tools

import graft.format._

/** Offline trainer for [[Codecs.LearnedTrivialGate]] (reference hook:
  * dwio/nimble/encodings/selection/EncodingSelectionPolicy.h:339 —
  * LearnedEncodingSelectionPolicy takes model parameters trained outside
  * the write path).
  *
  * Method: generate a labeled corpus of long chunks across the engine's
  * benchmark pattern families (and adversarial variants), label each chunk
  * by running the REAL cost-based search — "skip-safe" iff the search's
  * winner saves < 3% vs Trivial — then grid-search positive weight vectors,
  * setting each candidate's bias to the largest value that fires on ZERO
  * compressible chunks (a safety margin below the hardest negative). The
  * committed weights are the recall-maximizing safe vector, so the gate can
  * never cost size on shapes it was trained on; it only skips searches the
  * search itself would have wasted.
  *
  * Run: tools/run_main.sh graft.tools.GateTrainer — prints the corpus
  * stats, the chosen weights, and their hit-rate, ready to paste into the
  * LearnedTrivialGate defaults.
  */
object GateTrainer {

  final case class Example(name: String, runFr: Double, uniqueFr: Double,
      widthFr: Double, deltaFr: Double, skipSafe: Boolean)

  /** Labeled corpus across pattern families x sizes x seeds. */
  def corpus(): Seq[Example] = {
    val out = scala.collection.mutable.ArrayBuffer[Example]()
    for (seed <- Seq(1, 7, 42); n <- Seq(1024, 4096, 16384)) {
      val rnd = new scala.util.Random(seed)
      def add(name: String, values: Array[Long], phys: Byte = PhysType.I64): Unit = {
        val sink = new ByteSink()
        Codecs.encodeColumn(LongsCol(values, phys), sink)
        val trivial = values.length.toLong * PhysType.byteWidth(phys) + 8
        val skipSafe = sink.size >= 0.97 * trivial
        val (r, u, w, d) = Codecs.longGateFeatures(values, phys)
        out += Example(s"$name/n=$n/s=$seed", r, u, w, d, skipSafe)
      }
      add("random64", Array.fill(n)(rnd.nextLong()))
      add("random63", Array.fill(n)(rnd.nextLong() >>> 1))
      for (w <- Seq(8, 16, 24, 32, 40, 48, 56))
        add(s"randomW$w", Array.fill(n)(rnd.nextLong() >>> (64 - w)))
      add("randomNeg", Array.fill(n)(rnd.nextLong() | Long.MinValue))
      add("hash64", Array.tabulate(n)(i => java.lang.Long.rotateLeft(i.toLong * 0x9E3779B97F4A7C15L, 17)))
      add("narrow8", Array.fill(n)(rnd.nextInt(256).toLong))
      add("lowcard64", { val a = Array.fill(64)(rnd.nextLong()); Array.fill(n)(a(rnd.nextInt(64))) })
      add("lowcard4k", { val a = Array.fill(4096)(rnd.nextLong()); Array.fill(n)(a(rnd.nextInt(4096))) })
      add("zipf64", { val a = Array.fill(64)(rnd.nextLong())
        Array.fill(n) { val r = rnd.nextDouble()
          a(if (r < 0.5) 0 else if (r < 0.75) 1 else if (r < 0.875) 2 else rnd.nextInt(64)) } })
      add("mainlyConst", Array.tabulate(n)(i => if (rnd.nextInt(100) < 95) 7L else rnd.nextLong()))
      add("runlength", { val a = new Array[Long](n); var i = 0
        while (i < n) { val v = rnd.nextInt(50).toLong
          val run = math.min(10 + rnd.nextInt(50), n - i)
          java.util.Arrays.fill(a, i, i + run, v); i += run }; a })
      add("increasing", { var v = 0L; Array.fill(n) { v += rnd.nextInt(8); v } })
      add("sortedWide", { var v = 0L; Array.fill(n) { v += rnd.nextLong() >>> 20; v } })
      add("timestampsUs", { var v = 1700000000000000L
        Array.fill(n) { v += 500000L + rnd.nextInt(1000000); v } })
      add("sortedRandom", { val a = Array.fill(n)(rnd.nextLong()); java.util.Arrays.sort(a); a })
      add("outliers", Array.tabulate(n)(i =>
        if (rnd.nextInt(50) == 0) rnd.nextLong() else rnd.nextInt(1024).toLong))
      add("clusteredIds", Array.tabulate(n)(i => (i / 100).toLong * 1000000L + rnd.nextInt(1000)))
      add("random32asI32", Array.fill(n)(rnd.nextInt().toLong), PhysType.I32)
      add("narrowInI32", Array.fill(n)(rnd.nextInt(4096).toLong), PhysType.I32)
    }
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val ex = corpus()
    val pos = ex.filter(_.skipSafe)
    val neg = ex.filterNot(_.skipSafe)
    println(s"corpus: ${ex.size} chunks, ${pos.size} skip-safe, ${neg.size} compressible")

    def score(e: Example, w: Array[Double]): Double =
      w(0) * e.runFr + w(1) * e.uniqueFr + w(2) * e.widthFr + w(3) * e.deltaFr

    val grid = Seq(0.5, 1.0, 1.5, 2.0, 2.5, 3.0)
    var best: (Array[Double], Double, Int) = null
    for (a <- grid; b <- grid; c <- grid; d <- grid) {
      val w = Array(a, b, c, d)
      // the largest bias firing on zero negatives, with a 2% relative margin
      val hardestNeg = neg.map(score(_, w)).max
      val bias = -(hardestNeg + 0.02 * (a + b + c + d))
      val hits = pos.count(e => score(e, w) + bias > 0)
      if (best == null || hits > best._3) best = (w :+ bias, bias, hits)
    }
    val Array(a, b, c, d, bias) = best._1
    println(f"weights: runW=$a%.2f uniqueW=$b%.2f widthW=$c%.2f deltaW=$d%.2f bias=$bias%.4f")
    println(f"recall on skip-safe: ${best._3}/${pos.size} (${100.0 * best._3 / pos.size}%.1f%%), false fires: 0 by construction")
    // show the misses for feature-gap analysis
    val w = best._1
    for (e <- pos if score(e, w.take(4)) + w(4) <= 0)
      println(f"  miss: ${e.name}%-28s run=${e.runFr}%.2f uniq=${e.uniqueFr}%.2f width=${e.widthFr}%.2f delta=${e.deltaFr}%.2f")
    for (e <- neg.sortBy(x => -score(x, w.take(4))).take(5))
      println(f"  hardest negative: ${e.name}%-28s score=${score(e, w.take(4)) + w(4)}%.3f")
  }
}
