package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** Property guard for the index-entry pair sort: the stable radix-by-key
  * path must be output-identical to the comparison sort it replaced, across
  * sign boundaries, duplicate keys, and both size regimes — and the
  * monotonicity prescan must route non-ascending values back to quicksort
  * so the stability shortcut can never silently break the (key asc,
  * value asc) contract. */
class LongPairVecSpec extends AnyFunSuite {

  private def reference(pairs: Array[(Long, Long)]): Array[(Long, Long)] =
    pairs.sortBy(identity) // tuple ordering = (key asc, value asc), signed

  private def drain(v: Tablet.LongPairVec): Array[(Long, Long)] =
    Array.tabulate(v.size)(i => (v.key(i), v.value(i)))

  test("radix path (ascending values, n > 8K): identical to the reference sort") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 9000 + rnd.nextInt(30000)
      val v = new Tablet.LongPairVec()
      val raw = new Array[(Long, Long)](n)
      var pos = 0L
      var i = 0
      while (i < n) {
        // hash-like keys across the sign boundary, with heavy duplicates in
        // one trial (the equal-key band is where stability matters)
        val k = if (trial == 1) (rnd.nextInt(37) - 18).toLong * (1L << 40)
                else rnd.nextLong()
        pos += 1 + rnd.nextInt(3) // strictly ascending, like (chunk<<32|row)
        v.add(k, pos)
        raw(i) = (k, pos)
        i += 1
      }
      v.sortPairs()
      assert(drain(v).toSeq == reference(raw).toSeq, s"trial=$trial n=$n")
    }
  }

  test("small-domain keys (pass skipping) and tiny buffers (quick path)") {
    val rnd = new scala.util.Random(11)
    // small-domain: top three 16-bit digits constant -> 1-pass radix
    val v = new Tablet.LongPairVec()
    val raw = Array.tabulate(20000) { i =>
      val k = rnd.nextInt(5000).toLong
      v.add(k, i.toLong)
      (k, i.toLong)
    }
    v.sortPairs()
    assert(drain(v).toSeq == reference(raw).toSeq)
    // tiny buffer stays on the comparison sort
    val t = new Tablet.LongPairVec()
    val traw = Array.tabulate(100) { i =>
      val k = rnd.nextLong(); t.add(k, i.toLong); (k, i.toLong)
    }
    t.sortPairs()
    assert(drain(t).toSeq == reference(traw).toSeq)
  }

  test("non-monotonic values fall back to quicksort and still sort (key, value)") {
    val rnd = new scala.util.Random(13)
    val v = new Tablet.LongPairVec()
    val raw = Array.tabulate(20000) { _ =>
      val p = (rnd.nextLong(), rnd.nextLong()) // values in random order
      v.add(p._1, p._2)
      p
    }
    v.sortPairs()
    assert(drain(v).toSeq == reference(raw).toSeq)
  }
}
