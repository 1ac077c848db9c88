package graft.tools

import graft.format._

/** Diagnostic: dump the selected codec tree and decode cost for the bench's
  * codec-grid patterns. Not part of the library surface.
  */
object CodecProbe {
  private def codecName(id: Int): String = id.toByte match {
    case Codecs.TRIVIAL => "Trivial"
    case Codecs.RLE => "RLE"
    case Codecs.DICT => "Dict"
    case Codecs.FBW => "FBW"
    case Codecs.SENTINEL => "Sentinel"
    case Codecs.NULLABLE => "Nullable"
    case Codecs.SPARSEBOOL => "SparseBool"
    case Codecs.VARINT => "Varint"
    case Codecs.DELTA => "Delta"
    case Codecs.CONST => "Const"
    case Codecs.MAINLYCONST => "MainlyConst"
    case Codecs.PREFIX => "Prefix"
    case Codecs.PREFIXR => "PrefixRestart"
    case Codecs.ALP => "ALP"
    case Codecs.PFOR => "PFOR"
    case Codecs.SIMDFOR => "SimdForBitpack"
    case Codecs.BLOCKBP => "BlockBP"
    case Codecs.SUBINT => "SubIntSplit"
    case Codecs.FREQPART => "FreqPartition"
    case Codecs.FOR => "FOR"
    case Codecs.FSST => "FSST"
    case Codecs.HUFFMAN => "Huffman"
    case Codecs.DELTABLOCK => "DeltaBlock"
    case other => s"codec#$other"
  }

  /** Walk the self-describing chunk structure, printing codec ids of the
    * top-level stream and (for composite codecs) the sub-blocks. */
  def dumpTree(cur0: ByteCursor, indent: String = ""): Unit = {
    val cur = new ByteCursor(cur0.buf, cur0.pos, cur0.end)
    val sz = cur.remaining
    val id = cur.readByte()
    val phys = cur.readByte()
    val n = cur.readVarint()
    println(s"$indent${codecName(id)} phys=$phys n=$n ($sz B)")
    id match {
      case Codecs.RLE =>
        val runVals = cur.readBlock(); val runLens = cur.readBlock()
        print(s"$indent  runValues: "); dumpTree(runVals, indent + "  ")
        print(s"$indent  runLens:   "); dumpTree(runLens, indent + "  ")
      case Codecs.MAINLYCONST =>
        cur.readZigZag()
        val bools = cur.readBlock(); val others = cur.readBlock()
        print(s"$indent  isCommon: "); dumpTree(bools, indent + "  ")
        print(s"$indent  others:   "); dumpTree(others, indent + "  ")
      case Codecs.DICT =>
        val alpha = cur.readBlock(); val idx = cur.readBlock()
        print(s"$indent  alphabet: "); dumpTree(alpha, indent + "  ")
        print(s"$indent  indices:  "); dumpTree(idx, indent + "  ")
      case Codecs.NULLABLE =>
        val nulls = cur.readBlock(); val values = cur.readBlock()
        print(s"$indent  nulls:  "); dumpTree(nulls, indent + "  ")
        print(s"$indent  values: "); dumpTree(values, indent + "  ")
      case Codecs.SPARSEBOOL =>
        cur.readByte()
        val pos = cur.readBlock()
        print(s"$indent  positions: "); dumpTree(pos, indent + "  ")
      case Codecs.SUBINT =>
        val k = cur.readByte()
        val hi = cur.readBlock(); val lo = cur.readBlock()
        print(s"$indent  hi(>>$k): "); dumpTree(hi, indent + "  ")
        print(s"$indent  lo:       "); dumpTree(lo, indent + "  ")
      case Codecs.FREQPART =>
        val k = cur.readVarint()
        val alpha = cur.readBlock(); val codes = cur.readBlock(); val excs = cur.readBlock()
        print(s"$indent  head(K=$k): "); dumpTree(alpha, indent + "  ")
        print(s"$indent  codes:      "); dumpTree(codes, indent + "  ")
        print(s"$indent  exceptions: "); dumpTree(excs, indent + "  ")
      case _ => ()
    }
  }

  def main(args: Array[String]): Unit = {
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
      val sink = new ByteSink(); Codecs.encodeColumn(col, sink)
      val bytes = sink.toArray
      println(s"== $pname ==")
      dumpTree(new ByteCursor(bytes))
      // decode timing: median of 5 runs of 20 iters
      val iters = 20
      def onePass(): Double = {
        val t0 = System.nanoTime()
        var k = 0; while (k < iters) { Codecs.decodeColumn(new ByteCursor(bytes)); k += 1 }
        (System.nanoTime() - t0) / 1e9 * 1e9 / (n.toLong * iters)
      }
      onePass(); onePass() // warm
      val times = Array.fill(5)(onePass()).sorted
      println(f"   dec ${times(2)}%.2f ns/el  size ${bytes.length}")
    }
  }
}
