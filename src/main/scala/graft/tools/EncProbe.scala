package graft.tools

import graft.format._

/** Scratch probe: encode cost of random-hex string chunks (the scale-bench
  * key shape) — isolates bytes-codec candidate-search cost per chunk. */
object EncProbe {
  def main(args: Array[String]): Unit = {
    val n = 16384
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = new ByteSink()
    val offsets = new Array[Int](n + 1)
    for (i <- 0 until n) {
      val s = md.digest(("k" + i).getBytes("UTF-8")).map("%02x".format(_)).mkString
      bytes.writeBytes(s.getBytes("UTF-8")); offsets(i + 1) = bytes.size
    }
    val col = BytesCol(offsets, bytes.toArray)
    for (_ <- 0 until 3) { val s = new ByteSink(); Codecs.encodeColumn(col, s) }
    for (_ <- 0 until 3) {
      val t0 = System.nanoTime()
      var k = 0
      while (k < 10) { val s = new ByteSink(); Codecs.encodeColumn(col, s); k += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"encode 10x$n rows: $sec%.3f s  (${sec / 10 / n * 1e9}%.0f ns/row)")
    }
    val s = new ByteSink(); Codecs.encodeColumn(col, s)
    val enc = s.toArray
    println(f"encoded ${enc.length} bytes for ${bytes.size} raw (${enc.length.toDouble / bytes.size}%.3f)")
    val (_, view) = Codecs.withView(Codecs.decodeColumn(new ByteCursor(enc)))
    def show(v: Codecs.ViewNode, ind: String): Unit = {
      println(s"$ind id=${v.id} phys=${v.phys} rows=${v.rows}")
      v.children.foreach(show(_, ind + "  "))
    }
    view.foreach(show(_, "  "))
  }
}
