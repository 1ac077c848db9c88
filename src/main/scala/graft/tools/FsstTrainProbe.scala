package graft.tools

import graft.format._

/** Single-threaded microbench of Fsst.train + the downstream sample ratio on
  * the bench's hash-shaped key sample (md5 hex), isolating trainer cost from
  * Spark/write-path noise. Reports ns per trained sample byte. */
object FsstTrainProbe {
  def main(args: Array[String]): Unit = {
    // 16 KB sample of md5 hex keys — exactly the scale_write skey shape
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new StringBuilder
    var i = 0
    while (sb.length < 16384) {
      sb.append(md.digest(s"k$i".getBytes("UTF-8")).map("%02x".format(_)).mkString)
      i += 1
    }
    val bytes = sb.toString.getBytes("ISO-8859-1")
    val len = 16384
    var iters = if (args.nonEmpty) args(0).toInt else 500
    // warmup
    var k = 0
    while (k < 100) { Fsst.train(bytes, 0, len); k += 1 }
    val t0 = System.nanoTime()
    k = 0
    var sink = 0
    while (k < iters) {
      val t = Fsst.train(bytes, 0, len)
      sink += t.symbols.length
      k += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"train: ${sec / iters * 1e6}%.1f us/call  ${sec / iters / len * 1e9}%.2f ns/byte  (symbols sink=$sink)")
    // pure matchAt loop cost (= encode-side cost per byte) + table shape
    val t = Fsst.train(bytes, 0, len)
    var s = 0.0
    k = 0
    while (k < 200) { s += Fsst.sampleRatio(t, bytes, 0, len); k += 1 }
    val t1 = System.nanoTime()
    k = 0
    while (k < 1000) { s += Fsst.sampleRatio(t, bytes, 0, len); k += 1 }
    val sec1 = (System.nanoTime() - t1) / 1e9
    println(f"sampleRatio: ${sec1 / 1000 * 1e6}%.1f us/pass  ${sec1 / 1000 / len * 1e9}%.2f ns/byte (ratio sink=${s / 1200}%.4f)")
    println("symbol lens: " + t.symbols.groupBy(_.length).toSeq.sortBy(_._1)
      .map { case (l, g) => s"len$l:${g.length}" }.mkString(" "))
  }
}
