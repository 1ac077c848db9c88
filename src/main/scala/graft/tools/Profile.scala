package graft.tools

import graft.format._

/** Micro-profiler: per-column decode throughput on a tablet file, no Spark. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      s"${System.getProperty("java.io.tmpdir")}/graft-bench/lineitem")
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".gft"))
    for (_ <- 0 until 3) { // 3 passes: let JIT warm
      var totalRows = 0L
      val colTimes = scala.collection.mutable.LinkedHashMap[String, Double]()
      val t0 = System.nanoTime()
      for (f <- files) {
        val r = new Tablet.Reader(f.getPath)
        val keys = r.footer.streamKeys
        for (s <- r.footer.stripes.indices) {
          for ((k, id) <- keys.zipWithIndex) {
            val tc0 = System.nanoTime()
            val bytes = r.readStreamBytes(s, id)
            val cur = new Tablet.ChunkCursor(bytes)
            var rows = 0L
            while (cur.hasNext) rows += cur.next().len
            colTimes(k) = colTimes.getOrElse(k, 0.0) + (System.nanoTime() - tc0) / 1e9
            if (id == 0) totalRows += rows
          }
        }
        r.close()
      }
      val total = (System.nanoTime() - t0) / 1e9
      println(f"pass: $totalRows rows in $total%.3fs (${totalRows / total / 1e6}%.1f Mrows/s)")
      colTimes.toSeq.sortBy(-_._2).foreach { case (k, t) => println(f"  $k%-20s ${t * 1000}%8.1f ms") }
    }
  }
}
