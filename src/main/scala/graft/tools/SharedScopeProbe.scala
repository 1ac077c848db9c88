package graft.tools

/** Measures what FILE-scoped shared dictionaries would save over the
  * shipped stripe scope (r15 VERDICT missing #3): writes a multi-stripe
  * low-cardinality string table through the real writer and accounts the
  * alphabet frames (chunk-directory entries with isData=false) against
  * total stream bytes. File scope would keep ONE alphabet frame per file
  * (stripe 0's); every later stripe's frame is the saving. */
object SharedScopeProbe {
  def main(args: Array[String]): Unit = {
    import graft.format._
    val rows = args.headOption.map(_.toInt).getOrElse(2000000)
    val stripeRows = args.lift(1).map(_.toInt).getOrElse(200000)
    val dir = java.nio.file.Files.createTempDirectory("sharedscope").toFile
    val path = s"${dir.getAbsolutePath}/t.gft"
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType))).json
    // 512-entry alphabet of realistic tag-like strings, zipf-ish skew
    val alpha = (0 until 512).map(i => f"category/subsystem-$i%03d/component-tag")
    val rnd = new scala.util.Random(7)
    val w = new Tablet.Writer(path, schemaJson, Array("s"), compression = "zstd")
    var written = 0
    while (written < rows) {
      val n = math.min(16384, rows - written)
      val offs = new Array[Int](n + 1)
      val sink = new ByteSink()
      var i = 0
      while (i < n) {
        val v = alpha(if (rnd.nextInt(4) == 0) rnd.nextInt(512) else rnd.nextInt(32))
        sink.writeBytes(v.getBytes("UTF-8")); offs(i + 1) = sink.size; i += 1
      }
      w.writeChunk(0, BytesCol(offs, sink.toArray))
      w.addRows(n.toLong)
      written += n
      if (written / stripeRows > (written - n) / stripeRows) w.flushStripe()
    }
    w.close()
    val r = new Tablet.Reader(path)
    try {
      val ft = r.footer
      var alphaFrames = 0
      var alphaBytes = 0L
      var streamBytes = 0L
      for (s <- ft.stripes.indices) {
        val loc = r.streamLoc(s, 0)
        streamBytes += loc.length
        val des = r.dirEntries(s / ft.groupSize, 0)(s % ft.groupSize)
        if (des != null && des.chunks != null) {
          val cl = des.chunks
          for (j <- cl.indices if !cl(j).isData) {
            alphaFrames += 1
            val end = if (j + 1 < cl.length) cl(j + 1).offset else loc.length
            alphaBytes += end - cl(j).offset
          }
        }
      }
      val total = new java.io.File(path).length()
      val saving = alphaBytes - (if (alphaFrames > 0) alphaBytes / alphaFrames else 0L)
      println(f"shared_scope rows=$rows stripes=${ft.stripes.length} alpha_frames=$alphaFrames " +
        f"alpha_bytes=$alphaBytes stream_bytes=$streamBytes file_bytes=$total " +
        f"file_scope_saving=$saving (${saving.toDouble * 100 / total}%.3f%% of file)")
    } finally r.close()
  }
}
