package graft.tools

import org.apache.spark.sql.SparkSession

/** Layout-matched encoded-size A/B (r15 VERDICT #4): writes lineitem at an
  * explicit output-file count and separates per-file METADATA bytes (stream
  * directory, chunk-dir stats, file stats, NDV blocks, schema, postscript)
  * from stripe DATA bytes — the question the r15 16-vs-32-file ratio
  * confusion could not answer from its artifacts. Run at several file
  * counts to see the fixed per-file costs amortize. */
object SizeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = ProbeEnv.cpus
    val fileCounts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(32, 16, 4, 1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("size-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").cache()
    li.count()
    val pqBytes = {
      val f = new java.io.File(s"$sfDir/lineitem.parquet")
      if (f.isFile) f.length else f.listFiles().filter(_.isFile).map(_.length).sum
    }
    for (nf <- fileCounts) {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-sizeprobe/li-$nf"
      li.repartition(nf).write.format("nimble").mode("overwrite").save(dir)
      var total = 0L; var data = 0L; var ndv = 0L; var nFiles = 0
      for (f <- new java.io.File(dir).listFiles() if f.getName.endsWith(".gft")) {
        val r = new graft.format.Tablet.Reader(f.getPath)
        try {
          total += f.length()
          data += r.footer.stripes.map(_.length).sum
          ndv += r.footer.ndvSketches.iterator
            .map { case (k, regs) => k.getBytes("UTF-8").length + 2 + regs.length }.sum
          nFiles += 1
        } finally r.close()
      }
      val meta = total - data
      println(f"size_probe files=$nFiles total=$total data=$data meta=$meta ndv=$ndv " +
        f"meta_frac=${meta.toDouble / total}%.5f ratio=${total.toDouble / pqBytes}%.5f " +
        f"data_ratio=${data.toDouble / pqBytes}%.5f")
    }
    spark.stop()
  }
}
