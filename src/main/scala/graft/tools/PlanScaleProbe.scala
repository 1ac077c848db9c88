package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Planning cost over a REAL many-file listing (r19 verdict #1c):
  * PlanScaleSpec proves the one-footer-read-per-file invariant structurally
  * at 600 synthetic files; this probe extends it to a real ~6K-file
  * directory and puts WALL seconds next to the counter evidence — the
  * driver-side planning cost a 100 TB table (10^5-10^6 files) pays is this
  * number times the file-count ratio, as long as loads stay exactly one
  * per file and evictions stay zero at the default 64K-entry cache cap.
  *
  * Files are written through the public writer (multi-row, with stats), so
  * the footer walked per file is the production shape, not a stub. Prints:
  * write wall, cold plan+execute wall (+ footer loads/evictions deltas),
  * warm replan wall (+ loads delta, expected 0), per-file cold micros.
  */
object PlanScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = ProbeEnv.cpus
    val files = args.headOption.map(_.toInt).getOrElse(6000)
    val rowsPerFile = args.drop(1).headOption.map(_.toLong).getOrElse(2000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("planscale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-probe/planscale-$files"
    graft.format.GraftIO.delete(dir, recursive = true)
    val t0 = System.nanoTime()
    // one output file per partition: `files` partitions of `rowsPerFile` rows
    spark.range(files.toLong * rowsPerFile)
      .select(col("id"), (col("id") % 997).cast("double").as("v"),
        md5(col("id").cast("string")).as("s"))
      .repartition(files, col("id"))
      .write.format("nimble").mode("overwrite").save(dir)
    val writeSec = (System.nanoTime() - t0) / 1e9
    val actualFiles = graft.spark.NimbleSource.listFiles(dir).length
    // cold: fresh JVM, nothing cached — this plan+execute pays one footer
    // read per file plus the scan of `files` single-chunk streams
    val loads0 = graft.spark.NimbleSource.footerLoads.get()
    val evict0 = graft.spark.NimbleSource.footerEvictions.get()
    val t1 = System.nanoTime()
    val n1 = spark.read.format("nimble").load(dir)
      .filter(col("v") >= 0.0).agg(count(lit(1))).head().getLong(0)
    val coldSec = (System.nanoTime() - t1) / 1e9
    val coldLoads = graft.spark.NimbleSource.footerLoads.get() - loads0
    val coldEvict = graft.spark.NimbleSource.footerEvictions.get() - evict0
    // warm: a re-plan + re-execute answers every footer from the cache
    val t2 = System.nanoTime()
    val n2 = spark.read.format("nimble").load(dir)
      .filter(col("v") < 997.0).agg(count(lit(1))).head().getLong(0)
    val warmSec = (System.nanoTime() - t2) / 1e9
    val warmLoads = graft.spark.NimbleSource.footerLoads.get() - loads0 - coldLoads
    require(n1 == files.toLong * rowsPerFile && n2 == n1, s"row drift: $n1 / $n2")
    println(f"planscale files=$actualFiles rows_per_file=$rowsPerFile " +
      f"write_sec=$writeSec%.2f cold_sec=$coldSec%.3f warm_sec=$warmSec%.3f " +
      f"cold_footer_loads=$coldLoads cold_evictions=$coldEvict warm_footer_loads=$warmLoads " +
      f"cold_us_per_file=${coldSec * 1e6 / math.max(1, actualFiles)}%.1f")
    spark.stop()
  }
}
