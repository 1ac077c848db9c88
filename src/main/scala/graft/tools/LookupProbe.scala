package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.format.Lookup

/** Batch-lookup scale probe (r16 verdict #6): drive the batch point-lookup
  * surface with 1K / 10K / 100K keys against an indexed sf0.1-scale table
  * and print, per batch size, wall seconds, per-key microseconds,
  * rowsDecoded vs hits, and index probes. The contracts this demonstrates:
  *   - rowsDecoded ~ hit-count at every batch size (index traversal +
  *     positional decode, never a scan),
  *   - per-key cost FALLS as the batch grows (footer/stats/bloom/index
  *     loads amortize over the batch — the per-probe surface re-paid them
  *     for every key), so wall time is sublinear in keys.
  * COVERAGE quotes the output; LookupScaleSpec pins the correctness side. */
object LookupProbe {
  def main(args: Array[String]): Unit = {
    val cpus = ProbeEnv.cpus
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("lookup-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-lprobe"
    val dir = s"$base/orders-idx"
    // orders at sf0.1: 150K rows, unique long o_orderkey — written as 4
    // files x multiple stripes so the batch pays real per-file/stripe costs
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    orders.repartition(4).write.format("nimble").mode("overwrite")
      .option("indexColumns", "o_orderkey").option("bloomFilterColumns", "o_orderkey")
      .option("rowsPerChunk", "4096").option("stripeBytes", (4L << 20).toString)
      .save(dir)
    val allKeys = orders.select("o_orderkey").collect().map(_.getLong(0))
    println(s"lookup_probe table rows=${allKeys.length} files=4")
    val rnd = new scala.util.Random(42)
    val shuffled = rnd.shuffle(allKeys.toVector)
    for (k <- Seq(1000, 10000, 100000)) {
      val probes: Seq[Any] =
        (0 until k).map(i => java.lang.Long.valueOf(shuffled(i % shuffled.length)))
      // warm once at the smallest size only (JIT); each size reports min-of-2
      var best = Double.MaxValue
      var hits = 0L
      var decoded = 0L
      var idxProbes = 0L
      for (_ <- 0 until 2) {
        val t0 = System.nanoTime()
        val (res, m) = Lookup.batchPointLookupMetered(dir, "o_orderkey", probes)
        val sec = (System.nanoTime() - t0) / 1e9
        best = math.min(best, sec)
        hits = res.map(_.size.toLong).sum
        decoded = m.rowsDecoded
        idxProbes = m.indexProbes
      }
      val perKeyUs = best * 1e6 / k
      println(f"lookup_probe keys=$k%6d sec=$best%.3f perKeyUs=$perKeyUs%.1f " +
        f"hits=$hits decoded=$decoded idxProbes=$idxProbes " +
        f"decodedPerHit=${decoded.toDouble / math.max(1, hits)}%.2f")
    }
    // all-miss 100K keys (r17 verdict #8): every key above the table's max —
    // LookupScaleSpec pins zero decodes; this row carries the WALL cost of
    // pure bloom/index traversal at scale, so regressions in the miss path
    // (the common shape for decontamination anti-joins) surface in the ledger
    locally {
      val maxKey = allKeys.max
      val probes: Seq[Any] =
        (1 to 100000).map(i => java.lang.Long.valueOf(maxKey + i.toLong))
      var best = Double.MaxValue
      var hits = 0L
      var decoded = 0L
      var idxProbes = 0L
      for (_ <- 0 until 2) {
        val t0 = System.nanoTime()
        val (res, m) = Lookup.batchPointLookupMetered(dir, "o_orderkey", probes)
        val sec = (System.nanoTime() - t0) / 1e9
        best = math.min(best, sec)
        hits = res.map(_.size.toLong).sum
        decoded = m.rowsDecoded
        idxProbes = m.indexProbes
      }
      println(f"lookup_probe all-miss keys=100000 sec=$best%.3f " +
        f"perKeyUs=${best * 1e6 / 100000}%.2f hits=$hits decoded=$decoded " +
        f"idxProbes=$idxProbes")
    }
    // A/B: the pre-batch surface (one reader open + footer parse + index
    // load PER PROBE) at 1K keys — the constant the batch path amortizes
    locally {
      val probes = (0 until 1000).map(i => java.lang.Long.valueOf(shuffled(i)))
      val t0 = System.nanoTime()
      var hits = 0L
      for (p <- probes) hits += Lookup.pointLookup(dir, "o_orderkey", p).size
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"lookup_probe per-probe baseline keys=1000 sec=$sec%.3f " +
        f"perKeyUs=${sec * 1e6 / 1000}%.1f hits=$hits")
    }
    spark.stop()
  }
}
