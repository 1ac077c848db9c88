package graft

import org.apache.spark.sql.functions._

/** Stripe pruning for pushed filters over FLATMAP feature projections (r17).
  * A filter on `features.k` has no stream named `features.k` — the per-key
  * value stream `features#fm:k` bounds the present non-null values, and the
  * logical column is NULL wherever the key is absent, so its stats rebase
  * on stripe rows (`NimbleSource.dottedChildStats`). Before this, a
  * selective probe on a feature column FULL-SCANNED the table — the core
  * ML-data shape (feature-filtered scans over shredded feature maps) at
  * 100 TB. Also covers the all-null synthesis for keys a file never saw
  * and for schema-evolved struct children. */
class FlatMapPruneSpec extends SparkTestBase {

  private def fixture(): (String, Long) = {
    val dir = tmpDir("fmprune")
    // rand jitter keeps the doubles incompressible so the encoded-bytes
    // stripe flush actually produces many stripes; 'a' ascends with the row
    // id, so feature values correlate with stripes (the sorted-feed shape
    // stripe stats exploit)
    spark.sql("""
      SELECT id AS uid,
        map('a', cast(id AS double) + rand(7)*0.5, 'b', cast(id % 7 AS double)) AS features
      FROM range(200000)
    """).coalesce(1).write.format("nimble").mode("overwrite")
      .option("flatMapColumns", "features")
      .option("stripeBytes", (128L << 10).toString)
      .option("rowsPerChunk", "4096")
      .save(dir)
    val file = graft.spark.NimbleSource.listFiles(dir).head
    val r = new graft.format.Tablet.Reader(file)
    try {
      assert(r.footer.stripes.length >= 8, s"fixture needs stripes, got ${r.footer.stripes.length}")
    } finally r.close()
    (dir, 200000L)
  }

  test("a selective filter on a flatmap feature prunes stripes via the fm-stream stats") {
    val (dir, n) = fixture()
    val df = spark.read.format("nimble")
      .option("flatMapStruct.features", "a,b").load(dir)
    val d0 = graft.format.Codecs.decodedValues.get()
    val rows = df.filter(col("features.a") >= (n - 1).toDouble).select("uid").collect()
    val decoded = graft.format.Codecs.decodedValues.get() - d0
    assert(rows.length == 1 && rows.head.getLong(0) == n - 1)
    // 13-ish stripes; all but the last must have been pruned at plan time —
    // decode stays around one stripe's volume, nowhere near the table's
    assert(decoded < n / 5,
      s"decoded $decoded values for a last-stripe probe over $n rows — feature pruning dead")
    // correctness under pruning: a mid-range band returns exactly the rows
    // an unpruned in-memory filter does
    val band = df.filter(col("features.a") >= 70000.0 && col("features.a") < 70100.0)
      .select("uid").collect().map(_.getLong(0)).sorted
    val expect = df.select(col("uid"), col("features.a").as("a")).collect()
      .filter(r => r.getDouble(1) >= 70000.0 && r.getDouble(1) < 70100.0)
      .map(_.getLong(0)).sorted
    assert(band.toSeq == expect.toSeq, s"pruned band lost rows: ${band.length} vs ${expect.length}")
  }

  test("within a surviving stripe, fm-stream chunk stats skip non-matching chunks") {
    val (dir, _) = fixture()
    val df = spark.read.format("nimble")
      .option("flatMapStruct.features", "a,b").load(dir)
    // one chunk's worth of band inside one stripe: the stripe survives, and
    // its other chunks must skip via the fm stream's per-chunk stats (the
    // +1/+1 count shift keeps null-test leaves sound)
    val skipped0 = graft.spark.NimbleSource.chunksSkipped.get()
    val d0 = graft.format.Codecs.decodedValues.get()
    val b0 = graft.spark.NimbleSource.streamBytesFetched.get()
    val band = df.filter(col("features.a") >= 50000.0 && col("features.a") < 50050.0)
      .select("uid").collect().map(_.getLong(0)).sorted
    val skipped = graft.spark.NimbleSource.chunksSkipped.get() - skipped0
    val decoded = graft.format.Codecs.decodedValues.get() - d0
    val probeBytes = graft.spark.NimbleSource.streamBytesFetched.get() - b0
    assert(band.length >= 49 && band.length <= 51, s"band size drifted: ${band.length}")
    assert(band.forall(id => id >= 49999 && id <= 50050), s"band rows wrong: ${band.take(5).toSeq}")
    assert(skipped > 0, "no chunk skipped inside the surviving stripe — fm chunk stats dead")
    assert(decoded < 30000,
      s"decoded $decoded values for a one-chunk band — chunk-level fm pruning not engaging")
    // and the sparse FETCH obeys the fm candidates: bytes read stay a small
    // fraction of the full-scan volume, not just the decode
    val bf0 = graft.spark.NimbleSource.streamBytesFetched.get()
    df.select("uid", "features.a").collect()
    val fullBytes = graft.spark.NimbleSource.streamBytesFetched.get() - bf0
    assert(probeBytes > 0 && fullBytes > 0)
    assert(probeBytes < fullBytes / 4,
      s"band probe fetched $probeBytes B of a $fullBytes B scan — fm candidates not restricting IO")
  }

  test("randomized feature-filter parity: pruned scan == in-memory filter, 20 trials") {
    val (dir, _) = fixture()
    val df = spark.read.format("nimble")
      .option("flatMapStruct.features", "a,b,zz").load(dir)
    val full = df.select(col("uid"), col("features.a").as("a"), col("features.b").as("b"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val rnd = new scala.util.Random(1917)
    for (trial <- 0 until 20) {
      val lo = rnd.nextInt(200000).toDouble
      val hi = lo + rnd.nextInt(5000)
      val bEq = rnd.nextInt(7).toDouble
      val (pred, oracle): (org.apache.spark.sql.Column, ((Long, Double, Double)) => Boolean) =
        rnd.nextInt(5) match {
          case 0 => (col("features.a") >= lo && col("features.a") < hi,
            t => t._2 >= lo && t._2 < hi)
          case 1 => (col("features.b") === bEq && col("features.a") < hi,
            t => t._3 == bEq && t._2 < hi)
          case 2 => (col("features.a") < lo || col("features.b") === bEq,
            t => t._2 < lo || t._3 == bEq)
          case 3 => (col("features.a").isNotNull && col("features.a") > hi,
            t => t._2 > hi)
          case 4 => (col("features.zz").isNull && col("features.a") >= lo && col("features.a") < hi,
            t => t._2 >= lo && t._2 < hi) // zz is never-seen: always null
        }
      val got = df.filter(pred).select("uid").collect().map(_.getLong(0)).sorted.toSeq
      val want = full.filter(oracle).map(_._1).sorted.toSeq
      assert(got == want,
        s"trial $trial: pruned scan returned ${got.length} rows, expected ${want.length}")
    }
  }

  test("a key the file never saw is all-null: IsNotNull-bearing filters prune everything") {
    val (dir, _) = fixture()
    val df = spark.read.format("nimble")
      .option("flatMapStruct.features", "a,zz").load(dir)
    val d0 = graft.format.Codecs.decodedValues.get()
    val rows = df.filter(col("features.zz") === 1.0).select("uid").collect()
    val decoded = graft.format.Codecs.decodedValues.get() - d0
    assert(rows.isEmpty)
    assert(decoded == 0,
      s"an equality probe on a never-seen key decoded $decoded values — all-null synthesis dead")
    // and the projection itself still reads as nulls (no pruning without a filter)
    assert(df.filter(col("features.zz").isNull).count() == 200000L)
  }
}
