package graft

import org.apache.spark.sql.functions._

/** IO coalescing: adjacent stream ranges of a stripe merge into single
  * positioned reads, so a k-column projection costs one round trip per
  * contiguous run — the difference between k·ms and ms per stripe on
  * object storage. Values are unaffected (the full-suite round-trips pin
  * that); this spec pins the READ COUNT. */
class IoCoalesceSpec extends SparkTestBase {

  private def readsDuring(f: => Unit): Long = {
    val before = graft.spark.NimbleSource.streamReadOps.get()
    f
    graft.spark.NimbleSource.streamReadOps.get() - before
  }

  test("full-projection scan of one stripe costs one merged read, then cache hits") {
    val df = spark.range(20000).select(col("id"),
      (col("id") * 2).as("a"), (col("id") % 97).as("b"),
      md5(col("id").cast("string")).as("s1"),
      sha1(col("id").cast("string")).as("s2"),
      (col("id").cast("double") / 3.0).as("d"))
    val dir = tmpDir("iocoalesce")
    df.coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    val file = graft.spark.NimbleSource.listFiles(dir).head
    val stripes = graft.spark.NimbleSource.footerOf(file).stripes.length
    assert(stripes == 1)
    val nStreams = graft.spark.NimbleSource.footerOf(file).streamKeys.length
    assert(nStreams >= 6)

    graft.spark.BlockCache.clear()
    val nb = spark.read.format("nimble").load(dir)
    // full materialization (no aggregate pushdown: collect decodes rows)
    val cold = readsDuring { assert(nb.collect().length == 20000) }
    // every stream of the stripe lives in one contiguous region: far fewer
    // positioned reads than streams
    assert(cold > 0 && cold <= 3, s"expected <=3 merged reads for $nStreams streams, got $cold")

    // warm: the block cache serves every stream, zero positioned reads
    val warm = readsDuring { assert(nb.collect().length == 20000) }
    assert(warm == 0, s"warm scan should be all cache hits, issued $warm reads")
  }

  test("cache disabled: coalescing alone still bounds read count") {
    val df = spark.range(30000).select(col("id"), md5(col("id").cast("string")).as("s"))
    val dir = tmpDir("iocoalesce-nocache")
    df.coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    spark.conf.set("spark.graft.scan.blockCacheBytes", "0")
    graft.spark.BlockCache.clear()
    try {
      val nb = spark.read.format("nimble").load(dir)
      val reads = readsDuring { assert(nb.collect().length == 30000) }
      assert(reads >= 1 && reads <= 2, s"2 contiguous streams should merge, got $reads reads")
    } finally {
      spark.conf.unset("spark.graft.scan.blockCacheBytes")
      graft.spark.BlockCache.clear()
    }
  }
}
