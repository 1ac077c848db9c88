package graft

import graft.spark.BlockCache
import org.apache.spark.sql.functions._

/** Executor-local stream-block cache (AsyncDataCache analog): a second scan
  * of the same data must serve every stream from memory, overwrites must
  * invalidate, and the byte budget must hold. */
class BlockCacheSpec extends SparkTestBase {

  test("second scan of the same table reads zero stream bytes from the FS") {
    val dir = tmpDir("blockcache")
    spark.range(20000).select(col("id"), (col("id") % 97).as("v"),
        concat(lit("p"), col("id").cast("string")).as("s"))
      .coalesce(2).write.format("nimble").mode("overwrite").save(dir)
    BlockCache.clear()
    val nb = spark.read.format("nimble").load(dir)
    val q = () => nb.filter(col("v") > 50).agg(count(lit(1)), sum("id"), max("s")).collect()(0)
    val cold = q()
    val missesAfterCold = BlockCache.misses.get()
    assert(missesAfterCold > 0, "cold scan must populate the cache")
    val hits0 = BlockCache.hits.get()
    val warm = q()
    assert(warm.toSeq == cold.toSeq)
    assert(BlockCache.misses.get() == missesAfterCold,
      "warm scan must not read any stream bytes from the FS")
    assert(BlockCache.hits.get() > hits0, "warm scan must hit the cache")
  }

  test("overwriting the table invalidates cached blocks (no stale reads)") {
    val dir = tmpDir("blockcache_inv")
    spark.range(1000).select(col("id"), lit("old").as("tag"))
      .coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    BlockCache.clear()
    val r1 = spark.read.format("nimble").load(dir).agg(max("tag")).collect()(0).getString(0)
    assert(r1 == "old")
    // mtime has millisecond granularity on some filesystems: make sure the
    // overwrite lands observably later AND with a different length
    Thread.sleep(20)
    spark.range(1500).select(col("id"), lit("newer").as("tag"))
      .coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    val r2 = spark.read.format("nimble").load(dir).agg(max("tag"), count(lit(1))).collect()(0)
    assert(r2.getString(0) == "newer" && r2.getLong(1) == 1500L,
      s"stale cache served old data: $r2")
  }

  test("byte budget holds: resident bytes stay under capacity, oversize blocks bypass") {
    val dir = tmpDir("blockcache_cap")
    spark.range(200000).select(col("id"), concat(lit("x"), col("id").cast("string")).as("s"))
      .coalesce(1).write.format("nimble").mode("overwrite").save(dir)
    val prev = spark.conf.getOption("spark.graft.scan.blockCacheBytes")
    try {
      spark.conf.set("spark.graft.scan.blockCacheBytes", "8192")
      BlockCache.clear() // rereads capacity
      val n = spark.read.format("nimble").load(dir).agg(count(lit(1))).collect()(0).getLong(0)
      assert(n == 200000L)
      assert(BlockCache.residentBytes <= 8192,
        s"resident ${BlockCache.residentBytes} exceeds the 8 KB budget")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.scan.blockCacheBytes", v)
        case None => spark.conf.unset("spark.graft.scan.blockCacheBytes")
      }
      BlockCache.clear()
    }
  }

  test("repeated indexed point probes serve the index stream from the cache") {
    val dir = tmpDir("blockcache_idx")
    spark.range(50000).select(expr("xxhash64(id)").as("k"), col("id"))
      .coalesce(1).write.format("nimble").option("indexColumns", "k")
      .option("rowsPerChunk", "2048").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val probe = nb.select("k").limit(1).collect()(0).getLong(0)
    BlockCache.clear()
    assert(nb.filter(col("k") === probe).count() == 1L)
    val misses1 = BlockCache.misses.get()
    assert(nb.filter(col("k") === probe).count() == 1L)
    assert(BlockCache.misses.get() == misses1,
      "second probe must serve the index run and key chunks from memory")
  }
  test("disk tier serves memory-evicted ranges without an FS stream read") {
    // direct-API test: a tiny memory budget forces eviction; the evicted
    // block must come back from the disk tier with the loader NEVER re-run
    // (the loader closure throwing IS the no-FS-read assertion)
    val prevMem = spark.conf.getOption("spark.graft.scan.blockCacheBytes")
    val prevDisk = spark.conf.getOption("spark.graft.scan.blockCacheDiskBytes")
    try {
      spark.conf.set("spark.graft.scan.blockCacheBytes", "4096")
      spark.conf.set("spark.graft.scan.blockCacheDiskBytes", (1L << 20).toString)
      BlockCache.clear() // rereads both budgets
      def key(i: Int) = BlockCache.Key(s"/fake/f$i", 1L, 10L, 0, "col")
      val blockA = Array.fill[Byte](300)(7)
      assert(BlockCache.getOrLoad(key(0))(blockA).sameElements(blockA))
      // push enough distinct blocks through to evict A from the 4 KB memory tier
      for (i <- 1 to 20) BlockCache.getOrLoad(key(i))(Array.fill[Byte](300)(i.toByte))
      BlockCache.awaitSpills() // spill writes are async: quiesce before asserting
      assert(BlockCache.residentBytes <= 4096)
      assert(BlockCache.diskResidentBytes > 0, "evictions must spill to the disk tier")
      val dh0 = BlockCache.diskHits.get()
      val served = BlockCache.getOrLoad(key(0)) {
        fail("loader ran: the disk tier did not serve the evicted block"); null
      }
      assert(served.sameElements(blockA), "disk tier returned wrong bytes")
      assert(BlockCache.diskHits.get() == dh0 + 1)
      // and through the real scan path: a table bigger than the memory
      // budget scans twice with zero NEW loader misses on the second pass
      val dir = tmpDir("blockcache_disk")
      spark.range(100000).select(col("id"), (col("id") % 97).as("v"))
        .coalesce(1).write.format("nimble").mode("overwrite").save(dir)
      val nb = spark.read.format("nimble").load(dir)
      val q = () => nb.agg(count(lit(1)), sum("v")).collect()(0)
      val cold = q()
      BlockCache.awaitSpills() // cold-scan evictions land on disk before the re-scan
      val missesAfterCold = BlockCache.misses.get()
      val warm = q()
      assert(warm.toSeq == cold.toSeq)
      assert(BlockCache.misses.get() == missesAfterCold,
        "second scan must serve every stream from memory+disk tiers")
    } finally {
      prevMem match {
        case Some(v) => spark.conf.set("spark.graft.scan.blockCacheBytes", v)
        case None => spark.conf.unset("spark.graft.scan.blockCacheBytes")
      }
      prevDisk match {
        case Some(v) => spark.conf.set("spark.graft.scan.blockCacheDiskBytes", v)
        case None => spark.conf.unset("spark.graft.scan.blockCacheDiskBytes")
      }
      BlockCache.clear()
    }
  }

  test("spill writes run on the background writer, never the evicting caller") {
    val prevMem = spark.conf.getOption("spark.graft.scan.blockCacheBytes")
    val prevDisk = spark.conf.getOption("spark.graft.scan.blockCacheDiskBytes")
    try {
      spark.conf.set("spark.graft.scan.blockCacheBytes", "4096")
      spark.conf.set("spark.graft.scan.blockCacheDiskBytes", (1L << 20).toString)
      BlockCache.clear()
      BlockCache.lastSpillThread = null
      // concurrent eviction storm: 8 caller threads churn distinct keys
      // through a 4 KB memory tier, forcing spills on every insert
      val threads = (0 until 8).map { t =>
        new Thread(() => {
          for (i <- 0 until 200)
            BlockCache.getOrLoad(BlockCache.Key(s"/fake/t$t-$i", 1L, 10L, 0, "c"))(
              Array.fill[Byte](600)((t * 31 + i).toByte))
        }, s"evictor-$t")
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      BlockCache.awaitSpills()
      assert(BlockCache.diskResidentBytes > 0, "the storm must have spilled")
      val w = BlockCache.lastSpillThread
      assert(w == "graft-blockcache-spill",
        s"spill IO ran on '$w' — it must run on the dedicated writer thread only")
      // and an evicted block still round-trips through the tier
      val probe = BlockCache.Key("/fake/t0-0", 1L, 10L, 0, "c")
      val got = BlockCache.getOrLoad(probe)(Array.fill[Byte](600)(0.toByte))
      assert(got.length == 600)
    } finally {
      prevMem match {
        case Some(v) => spark.conf.set("spark.graft.scan.blockCacheBytes", v)
        case None => spark.conf.unset("spark.graft.scan.blockCacheBytes")
      }
      prevDisk match {
        case Some(v) => spark.conf.set("spark.graft.scan.blockCacheDiskBytes", v)
        case None => spark.conf.unset("spark.graft.scan.blockCacheDiskBytes")
      }
      BlockCache.clear()
    }
  }
}
