package graft

import graft.spark.{NimbleChainReader, NimbleSource, NimbleStripePartition}

/** Stream-prefetch overlap (UnitLoader analog — reference:
  * velox/VeloxReader.h:69, docs/develop/velox_cache_and_nimble_datapath.rst):
  * while stripe i decodes, stripe i+1's stream bytes must be loading on the
  * shared I/O pool. Driven directly through NimbleChainReader with a
  * simulated per-stripe fetch latency (remote-FS stand-in) and simulated
  * decode work, so the overlap is measurable deterministically. */
class PrefetchSpec extends SparkTestBase {

  test("next-stripe stream I/O overlaps current-stripe decode") {
    val dir = tmpDir("prefetch")
    for (b <- 0 until 6)
      spark.range(b * 1000L, (b + 1) * 1000L).toDF("id").coalesce(1)
        .write.format("nimble").mode(if (b == 0) "overwrite" else "append").save(dir)
    val files = NimbleSource.listFiles(dir)
    assert(files.length == 6, s"expected 6 files, got ${files.length}")
    val items = files.sorted.map(f => NimbleStripePartition(f, 0)).toArray
    val schema = spark.read.format("nimble").load(dir).schema

    def drive(): (Long, Long) = {
      val t0 = System.nanoTime()
      val chain = new NimbleChainReader(items, schema, schema, Array.empty)
      var rows = 0L
      while (chain.next()) { rows += chain.get().numRows(); Thread.sleep(60) }
      chain.close()
      (rows, (System.nanoTime() - t0) / 1000000L)
    }

    drive() // warm footer caches + JIT, no simulated latency
    val hits0 = NimbleSource.prefetchHits.get()
    NimbleSource.testFetchDelayMs = 60
    try {
      // serial: ~6 x (60 fetch + 60 decode) = 720 ms. pipelined: the fetch
      // hides behind the decode sleep, ~60 + 6 x 60 = 420 ms. The bound sits
      // between, far from both; best-of-3 so a co-tenant spike on the box
      // (the round-7 bench lesson) cannot flake a structural property.
      val walls = (0 until 3).map { _ =>
        val (rows, wall) = drive()
        assert(rows == 6000L)
        wall
      }
      assert(walls.min < 620, s"fetch did not overlap decode: best ${walls.min}ms of $walls (serial ~720ms)")
      // 5 of the 6 stripe opens per drive must have been served by a prefetch
      assert(NimbleSource.prefetchHits.get() - hits0 >= 15,
        s"prefetch hits: ${NimbleSource.prefetchHits.get() - hits0}")
    } finally NimbleSource.testFetchDelayMs = 0
  }

  test("prefetch path fetches sparse: byte parity with the in-task reader") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("prefetch_sparse")
    val df = spark.range(60000L)
      .select(col("id").as("seq"), xxhash64(col("id")).as("k"),
        expr("concat(md5(cast(id as string)), md5(cast(id+1 as string)))").as("payload"))
    df.coalesce(1).write.format("nimble")
      .option("indexColumns", "k").option("rowsPerChunk", "2048")
      .mode("overwrite").save(dir)
    val file = NimbleSource.listFiles(dir).head
    val schema = spark.read.format("nimble").load(dir).schema
    val probeKey = df.filter(col("seq") === 42000L).select("k").collect()(0).getLong(0)
    val filters: Array[org.apache.spark.sql.sources.Filter] =
      Array(org.apache.spark.sql.sources.EqualTo("k", probeKey))

    def bytes(f: => Unit): Long = {
      val b = NimbleSource.streamBytesFetched.get(); f
      NimbleSource.streamBytesFetched.get() - b
    }
    // in-task EAGER fetch (reader construction; projected streams defer and
    // are fetched later, which the prefetch pool deliberately skips too)
    graft.spark.BlockCache.clear()
    val taskBytes = bytes {
      val r = new graft.spark.NimbleBatchReader(file, 0, schema, schema, filters)
      r.close()
    }
    // the prefetch pool's fetch of the same (file, stripe, filters) must
    // make the identical sparse decision — same candidate ranges, same bytes
    graft.spark.BlockCache.clear()
    val pre = NimbleSource.fetchStreamBytes(file, 0, schema, schema, filters, Array.empty)
    graft.spark.BlockCache.clear()
    val preBytes = bytes {
      NimbleSource.fetchStreamBytes(file, 0, schema, schema, filters, Array.empty)
    }
    assert(taskBytes > 0 && preBytes > 0)
    assert(preBytes == taskBytes,
      s"prefetch fetched $preBytes bytes, in-task reader $taskBytes — sparse decisions diverged")
    // and sparse: far below the whole-stream cost of the same streams
    graft.spark.BlockCache.clear()
    val denseBytes = bytes {
      NimbleSource.fetchStreamBytes(file, 0, schema, schema, Array.empty, Array.empty)
    }
    assert(preBytes < denseBytes / 8,
      s"prefetch fetched $preBytes of $denseBytes dense bytes — not sparse")
    // a reader consuming the sparse prefetched map returns the exact rows
    val expect = df.filter(col("k") === probeKey).select("seq").collect().map(_.getLong(0)).toSeq
    val r2 = new graft.spark.NimbleBatchReader(file, 0, schema, schema, filters,
      prefetched = pre)
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      while (r2.next()) {
        val batch = r2.get()
        val seqIdx = schema.fieldIndex("seq")
        for (i <- 0 until batch.numRows()) got += batch.column(seqIdx).getLong(i)
      }
    } finally r2.close()
    assert(got.toSeq == expect, s"sparse-prefetched decode diverged: $got != $expect")
  }

  test("prefetched and sync reads return identical data (chunked, filtered)") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("prefetch_eq")
    val df = spark.range(50000L).select(col("id"), (col("id") % 997).as("v"),
      concat(lit("row_"), col("id")).as("s"))
    // several files and small chunks: the chain reader prefetches across
    // files inside one bin-packed task
    df.repartition(5).write.format("nimble")
      .option("rowsPerChunk", "2048").mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    assert(nb.count() == 50000L)
    val got = nb.filter(col("v") < 100).agg(sum("id"), count(lit(1))).collect()(0)
    val exp = df.filter(col("v") < 100).agg(sum("id"), count(lit(1))).collect()(0)
    assert(got.toSeq == exp.toSeq)
  }
}
