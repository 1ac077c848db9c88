package graft

import org.apache.spark.sql.functions._

/** v13 sparse candidate-chunk fetch: when the per-stripe hash index
  * restricts a probe to a small candidate-chunk set, the scan fetches only
  * those chunks' byte ranges (chunk directory offsets) instead of whole
  * stripe streams — composing with deferred projected-stream IO, a point
  * probe reads ~one chunk per stream. Pinned through streamBytesFetched
  * (FS fetches, cache hits excluded) plus strict result parity. */
class SparseFetchSpec extends SparkTestBase {

  private def fetchedDuring(f: => Unit): Long = {
    val before = graft.spark.NimbleSource.streamBytesFetched.get()
    f
    graft.spark.NimbleSource.streamBytesFetched.get() - before
  }

  test("index point probe fetches candidate chunk ranges, not whole streams") {
    val dir = tmpDir("sparse_probe")
    // hash-scrambled keys: stats can't prune, only the hash index can; fat
    // payload makes whole-stream fetches visible in the byte counter
    val df = spark.range(60000).toDF("seq")
      .withColumn("id", expr("xxhash64(seq) % 1000000"))
      .withColumn("payload", expr(
        "concat(md5(cast(seq as string)), md5(cast(seq+1 as string)), md5(cast(seq+2 as string)))"))
    df.coalesce(1).write.format("nimble")
      .option("indexColumns", "id")
      .option("rowsPerChunk", "2048")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)

    graft.spark.BlockCache.clear()
    val fullBytes = fetchedDuring {
      assert(nb.select("payload").collect().length == 60000)
    }

    val probe = df.select("id").collect()(12345).getLong(0)
    val expect = df.filter(col("id") === probe).select("seq", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    graft.spark.BlockCache.clear()
    val probeBytes = fetchedDuring {
      val got = nb.filter(col("id") === probe).select("seq", "payload")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got == expect, "sparse-fetched probe diverged")
    }
    assert(probeBytes > 0, "the probe must fetch its candidate chunks")
    // ~30 chunks/stream: candidate-chunk ranges are a small fraction of the
    // stripe even with the filter stream + survivor chunks of seq+payload
    assert(probeBytes < fullBytes / 8,
      s"probe fetched $probeBytes of $fullBytes full-scan bytes — candidate ranges were not sparse")
  }

  test("multi-value In probe across chunks: union candidates, exact rows") {
    val dir = tmpDir("sparse_in")
    val df = spark.range(50000).toDF("seq")
      .withColumn("id", expr("xxhash64(seq) % 1000000"))
      .withColumn("p", md5(col("seq").cast("string")))
    df.coalesce(1).write.format("nimble")
      .option("indexColumns", "id")
      .option("rowsPerChunk", "2048")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val ids = df.select("id").collect()
    val probes = Seq(ids(5), ids(24000), ids(49999)).map(_.getLong(0))
    def run(d: org.apache.spark.sql.DataFrame) =
      d.filter(col("id").isin(probes: _*)).select("seq", "p")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    graft.spark.BlockCache.clear()
    assert(run(nb) == run(df))
    // absent probe: zero rows, and the fetch stays tiny (index + dead chunks)
    graft.spark.BlockCache.clear()
    val missBytes = fetchedDuring {
      assert(nb.filter(col("id") === -1234567L).select("p").collect().isEmpty)
    }
    assert(missBytes < 120000,
      s"miss probe fetched $missBytes bytes — candidates should be near-empty")
  }

  test("shared-dict stream: sparse fetch carries the alphabet frame") {
    val dir = tmpDir("sparse_dict")
    val df = spark.range(40000).toDF("seq")
      .withColumn("id", expr("xxhash64(seq) % 1000000"))
      // low-cardinality strings -> shared-dictionary encoding with a
      // stripe-level alphabet frame the candidate chunks decode through
      .withColumn("g", expr("concat('grp_', cast(seq % 6 as string))"))
    df.coalesce(1).write.format("nimble")
      .option("indexColumns", "id")
      .option("rowsPerChunk", "2048")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    // probe rows from a LATE chunk: its dict indices decode through an
    // alphabet frame that precedes many absent chunks
    val late = df.select("id").collect()(39000).getLong(0)
    val expect = df.filter(col("id") === late).select("seq", "g")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    graft.spark.BlockCache.clear()
    val got = nb.filter(col("id") === late).select("seq", "g")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == expect, "shared-dict decode through sparse alphabet diverged")
  }

  test("probe parity fuzz vs parquet under sparse+deferred fetch") {
    val dir = tmpDir("sparse_fuzz")
    val df = spark.range(45000).toDF("seq")
      .withColumn("id", expr("xxhash64(seq) % 300000"))
      .withColumn("v", (col("seq") * 3 - 7).cast("double"))
      .withColumn("s", concat(lit("s"), col("seq").cast("string")))
    df.coalesce(1).write.format("nimble")
      .option("indexColumns", "id")
      .option("rowsPerChunk", "1024")
      .mode("overwrite").save(dir)
    val pq = dir + "-pq"
    df.coalesce(1).write.mode("overwrite").parquet(pq)
    val nb = spark.read.format("nimble").load(dir)
    val ppq = spark.read.parquet(pq)
    val rnd = new scala.util.Random(4242)
    val ids = df.select("id").collect().map(_.getLong(0))
    for (_ <- 1 to 12) {
      val probes = Seq.fill(1 + rnd.nextInt(3))(
        if (rnd.nextBoolean()) ids(rnd.nextInt(ids.length)) else rnd.nextLong() % 300000)
      def run(d: org.apache.spark.sql.DataFrame) =
        d.filter(col("id").isin(probes: _*)).select("seq", "v", "s")
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
          .sortBy(_._1).toSeq
      assert(run(nb) == run(ppq), s"probes $probes diverged")
    }
  }

  test("stats-driven sparse fetch: selective range on sorted data, NO index") {
    val dir = tmpDir("sparse_stats_range")
    // sorted key, fat payload, no index of any kind: only the v14 per-chunk
    // directory stats can restrict the fetch
    val df = spark.range(60000).toDF("id")
      .withColumn("payload", expr(
        "concat(md5(cast(id as string)), md5(cast(id+1 as string)), md5(cast(id+2 as string)))"))
    df.coalesce(1).write.format("nimble")
      .option("rowsPerChunk", "2048")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)

    graft.spark.BlockCache.clear()
    val fullBytes = fetchedDuring {
      assert(nb.select("payload").collect().length == 60000)
    }

    val expect = df.filter(col("id").between(10000, 10400)).select("id", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    graft.spark.BlockCache.clear()
    val pruned0 = graft.spark.NimbleSource.dirStatsChunksPruned.get()
    val probeBytes = fetchedDuring {
      val got = nb.filter(col("id").between(10000, 10400)).select("id", "payload")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got == expect, "stats-sparse range probe diverged")
    }
    assert(graft.spark.NimbleSource.dirStatsChunksPruned.get() > pruned0,
      "directory stats pruned no chunks — the v14 stats path did not engage")
    assert(probeBytes > 0)
    // ~30 chunks/stream, the range covers ~1: candidate byte ranges must be
    // a small fraction of the stripe streams
    assert(probeBytes < fullBytes / 8,
      s"range probe fetched $probeBytes of $fullBytes full-scan bytes — " +
        "chunk-stats candidates did not restrict the fetch")
  }

  test("stats-sparse range parity fuzz vs parquet (sorted, no index)") {
    val dir = tmpDir("sparse_stats_fuzz")
    val df = spark.range(50000).toDF("id")
      .withColumn("v", (col("id") * 7 % 1013).cast("double"))
      .withColumn("s", concat(lit("s"), col("id").cast("string")))
    df.coalesce(1).write.format("nimble")
      .option("rowsPerChunk", "1024")
      .mode("overwrite").save(dir)
    val pq = dir + "-pq"
    df.coalesce(1).write.mode("overwrite").parquet(pq)
    val nb = spark.read.format("nimble").load(dir)
    val ppq = spark.read.parquet(pq)
    val rnd = new scala.util.Random(1515)
    for (_ <- 1 to 10) {
      val lo = rnd.nextInt(50000)
      val hi = lo + rnd.nextInt(3000)
      def run(d: org.apache.spark.sql.DataFrame) =
        d.filter(col("id") >= lo && col("id") <= hi && col("v") < 900)
          .select("id", "v", "s")
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
          .sortBy(_._1).toSeq
      assert(run(nb) == run(ppq), s"range [$lo,$hi] diverged")
    }
  }
}
