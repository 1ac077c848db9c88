package graft

import org.apache.spark.sql.functions._

/** Deferred projected-stream fetch: with pushed filters, a stripe reader
  * fetches only the filter-phase streams up front and pays the projected
  * columns' IO only when a chunk actually survives — a fully-filtered
  * stripe never reads the projected bytes at all. Pinned through the
  * NimbleSource.streamBytesFetched counter (FS fetches, cache hits
  * excluded) plus row parity on the chunk fast-forward path. */
class DeferredIoSpec extends SparkTestBase {

  private def fetchedDuring(f: => Unit): Long = {
    val before = graft.spark.NimbleSource.streamBytesFetched.get()
    f
    graft.spark.NimbleSource.streamBytesFetched.get() - before
  }

  test("a probe that kills every chunk never fetches the projected stream") {
    val dir = tmpDir("defer_miss")
    // 8-byte scrambled key + a fat ~120 B payload: the payload stream is
    // ~90% of the stripe's bytes, so deferral shows directly in the counter
    spark.range(60000L)
      .select(xxhash64(col("id")).as("k"),
        concat(lit("payload-"), md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string")),
          md5((col("id") + 2).cast("string"))).as("p"))
      .coalesce(1).write.format("nimble").option("rowsPerChunk", "8192")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)

    graft.spark.BlockCache.clear()
    // key 12345 is not an xxhash64 output of this table: every chunk decodes
    // k, dies, and must never touch p
    val missBytes = fetchedDuring {
      assert(nb.filter(col("k") === 12345L).select("p").collect().isEmpty)
    }
    graft.spark.BlockCache.clear()
    val fullBytes = fetchedDuring {
      assert(nb.select("p").collect().length == 60000)
    }
    assert(missBytes > 0, "the key stream itself must fetch")
    // the key stream is 60000 x 8 B of incompressible hashes (~480 KB); the
    // payload stream is the rest of the file — a miss must pay only the key
    assert(missBytes < 500000,
      s"miss probe fetched $missBytes bytes — more than the ~480 KB key stream")
    assert(missBytes < fullBytes / 2,
      s"miss probe fetched $missBytes of $fullBytes bytes — projected stream was not deferred")
  }

  test("unselective filters gate deferral OFF: still one coalesced read per stripe") {
    val dir = tmpDir("defer_gate")
    spark.range(40000L)
      .select(col("id"), (col("id") % 1000).as("b"),
        md5(col("id").cast("string")).as("p"))
      .coalesce(1).write.format("nimble").option("rowsPerChunk", "8192")
      .mode("overwrite").save(dir)
    graft.spark.BlockCache.clear()
    val nb = spark.read.format("nimble").load(dir)
    val reads0 = graft.spark.NimbleSource.streamReadOps.get()
    // b < 900 passes ~90% of rows — the seed estimate sits far above the
    // deferral gate, so the stripe fetches in one coalesced read as before
    assert(nb.filter(col("b") < 900).select("p").collect().length == 36000)
    val reads = graft.spark.NimbleSource.streamReadOps.get() - reads0
    assert(reads <= 2, s"unselective filtered scan split its fetch: $reads reads")
  }

  test("chunk fast-forward: dead chunks before the first survivor stay row-aligned") {
    val dir = tmpDir("defer_ff")
    val df = spark.range(50000L)
      .select(col("id"), xxhash64(col("id")).as("a"),
        concat(lit("v"), col("id").cast("string")).as("p"))
    df.coalesce(1).write.format("nimble").option("rowsPerChunk", "4096")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    // probes from late chunks only: earlier chunks decode `a`, die, and the
    // deferred p/id cursors materialize mid-stripe via the lag counter
    val ids = Seq(30000L, 30001L, 47000L)
    val probes = nb.filter(col("id").isin(ids: _*)).select("a")
      .collect().map(_.getLong(0)).toSeq
    assert(probes.length == 3)
    val got = nb.filter(col("a").isin(probes: _*)).select("id", "p")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == ids.sorted.map(i => (i, s"v$i")),
      s"fast-forwarded deferred streams misaligned: $got")
    // and again warm (block-cache path materializes from cached bytes)
    val got2 = nb.filter(col("a").isin(probes: _*)).select("id", "p")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got2 == got)
  }

  test("agg fold: a probe that kills every chunk never fetches the aggregate stream") {
    val dir = tmpDir("defer_agg")
    // k and v are both ~8 B/row incompressible streams (~480 KB each): a
    // filtered sum that finds nothing must pay k's bytes but never v's
    spark.range(60000L)
      .select(xxhash64(col("id")).as("k"),
        xxhash64(col("id") * 3 + 1).cast("double").as("v"))
      .coalesce(1).write.format("nimble").option("rowsPerChunk", "8192")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)

    graft.spark.BlockCache.clear()
    val decoded0 = graft.spark.AggScan.aggChunksDecoded.get()
    val missBytes = fetchedDuring {
      val r = nb.filter(col("k") === 12345L).agg(sum("v")).collect()
      assert(r(0).isNullAt(0), "sum over zero rows is null")
    }
    assert(graft.spark.AggScan.aggChunksDecoded.get() > decoded0,
      "the mid-scan fold path must engage (mixed stripes, SUM is never stats-answerable)")
    assert(missBytes > 300000, "the filter (k) stream itself must fetch")
    assert(missBytes < 600000,
      s"miss probe fetched $missBytes bytes — the deferred aggregate (v) stream was read")

    // survivors: deferred v materializes mid-stripe and the fold is exact
    val ids = Seq(100L, 30000L, 59999L)
    val keyOf = spark.range(60000L)
      .select(col("id"), xxhash64(col("id")).as("k"), xxhash64(col("id") * 3 + 1).cast("double").as("v"))
    val expected = keyOf.filter(col("id").isin(ids: _*)).agg(sum("v")).collect()(0).getDouble(0)
    val keys = keyOf.filter(col("id").isin(ids: _*)).select("k").collect().map(_.getLong(0)).toSeq
    val got = nb.filter(col("k").isin(keys: _*)).agg(sum("v")).collect()(0).getDouble(0)
    assert(got == expected, s"fold over deferred-materialized v: $got != $expected")
  }

  test("agg fold goes sparse: indexed point probe fetches candidate chunk ranges only") {
    val dir = tmpDir("defer_agg_sparse")
    // indexed scrambled key + fat aggregate input: the fold must take the
    // SAME sparse candidate-range fetch as the batch reader (r14 gap: the
    // fold fetched whole filter streams even when the index restricted
    // decode to a chunk)
    val df = spark.range(60000L)
      .select(col("id").as("seq"), xxhash64(col("id")).as("k"),
        xxhash64(col("id") * 3 + 1).cast("double").as("v"))
    df.coalesce(1).write.format("nimble")
      .option("indexColumns", "k").option("rowsPerChunk", "2048")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)

    // full-stream cost yardstick: an unselective fold reads both streams whole
    graft.spark.BlockCache.clear()
    val fullBytes = fetchedDuring {
      nb.agg(sum("v")).collect()
    }

    val probeKey = df.filter(col("seq") === 31000L).select("k").collect()(0).getLong(0)
    val expect = df.filter(col("k") === probeKey).agg(sum("v")).collect()(0).getDouble(0)
    graft.spark.BlockCache.clear()
    val decoded0 = graft.spark.AggScan.aggChunksDecoded.get()
    val probeBytes = fetchedDuring {
      val got = nb.filter(col("k") === probeKey).agg(sum("v")).collect()(0).getDouble(0)
      assert(got == expect, "sparse fold result diverged")
    }
    assert(graft.spark.AggScan.aggChunksDecoded.get() > decoded0,
      "the mid-scan fold path must engage")
    // ~30 chunks/stream and one candidate: the fold's fetch must be
    // candidate ranges (k's candidate chunk + v's candidate chunk), not
    // whole streams
    assert(probeBytes > 0)
    assert(probeBytes < fullBytes / 8,
      s"fold probe fetched $probeBytes of $fullBytes unselective bytes — " +
        "the fold did not take the sparse candidate fetch")
  }

  test("agg fold grouped: selective probe defers group+agg streams, fold stays exact") {
    val dir = tmpDir("defer_aggg")
    val df = spark.range(50000L)
      .select(xxhash64(col("id")).as("k"),
        concat(lit("g"), (col("id") % 7).cast("string")).as("g"),
        xxhash64(col("id") + 17).cast("double").as("v"))
    df.coalesce(1).write.format("nimble").option("rowsPerChunk", "4096")
      .mode("overwrite").save(dir)
    val nb = spark.read.format("nimble").load(dir)
    val keys = df.filter(col("k") % 9999 === 0).select("k")
      .collect().map(_.getLong(0)).toSeq // a handful of real keys
    assert(keys.nonEmpty && keys.length < 40)
    def grouped(d: org.apache.spark.sql.DataFrame) =
      d.filter(col("k").isin(keys: _*)).groupBy("g")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    assert(grouped(nb) == grouped(df), "grouped fold over deferred streams diverged")
  }

  test("multi-stripe + prefetch: filtered projection parity against parquet") {
    val dir = tmpDir("defer_pf")
    val df = spark.range(120000L)
      .select(col("id"), xxhash64(col("id")).as("a"),
        (col("id") % 1000).as("b"),
        md5(col("id").cast("string")).as("p"))
    df.coalesce(1).write.format("nimble")
      .option("rowsPerChunk", "4096").option("stripeBytes", (1L << 20).toString)
      .mode("overwrite").save(dir)
    val file = graft.spark.NimbleSource.listFiles(dir).head
    assert(graft.spark.NimbleSource.footerOf(file).stripes.length >= 2,
      "need multiple stripes so the prefetch chain engages")
    val pq = dir + "-pq"
    df.coalesce(1).write.mode("overwrite").parquet(pq)
    val nb = spark.read.format("nimble").load(dir)
    val ppq = spark.read.parquet(pq)
    // equality probes on the scrambled column (seed ~3/120000, well under
    // the deferral gate) hitting different stripes: survivors exist, so the
    // deferred streams materialize mid-chain while the prefetch pipeline
    // runs eager-only fetches ahead
    val probes = nb.filter(col("id").isin(5L, 70000L, 119000L)).select("a")
      .collect().map(_.getLong(0)).toSeq
    def run(d: org.apache.spark.sql.DataFrame) =
      d.filter(col("a").isin(probes: _*)).select("id", "p")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val got = run(nb)
    assert(got.map(_._1) == Seq(5L, 70000L, 119000L))
    assert(got == run(ppq))
  }
}
