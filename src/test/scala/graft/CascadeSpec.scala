package graft

import org.apache.spark.sql.functions._

/** Cascading selectivity-ordered filter decode (reference:
  * docs/develop/nimble_selective_reader.rst:163-199) — the scan decodes
  * filter columns most-selective-first, each narrowing the survivor set the
  * next must test, and skips decode of later columns entirely once a chunk
  * is dead. Pinned through the Codecs.decodedValues counter (top-level chunk
  * values materialized) plus result parity against a parquet twin. */
class CascadeSpec extends SparkTestBase {

  private def decodedDelta[A](body: => A): (Long, A) = {
    val before = graft.format.Codecs.decodedValues.get()
    val r = body
    (graft.format.Codecs.decodedValues.get() - before, r)
  }

  /** 7-chunk table (112k rows at 16k rows/chunk) with hash-scrambled `a`
    * (so chunk stats cannot pre-prune equality probes on it), a wide-range
    * `b`, and a nullable double `v`. */
  private lazy val dir: String = {
    val d = tmpDir("cascade")
    val df = spark.range(112000L).toDF("id")
      .withColumn("a", xxhash64(col("id")))
      .withColumn("b", pmod(col("id") * 7L, lit(1000L)))
      // v: non-terminating fractions so ALP declines and the doubles stay
      // TRIVIAL-coded (the point-read fast path under test); ~1/11 null
      .withColumn("v", when(pmod(col("id"), lit(11L)) === 0, lit(null))
        .otherwise(col("id").cast("double") / 7.0))
    df.coalesce(1).write.format("nimble").option("rowsPerChunk", "16384")
      .mode("overwrite").save(d)
    d
  }
  private lazy val probeA: Long = {
    // xxhash64 of a known row, read back so the test does not re-implement it
    spark.read.format("nimble").load(dir).filter(col("id") === 55555L)
      .select("a").head().getLong(0)
  }

  test("chunk killed by the first filter column never decodes the second") {
    val nb = spark.read.format("nimble").load(dir)
    // warm footer caches etc. outside the counted region. collect(), not
    // count(): aggregate pushdown would route a count through the mid-scan
    // fold (AggScan), which is not the batch-reader cascade under test.
    assert(nb.filter(col("a") === probeA).select("id").collect().length == 1)

    // equality on scrambled a (1 surviving row in 1 of 7 chunks) AND a range
    // on b: the cascade orders a first (equality seed < range seed), so the
    // 6 dead chunks decode ONLY a, and the one surviving chunk decodes b at
    // a single survivor position (point read)
    val (dBoth, rows) = decodedDelta {
      nb.filter(col("a") === probeA && col("b") < 900L).select("id").collect().length
    }
    // correctness: b = (55555 * 7) % 1000 = 885 < 900 -> the row survives
    assert(rows == 1L, s"expected the probe row to survive, got $rows")
    // decode volume: all of a (112k), plus ONE chunk of b and ONE of the
    // projected id in the single surviving chunk (b's cyclic pattern and
    // id's delta coding have no point-read structure, so both fall back to
    // one bulk chunk decode there). A decode-all-filter-columns scan pays
    // a + b everywhere = 224k; the cascade must stay well under it.
    assert(dBoth < 112000 + 3 * 16384,
      s"cascade should decode ~one filter column's volume, counted $dBoth")
    assert(dBoth.toDouble < 224000 * 0.75,
      s"cascade ($dBoth) must decode well under the 224k decode-all volume")
  }

  test("adaptive ordering learns observed selectivity over chunks") {
    val nb = spark.read.format("nimble").load(dir)
    // two RANGE filters (equal static seeds, so only observed pass rates can
    // order them): a-range passes ~nothing (xxhash64 values < 0 covers ~half;
    // use a tiny window), b-range passes ~90%. Written order puts b first —
    // the cascade must learn to evaluate the a-window first after the
    // evidence chunk and stop decoding b for dead chunks.
    val (d, n) = decodedDelta {
      nb.filter(col("b") >= 100L && col("a") > Long.MaxValue - 1000L)
        .select("id").collect().length.toLong
    }
    // full decode-all volume would be ~2 x 112k; the learned order decodes
    // a for every chunk, b only for the evidence chunk(s)
    assert(d < 112000 + 3 * 16384,
      s"adaptive order should stop decoding the unselective column, counted $d")
    assert(n <= 1L) // window is ~empty (defensive: value-dependent)
  }

  test("sparse-selection projection fill point-decodes numerics (nulls intact)") {
    val nb = spark.read.format("nimble").load(dir)
    val pq = dir + "-pq"
    spark.read.format("nimble").load(dir).coalesce(1)
      .write.mode("overwrite").parquet(pq)
    val ppq = spark.read.parquet(pq)

    // one-in-16k selectivity: the projected v column (nullable doubles) must
    // fill through the positional path; parity with the parquet twin pins
    // null scatter + value correctness
    def got(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("a") === probeA).select("id", "b", "v")
        .collect().map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))
        .toSeq
    assert(got(nb) == got(ppq))

    // a filter selecting a null-v row: the dense column must carry the null
    val someNullId = 11L * 7L // id % 11 == 0 -> v null
    val probeA2 = nb.filter(col("id") === someNullId).select("a").head().getLong(0)
    val r = nb.filter(col("a") === probeA2).select("v").collect()
    assert(r.length == 1 && r(0).isNullAt(0))

    // decode volume of the sparse projection: v contributes point reads, not
    // whole chunks (a still decodes fully everywhere)
    val (d, _) = decodedDelta(nb.filter(col("a") === probeA).select("v").collect())
    assert(d < 7 * 16384 + 4096, s"projection fill should not bulk-decode v, counted $d")

    // r14: the delta-coded id column (consecutive longs -> DELTA/DELTABLOCK
    // chunks) seeks too — survivors point-decode instead of the pre-r14
    // bulk-decode + gather, so the one live chunk adds ~1 value, not 16384
    val (dId, _) = decodedDelta(nb.filter(col("a") === probeA).select("id").collect())
    assert(dId < 112000 + 2048,
      s"delta-coded projection should point-decode survivors, counted $dId")
  }

  test("string filter column point-decodes sparse survivors (r15)") {
    // r15: the dense gate no longer declines String/Binary — a later-ordered
    // string filter column whose codec admits point reads (Trivial / Dict /
    // Fsst / PrefixR) materializes ONLY the surviving positions
    val d = tmpDir("cascade-str")
    spark.range(112000L).toDF("id")
      .withColumn("a", xxhash64(col("id")))
      // high-cardinality shared-prefix strings: FSST or PrefixR territory,
      // both point-readable; never DICT/shared-dict (cardinality = n)
      .withColumn("s", concat(lit("doc/2026-08/"), col("id").cast("string")))
      .coalesce(1).write.format("nimble").option("rowsPerChunk", "16384")
      .mode("overwrite").save(d)
    val nb = spark.read.format("nimble").load(d)
    val probe = nb.filter(col("id") === 55555L).select("a").head().getLong(0)
    assert(nb.filter(col("a") === probe).select("id").collect().length == 1) // warm

    // equality on scrambled a (1 survivor in 1 of 7 chunks) AND an endsWith
    // on s that stats cannot decide: the live chunk must evaluate s at ONE
    // survivor position — a bulk fallback would decode its whole 16k chunk
    val (dv, rows) = decodedDelta {
      nb.filter(col("a") === probe && col("s").endsWith("5"))
        .select("id").collect().length
    }
    assert(rows == 1, s"expected the probe row to survive, got $rows")
    assert(dv < 112000 + 2048,
      s"string filter should point-decode survivors, not bulk-decode its chunk; counted $dv")
  }

  test("mid-scan aggregate fold cascades: dead chunks decode one filter column") {
    val nb = spark.read.format("nimble").load(dir)
    // warm (footer caches, JIT) — and prove the shape routes through the
    // fold, not the batch reader
    val folds0 = graft.spark.AggScan.aggChunksDecoded.get()
    assert(nb.filter(col("a") === probeA && col("b") < 900L).count() == 1L)
    assert(graft.spark.AggScan.aggChunksDecoded.get() > folds0,
      "filtered count() must route through the mid-scan aggregate fold")

    val (dBoth, n) = decodedDelta {
      nb.filter(col("a") === probeA && col("b") < 900L).count()
    }
    assert(n == 1L)
    // the cascade orders the equality on scrambled `a` first: 6 dead chunks
    // decode ONLY a; the surviving chunk evaluates b at one survivor
    // position (point read). Decode-all (the pre-cascade fold) paid
    // a + b everywhere = 224k.
    assert(dBoth < 112000 + 3 * 16384,
      s"fold cascade should decode ~one filter column's volume, counted $dBoth")
    assert(dBoth.toDouble < 224000 * 0.75,
      s"fold cascade ($dBoth) must decode well under the 224k decode-all volume")

    // sparse-survivor late materialization INTO the fold: sum(v) under the
    // one-in-112k filter decodes v at survivor positions, not whole chunks
    val (dSum, _) = decodedDelta {
      nb.filter(col("a") === probeA).agg(sum("v")).collect()
    }
    assert(dSum < 112000 + 2 * 16384,
      s"fold should point-decode the aggregate input under sparse survivors, counted $dSum")
  }

  test("footer NDV seeds order the first chunk before any evidence exists") {
    // two EQUALITY conjuncts — identical static filter-kind seeds, so only
    // the footer NDV cold-start can order them: c_hi is hash-unique
    // (pass ~1/65536), c_lo has 2 distinct values (pass ~1/2). A kind-seeded
    // tie leaves the order to hash-map iteration luck; the NDV seed must put
    // c_hi first from the VERY FIRST chunk (evidence needs 1024 rows and
    // there is exactly one query).
    val d2 = tmpDir("cascade_seed")
    spark.range(65536L).toDF("id")
      .withColumn("c_hi", xxhash64(col("id")))
      .withColumn("c_lo", pmod(col("id"), lit(2L)))
      .coalesce(1).write.format("nimble").option("rowsPerChunk", "16384")
      .mode("overwrite").save(d2)
    val nb = spark.read.format("nimble").load(d2)
    val probe = nb.filter(col("id") === 33333L).select("c_hi").head().getLong(0)
    // count() -> the fold path; collect() -> the batch path: both share the
    // FilterCascade seeds, assert each on a fresh reader
    val (dFold, nf) = decodedDelta {
      nb.filter(col("c_lo") === (33333L % 2) && col("c_hi") === probe).count()
    }
    assert(nf == 1L)
    // c_hi-first: 4 chunks of c_hi (65536) + c_lo point-read at the one
    // survivor; c_lo-first would cost 65536 + 4 full c_hi chunks = 131072
    assert(dFold < 90000,
      s"NDV seed must order the unique column first in the fold, counted $dFold")
    val (dBatch, rows) = decodedDelta {
      nb.filter(col("c_lo") === (33333L % 2) && col("c_hi") === probe)
        .select("id").collect().length
    }
    assert(rows == 1)
    // + one id chunk (or point read) for the projection in the live chunk
    assert(dBatch < 90000 + 16384,
      s"NDV seed must order the unique column first in the batch scan, counted $dBatch")
  }

  test("cascade parity on the multi-column Or shape (tail conjuncts)") {
    val nb = spark.read.format("nimble").load(dir)
    // Or over two columns cannot cascade: it must evaluate as a tail
    // conjunct over both decoded columns — same result as Spark's own eval
    // on the parquet twin (null v rows fail v<5 but may pass b<3)
    val got = nb.filter(col("b") < 3L || col("v") < 5.0).count()
    val pq = dir + "-pq2"
    nb.coalesce(1).write.mode("overwrite").parquet(pq)
    val twin = spark.read.parquet(pq).filter(col("b") < 3L || col("v") < 5.0).count()
    assert(got == twin, s"Or-shape mismatch: nimble $got vs parquet $twin")
  }
}
