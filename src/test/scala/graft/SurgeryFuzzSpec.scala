package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{Delete, Surgery}

/** Seeded randomized parity fuzz for the chunk-surgery DML paths: every
  * trial draws a layout (chunk size, row count) and a predicate over a
  * 4-column table (sorted long id, nullable long g, categorical string s,
  * double v with planted NaNs), then checks Delete.delete / Delete.update
  * against the Spark-computed oracle on the pre-state. Trials are built so
  * SOME take the surgery path and some its per-chunk classifications differ
  * (raw / dropped / rewritten) — the counters are asserted in aggregate so
  * the suite fails loudly if surgery silently stops engaging. */
class SurgeryFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture(rnd: scala.util.Random, dir: String,
      indexed: Boolean = false): DataFrame = {
    val n = 20000 + rnd.nextInt(30000)
    val rpc = Seq(1024, 2048, 4096)(rnd.nextInt(3))
    val cats = Seq("alpha", "beta", "gamma", "delta")
    val rows = (0 until n).map { i =>
      val g: Option[Long] = if (i % 11 == 0) None else Some((i % 1000).toLong)
      val s = cats(i % cats.length) + "-" + (i % 17)
      val v = if (i % 997 == 0) Double.NaN else (i % 5000).toDouble / 3.0
      (i.toLong, g, s, v)
    }
    var w = rows.toDF("id", "g", "s", "v")
      .repartitionByRange(2, col("id")).sortWithinPartitions("id")
      .write.format("nimble").option("sortColumns", "id")
      .option("rowsPerChunk", rpc.toString).mode("overwrite")
    // r19: index+bloom-bearing trials — surgery must remap the index
    // entries' (chunk,row) positions and adopt the stripe blooms; the
    // post-delete lookup parity below is the index-domain oracle
    if (indexed) w = w.option("indexColumns", "id").option("bloomFilterColumns", "s")
    w.save(dir)
    spark.read.format("nimble").load(dir)
  }

  private def predicate(rnd: scala.util.Random, n: Int): Column =
    rnd.nextInt(7) match {
      case 0 => col("id") >= (n / 2 + rnd.nextInt(n / 4)).toLong
      case 1 => col("id") >= rnd.nextInt(n / 2).toLong &&
        col("id") < (n / 2 + rnd.nextInt(n / 2)).toLong
      case 2 => col("g") >= (200 + rnd.nextInt(600)).toLong // NULL on i%11
      case 3 => col("s").startsWith(Seq("alpha", "beta", "gamma")(rnd.nextInt(3)))
      case 4 => col("v") > (rnd.nextInt(1500)).toDouble // NaN rows: Spark NaN > x
      case 5 => col("id") >= (n - 1000 - rnd.nextInt(2000)).toLong && col("g").isNotNull
      case 6 => col("s").isin("alpha-3", "beta-7", "gamma-11") || col("id") < 500L
    }

  test("seeded fuzz: surgery DELETE == Spark keep-filter oracle (nulls, NaN, strings)") {
    val rnd = new scala.util.Random(18)
    Surgery.resetCounters()
    var raw = 0L; var rew = 0L; var drop = 0L
    var idxRaw = 0L
    for (trial <- 0 until 10) {
      val dir = tmpDir(s"sfz-del-$trial")
      val indexed = trial % 2 == 1 // half the trials carry a hash index + blooms
      val table = fixture(rnd, dir, indexed = indexed)
      val n = table.count().toInt
      val cond = predicate(rnd, n)
      val keep = table.filter(coalesce(not(cond), lit(true))).collect()
      val expected = keep.map(_.toString).sorted
      Delete.delete(spark, dir, cond)
      raw += Surgery.lastRawChunks.get()
      rew += Surgery.lastRewrittenChunks.get()
      drop += Surgery.lastDroppedChunks.get()
      if (indexed) idxRaw += Surgery.lastRawChunks.get()
      val got = spark.read.format("nimble").load(dir)
        .collect().map(_.toString).sorted
      assert(got.length == expected.length,
        s"trial $trial: row count ${got.length} vs ${expected.length} (cond $cond)")
      assert(got.sameElements(expected), s"trial $trial drifted (cond $cond)")
      if (indexed) {
        // index-domain parity: random surviving + random deleted ids probed
        // through the remapped hash index must agree with the keep oracle
        val keptIds = keep.map(_.getLong(0)).toSet
        val probes = Seq.fill(6)(rnd.nextInt(n).toLong)
        for (pid <- probes) {
          val found = graft.format.Lookup.pointLookup(dir, "id", pid)
          if (keptIds(pid))
            assert(found.length == 1 && found.head("id") == pid,
              s"trial $trial: kept id $pid misresolved via index: $found (cond $cond)")
          else
            assert(found.isEmpty,
              s"trial $trial: deleted id $pid still resolves via index (cond $cond)")
        }
      }
    }
    assert(raw > 0, "no trial raw-copied a chunk — surgery stopped engaging")
    assert(rew > 0, "no trial rewrote a boundary chunk")
    assert(drop > 0, "no trial dropped a whole chunk")
    assert(idxRaw > 0, "no indexed trial took the surgery path — index files regressed to fallback")
  }

  test("seeded fuzz: nanos-split retention deletes == Spark oracle") {
    val rnd = new scala.util.Random(1818)
    Surgery.resetCounters()
    var raw = 0L; var rew = 0L
    for (trial <- 0 until 5) {
      val dir = tmpDir(s"sfz-ns-$trial")
      val n = 30000 + rnd.nextInt(30000)
      val rpc = Seq(2048, 4096)(rnd.nextInt(2))
      // ns values NOT multiples of 1000 (the remainder stream must matter),
      // ascending with id so micros-domain chunk stats actually prune
      spark.range(n.toLong).toDF("id")
        .withColumn("ts", col("id") * 1000003L + (col("id") % 991L))
        .withColumn("v", (col("id") % 83).cast("double"))
        .repartitionByRange(2, col("id")).sortWithinPartitions("id")
        .write.format("nimble").option("sortColumns", "id")
        .option("timestampNanosColumns", "ts")
        .option("rowsPerChunk", rpc.toString).mode("overwrite").save(dir)
      val table = spark.read.format("nimble").load(dir)
      val cutRow = n / 3 + rnd.nextInt(n / 2)
      val cut = cutRow.toLong * 1000003L + rnd.nextInt(991)
      val cond = if (trial % 2 == 0) col("ts") >= cut
        else col("ts") >= cut && col("ts") < cut + rnd.nextInt(n).toLong * 500000L
      val expected = table.filter(coalesce(not(cond), lit(true)))
        .collect().map(_.toString).sorted
      Delete.delete(spark, dir, cond)
      raw += Surgery.lastRawChunks.get()
      rew += Surgery.lastRewrittenChunks.get()
      val got = spark.read.format("nimble").load(dir)
        .collect().map(_.toString).sorted
      assert(got.sameElements(expected), s"nanos trial $trial drifted (cond $cond)")
    }
    assert(raw > 0, "nanos trials must raw-copy kept chunks")
    assert(rew > 0, "nanos trials must rewrite boundary chunks")
  }

  test("seeded fuzz: surgery UPDATE == Spark when/otherwise oracle") {
    val rnd = new scala.util.Random(81)
    Surgery.resetCounters()
    var raw = 0L; var rew = 0L
    for (trial <- 0 until 8) {
      val dir = tmpDir(s"sfz-upd-$trial")
      val table = fixture(rnd, dir)
      val n = table.count().toInt
      val cond = predicate(rnd, n)
      // round-robin (not a random draw): every assignment type must appear
      val (assignCol, lit0): (String, Column) = trial % 3 match {
        case 0 => ("v", lit(-7.5))
        case 1 => ("s", lit("REDACTED"))
        case 2 => ("g", lit(null).cast("long"))
      }
      val condSafe = coalesce(cond, lit(false))
      val expected = table.select(
        col("id"),
        (if (assignCol == "g") when(condSafe, lit0).otherwise(col("g")) else col("g")).as("g"),
        (if (assignCol == "s") when(condSafe, lit0).otherwise(col("s")) else col("s")).as("s"),
        (if (assignCol == "v") when(condSafe, lit0).otherwise(col("v")) else col("v")).as("v"))
        .collect().map(_.toString).sorted
      Delete.update(spark, dir, cond, Map(assignCol -> lit0))
      info(s"trial $trial SET $assignCol cond=$cond -> raw=${Surgery.lastRawChunks.get()} " +
        s"rew=${Surgery.lastRewrittenChunks.get()}")
      raw += Surgery.lastRawChunks.get()
      rew += Surgery.lastRewrittenChunks.get()
      val got = spark.read.format("nimble").load(dir)
        .collect().map(_.toString).sorted
      assert(got.sameElements(expected),
        s"trial $trial drifted (cond $cond, SET $assignCol)")
    }
    assert(raw > 0, "no update trial raw-copied — surgery stopped engaging")
    assert(rew > 0, "no update trial rewrote an assigned chunk")
  }

  test("seeded fuzz: flatmap-table surgery DELETE == Spark oracle") {
    val rnd = new scala.util.Random(9119)
    Surgery.resetCounters()
    var raw = 0L; var rew = 0L
    for (trial <- 0 until 5) {
      val dir = tmpDir(s"sfz-fm-$trial")
      val n = 15000 + rnd.nextInt(20000)
      val rpc = Seq(1024, 2048, 4096)(rnd.nextInt(3))
      val nk = Seq(10, 25, 50)(rnd.nextInt(3))
      // r20: half the trials use '#'-bearing key names — the v15 escape must
      // keep these on the surgery path with exact key round-trips
      val kpfx = if (trial % 2 == 0) "f" else "f#"
      spark.range(n.toLong).toDF("id")
        .selectExpr("id",
          "map_from_arrays(" +
            s"transform(sequence(0, 3), i -> concat('$kpfx', pmod(id * 3 + i * 7, $nk))), " +
            "transform(sequence(0, 3), i -> CAST(id + i AS DOUBLE))) AS m",
          "CAST(id % 101 AS DOUBLE) AS v")
        .repartitionByRange(2, col("id")).sortWithinPartitions("id")
        .write.format("nimble").option("sortColumns", "id")
        .option("flatMapColumns", "m").option("rowsPerChunk", rpc.toString)
        .mode("overwrite").save(dir)
      val table = spark.read.format("nimble").load(dir)
      val cond = trial % 3 match {
        case 0 => col("id") >= (n / 2 + rnd.nextInt(n / 3)).toLong
        case 1 =>
          val lo = rnd.nextInt(n / 2).toLong
          col("id") >= lo && col("id") < lo + 1 + rnd.nextInt(n / 3)
        case _ => col("v") > rnd.nextInt(80).toDouble
      }
      // deterministic map fingerprint (raw map toString order is storage-
      // dependent): value sum + sorted key join
      val fp = Seq("id", "v",
        "aggregate(map_values(m), CAST(0 AS DOUBLE), (a, x) -> a + x) AS ms",
        "array_join(array_sort(map_keys(m)), ',') AS mk")
      val expected = table.filter(coalesce(not(cond), lit(true)))
        .selectExpr(fp: _*).collect().map(_.toString).sorted
      Delete.delete(spark, dir, cond)
      raw += Surgery.lastRawChunks.get()
      rew += Surgery.lastRewrittenChunks.get()
      val got = spark.read.format("nimble").load(dir)
        .selectExpr(fp: _*).collect().map(_.toString).sorted
      assert(got.sameElements(expected), s"flatmap trial $trial drifted (cond $cond)")
    }
    assert(raw > 0, "no flatmap trial raw-copied — fm surgery stopped engaging")
    assert(rew > 0, "no flatmap trial rewrote a boundary chunk")
  }

  test("seeded fuzz: nested-schema surgery DELETE == Spark oracle") {
    val rnd = new scala.util.Random(4242)
    Surgery.resetCounters()
    var raw = 0L; var rew = 0L
    for (trial <- 0 until 5) {
      val dir = tmpDir(s"sfz-nest-$trial")
      val n = 12000 + rnd.nextInt(15000)
      val rpc = Seq(1024, 2048)(rnd.nextInt(2))
      val dedup = trial % 2 == 1
      var w = spark.range(n.toLong).toDF("id")
        .withColumn("g", (col("id") / (20 + rnd.nextInt(60)).toLong).cast("long"))
        .selectExpr("id",
          "named_struct('a', pmod(id, 11), 'b', CAST(id % 3 = 0 AS BOOLEAN)) AS st",
          "sequence(0, pmod(id, 5)) AS arr",
          "array(g, g) AS da",
          "map_from_arrays(array('p', 'q'), array(CAST(id AS DOUBLE), CAST(g AS DOUBLE))) AS mp",
          "CAST(id % 71 AS DOUBLE) AS v")
        .repartitionByRange(2, col("id")).sortWithinPartitions("id")
        .write.format("nimble").option("sortColumns", "id")
        .option("rowsPerChunk", rpc.toString).mode("overwrite")
      if (dedup) w = w.option("dictionaryArrayColumns", "da")
        .option("deduplicatedMapColumns", "mp")
      w.save(dir)
      val table = spark.read.format("nimble").load(dir)
      val cond = trial % 3 match {
        case 0 => col("id") >= (n / 2 + rnd.nextInt(n / 3)).toLong
        case 1 =>
          val lo = rnd.nextInt(n / 2).toLong
          col("id") >= lo && col("id") < lo + 1 + rnd.nextInt(n / 3)
        case _ => col("v") > rnd.nextInt(60).toDouble
      }
      val fp = Seq("id", "v", "st.a AS sa", "st.b AS sb",
        "aggregate(arr, CAST(0 AS LONG), (x, y) -> x + y) AS arrs", "size(arr) AS arrn",
        "aggregate(da, CAST(0 AS LONG), (x, y) -> x + y) AS das",
        "element_at(mp, 'p') AS mpp", "element_at(mp, 'q') AS mpq")
      val expected = table.filter(coalesce(not(cond), lit(true)))
        .selectExpr(fp: _*).collect().map(_.toString).sorted
      Delete.delete(spark, dir, cond)
      raw += Surgery.lastRawChunks.get()
      rew += Surgery.lastRewrittenChunks.get()
      val got = spark.read.format("nimble").load(dir)
        .selectExpr(fp: _*).collect().map(_.toString).sorted
      assert(got.sameElements(expected),
        s"nested trial $trial drifted (dedup=$dedup, cond $cond)")
    }
    assert(raw > 0, "no nested trial raw-copied — nested surgery stopped engaging")
    assert(rew > 0, "no nested trial rewrote a boundary chunk")
  }

  test("seeded fuzz: typed-literal UPDATE (date/timestamp/decimal) == Spark oracle") {
    val rnd = new scala.util.Random(1919)
    Surgery.resetCounters()
    var rew = 0L
    for (trial <- 0 until 6) {
      val dir = tmpDir(s"sfz-typed-$trial")
      val n = 15000 + rnd.nextInt(15000)
      val rpc = Seq(1024, 2048, 4096)(rnd.nextInt(3))
      spark.range(n.toLong).toDF("id")
        .withColumn("d", date_add(lit("2021-06-01").cast("date"), (col("id") % 365).cast("int")))
        .withColumn("ts", timestamp_micros(col("id") * 777777L))
        .withColumn("m", ((col("id") % 9999) / lit(100.0)).cast("decimal(10,2)"))
        .repartitionByRange(2, col("id")).sortWithinPartitions("id")
        .write.format("nimble").option("sortColumns", "id")
        .option("rowsPerChunk", rpc.toString).mode("overwrite").save(dir)
      val table = spark.read.format("nimble").load(dir)
      val lo = rnd.nextInt(n / 2).toLong
      val hi = lo + 1 + rnd.nextInt(n / 4)
      val cond = col("id") >= lo && col("id") < hi
      // round-robin over the r18-verdict-#5 literal types, with a null date
      // arm (SET d = NULL — the redaction shape — widens nullability)
      val (acol, alit): (String, Column) = trial match {
        case 0 => ("d", lit(java.sql.Date.valueOf("1980-05-05")))
        case 3 => ("d", lit(null).cast("date"))
        case 1 | 4 => ("ts", lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00.123456")))
        case _ => ("m", lit(new java.math.BigDecimal("0.00")))
      }
      val condSafe = coalesce(cond, lit(false))
      val expected = table.select(
        col("id"),
        (if (acol == "d") when(condSafe, alit).otherwise(col("d")) else col("d")).as("d"),
        (if (acol == "ts") when(condSafe, alit).otherwise(col("ts")) else col("ts")).as("ts"),
        (if (acol == "m") when(condSafe, alit).otherwise(col("m")) else col("m")).as("m"))
        .collect().map(_.toString).sorted
      Delete.update(spark, dir, cond, Map(acol -> alit))
      rew += Surgery.lastRewrittenChunks.get()
      val got = spark.read.format("nimble").load(dir)
        .collect().map(_.toString).sorted
      assert(got.sameElements(expected),
        s"typed trial $trial drifted (SET $acol, cond $cond)")
    }
    assert(rew > 0, "no typed-literal trial took the surgery path (r18 verdict #5 regressed)")
  }
}
