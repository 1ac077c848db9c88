package graft

import org.apache.spark.sql.functions._
import graft.ops.{Compaction, Delete, ZOrder}

/** Seeded randomized INTERACTION fuzz for the maintenance surface: the
  * per-op fuzz batteries (SurgeryFuzzSpec, ZOrderSpec, CompactionSpec)
  * prove each DML op against its oracle in isolation — this one chains
  * random sequences of DELETE / UPDATE / compactSmall / compact / zorder
  * over one evolving table, checking full content parity against a
  * Spark-maintained oracle after EVERY step. Chains are where
  * layout-recovery interactions hide: surgery output gets raw-concatenated,
  * a zordered (curve-clustered, unsorted) table gets surgered again, index
  * and bloom streams survive each rewrite generation. Half the trials run
  * index+bloom-bearing tables so every op crosses the index-remap paths. */
class DmlChainFuzzSpec extends SparkTestBase {
  import spark.implicits._

  test("seeded fuzz: chained DELETE/UPDATE/compact/zorder == Spark-maintained oracle at every step") {
    val rnd = new scala.util.Random(191)
    val cats = Seq("alpha", "beta", "gamma", "delta")
    for (trial <- 0 until 4) {
      val n = 15000 + rnd.nextInt(15000)
      val rows = (0 until n).map { i =>
        val g: Option[Long] = if (i % 11 == 0) None else Some((i % 700).toLong)
        (i.toLong, g, cats(i % 4) + "-" + (i % 13), (i % 4000).toDouble / 7.0)
      }
      val indexed = trial % 2 == 0
      var step = 0
      var cur = tmpDir(s"dmlchain-$trial-$step")
      var w = rows.toDF("id", "g", "s", "v")
        .repartitionByRange(3, col("id")).sortWithinPartitions("id")
        .write.format("nimble").option("sortColumns", "id")
        .option("rowsPerChunk", "2048").mode("overwrite")
      if (indexed) w = w.option("indexColumns", "id").option("bloomFilterColumns", "s")
      w.save(cur)
      var oracle = rows.toDF("id", "g", "s", "v")

      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), if (r.isNullAt(1)) Long.MinValue else r.getLong(1),
          r.getString(2), r.getDouble(3))

      val nOps = 5 + rnd.nextInt(3)
      val ops = scala.collection.mutable.ArrayBuffer[String]()
      for (_ <- 0 until nOps) {
        rnd.nextInt(5) match {
          case 0 =>
            // tail-ish retention delete; g-null rows never match, so the
            // table can never fully empty mid-chain
            val pred = col("id") >= rnd.nextInt(n).toLong && col("g").isNotNull
            Delete.delete(spark, cur, pred)
            oracle = oracle.filter(!coalesce(pred, lit(false)))
            ops += "delete"
          case 1 =>
            val nv = rnd.nextInt(100).toDouble
            val pred = col("s").startsWith(cats(rnd.nextInt(4)))
            Delete.update(spark, cur, pred, Map("v" -> lit(nv)))
            oracle = oracle.withColumn("v", when(pred, lit(nv)).otherwise(col("v")))
            ops += "update"
          case 2 =>
            Compaction.compactSmall(spark, cur,
              minFileBytes = 1L << 20, targetFileBytes = 8L << 20)
            ops += "compactSmall"
          case 3 =>
            step += 1
            val nxt = tmpDir(s"dmlchain-$trial-$step")
            Compaction.compact(spark, cur, nxt, targetFileBytes = 4L << 20)
            cur = nxt
            ops += "compact"
          case 4 =>
            step += 1
            val nxt = tmpDir(s"dmlchain-$trial-$step")
            ZOrder.zorder(spark, cur, nxt, Seq("id", "v"),
              targetFileBytes = 4L << 20, buckets = 64)
            cur = nxt
            ops += "zorder"
        }
        val got = spark.read.format("nimble").load(cur).collect().map(key).sortBy(identity)
        val want = oracle.collect().map(key).sortBy(identity)
        assert(got.length == want.length,
          s"trial=$trial indexed=$indexed after [${ops.mkString(",")}]: " +
            s"rows ${got.length} vs ${want.length}")
        assert(got.toSeq == want.toSeq,
          s"trial=$trial indexed=$indexed after [${ops.mkString(",")}]: content diverged, " +
            s"first diff=${got.zip(want).find(p => p._1 != p._2)}")
      }
      // indexed trials: the index must still answer point lookups after the
      // whole chain (positions remapped through every rewrite generation)
      if (indexed) {
        val survivors = oracle.select("id").collect().map(_.getLong(0))
        if (survivors.nonEmpty) {
          val probe = survivors(rnd.nextInt(survivors.length))
          val hit = spark.read.format("nimble").load(cur)
            .filter(col("id") === probe).collect()
          assert(hit.length == 1 && hit(0).getLong(0) == probe,
            s"trial=$trial post-chain point lookup for $probe failed")
        }
      }
    }
  }

  test("unsigned chain: stored-domain deletes + compact + zorder keep widened parity") {
    // r20: the unsigned stored-domain translation under CHAINED maintenance —
    // widened-domain deletes (sign boundary crossing), id-range deletes,
    // raw-concat compaction and a zorder rewrite must all preserve the
    // stored physical domain and the widened read at every step
    val rnd = new scala.util.Random(201)
    val opts = Map("unsignedColumns" -> "u")
    for (trial <- 0 until 2) {
      val n = 20000
      var step = 0
      var cur = tmpDir(s"dmlchain-u-$trial-$step")
      spark.range(n.toLong)
        .selectExpr("id",
          "CAST(CASE WHEN id % 3 = 0 THEN -(id % 2000) - 1 ELSE id % 2000 END AS SHORT) AS u",
          "CAST(id % 97 AS DOUBLE) AS v")
        .repartitionByRange(3, col("id")).sortWithinPartitions("id")
        .write.format("nimble").option("sortColumns", "id")
        .option("rowsPerChunk", "2048").mode("overwrite").save(cur)
      // oracle in the WIDENED domain
      var oracle: Seq[(Long, Long, Double)] = (0L until n.toLong).map { i =>
        val raw = if (i % 3 == 0) -(i % 2000) - 1 else i % 2000
        (i, if (raw < 0) raw + 65536 else raw, (i % 97).toDouble)
      }
      val ops = scala.collection.mutable.ArrayBuffer[String]()
      for (_ <- 0 until 4) {
        rnd.nextInt(4) match {
          case 0 => // widened-domain delete, threshold can cross the sign boundary
            val x = 1000 + rnd.nextInt(63000)
            val rep = Delete.delete(spark, cur, col("u") > x, opts)
            val before = oracle.size
            oracle = oracle.filterNot(_._2 > x)
            assert(rep.rowsDeleted == (before - oracle.size).toLong,
              s"trial=$trial widened delete count drifted at x=$x: $rep")
            ops += s"uDelete($x)"
          case 1 => // id-range delete (non-unsigned reference column)
            val y = (n / 2 + rnd.nextInt(n / 2)).toLong
            Delete.delete(spark, cur, col("id") >= y, opts)
            oracle = oracle.filterNot(_._1 >= y)
            ops += s"idDelete($y)"
          case 2 =>
            step += 1
            val nxt = tmpDir(s"dmlchain-u-$trial-$step")
            Compaction.compact(spark, cur, nxt, targetFileBytes = 4L << 20)
            cur = nxt
            ops += "compact"
          case 3 =>
            step += 1
            val nxt = tmpDir(s"dmlchain-u-$trial-$step")
            ZOrder.zorder(spark, cur, nxt, Seq("id", "v"),
              targetFileBytes = 4L << 20, buckets = 64)
            cur = nxt
            ops += "zorder"
        }
        // stored domain intact on disk
        val storedType = org.apache.spark.sql.types.DataType
          .fromJson(graft.spark.NimbleSource.footerOf(
            graft.spark.NimbleSource.listFiles(cur).head).schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]("u").dataType
        assert(storedType == org.apache.spark.sql.types.ShortType,
          s"trial=$trial after [${ops.mkString(",")}]: stored domain changed to $storedType")
        // widened read parity
        val got = spark.read.format("nimble").options(opts).load(cur)
          .selectExpr("id", "CAST(u AS LONG) AS u", "v")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .sortBy(identity)
        assert(got.toSeq == oracle.sortBy(identity),
          s"trial=$trial after [${ops.mkString(",")}]: widened content diverged " +
            s"(${got.length} vs ${oracle.size} rows)")
      }
    }
  }
}
