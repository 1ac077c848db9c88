package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, Dedup, Multimodal, Similarity, TextAnalysis}
import scala.jdk.CollectionConverters._

/** Driver contract — see /root/repo/SURVEY.md §2.9 + §2.8.
  *
  * Every query reads the driver testdata THROUGH the nimble connector
  * (parquet -> tablet conversion cached per scale factor by [[Tables]]), so
  * each entry exercises format write, scan, projection/filter pushdown, and
  * stripe pruning end-to-end; the DuckDB oracle runs equivalent ANSI SQL on
  * the original parquet.
  *
  * Float determinism: aggregate sums route through DECIMAL casts (exact,
  * order-independent) and only the final value is cast to DOUBLE; ratios are
  * single divisions of exact values — so hashes match the oracle bit-for-bit.
  */
object SparkEntry {

  /** Flagship: TPC-H Q1 over the nimble connector on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q13_tpch_q1")(spark, "/root/testdata/sf0.001")

  /** Register nimble-backed temp views for the named tables. */
  private def views(s: SparkSession, dir: String, tables: String*): Unit =
    tables.foreach(t => Tables.nimble(s, dir, t).createOrReplaceTempView(t))

  private def q(tables: Seq[String], sql: String): (SparkSession, String) => DataFrame =
    (s, dir) => { views(s, dir, tables: _*); s.sql(sql) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.9 scan/pushdown family (connector capabilities) ----
    "q01_scan_full" -> q(Seq("lineitem"),
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         unix_millis(cast(l_shipdate AS TIMESTAMP)) AS l_shipdate_ms FROM lineitem"""),
    "q02_projection" -> q(Seq("lineitem"),
      "SELECT l_orderkey, l_quantity FROM lineitem"),
    "q03_filter_num" -> q(Seq("lineitem"),
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45"),
    "q04_filter_str_in" -> q(Seq("lineitem"),
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus FROM lineitem
         WHERE l_returnflag IN ('A','N') AND l_linestatus = 'F'"""),
    "q05_filter_null" -> q(Seq("lineitem"),
      """SELECT l_returnflag, count(1) AS cnt FROM lineitem
         WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
         GROUP BY l_returnflag"""),
    "q06_filter_range" -> q(Seq("lineitem"),
      """SELECT l_orderkey, l_linenumber, unix_millis(cast(l_shipdate AS TIMESTAMP)) AS sd_ms FROM lineitem
         WHERE l_shipdate >= timestamp'1996-01-01 00:00:00'
           AND l_shipdate < timestamp'1997-01-01 00:00:00'"""),
    "q07_topk" -> q(Seq("lineitem"),
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         ORDER BY l_orderkey, l_linenumber LIMIT 100"""),
    "q08_stats_agg" -> q(Seq("lineitem"),
      """SELECT count(1) AS cnt, count(l_quantity) AS cnt_q,
         min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
         min(l_quantity) AS min_q, max(l_quantity) AS max_q,
         min(l_returnflag) AS min_rf, max(l_returnflag) AS max_rf,
         min(unix_millis(cast(l_shipdate AS TIMESTAMP))) AS min_sd, max(unix_millis(cast(l_shipdate AS TIMESTAMP))) AS max_sd
         FROM lineitem"""),
    "q09_index_scan" -> q(Seq("orders"),
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         unix_millis(cast(o_orderdate AS TIMESTAMP)) AS o_orderdate_ms, o_orderpriority
         FROM orders WHERE o_custkey = 371"""),
    "q10_nested" -> ((s, dir) => {
      val orders = Tables.nimble(s, dir, "orders")
      val nested = orders.select(
        col("o_orderkey"),
        struct(col("o_orderstatus").as("status"), col("o_totalprice").as("total")).as("st"),
        array(col("o_totalprice"), col("o_totalprice") * 2.0).as("arr"),
        map(lit("s"), col("o_orderstatus")).as("m"))
      val rt = Tables.roundTrip(s, dir, "q10_nested", nested)
      rt.select(
        col("o_orderkey"),
        col("st.status").as("status"),
        col("st.total").as("total"),
        explode(col("arr")).as("v"),
        col("m")(lit("s")).as("ms"))
    }),
    "q11_flatmap_proj" -> ((s, dir) => {
      // written as a FLATMAP (per-key shredded streams), read back merged —
      // the full §1.3 FlatMap path inside the oracle-checked loop
      val docs = Tables.nimble(s, dir, "documents")
      val asMap = docs.select(col("doc_id"), map(col("source"), col("n_chars")).as("m"))
      val rt = Tables.roundTrip(s, dir, "q11_flatmap", asMap,
        Map("flatMapColumns" -> "m"))
      rt.select(
        col("doc_id"),
        col("m")(lit("src3")).as("v_src3"),
        col("m")(lit("src7")).as("v_src7"))
    }),
    "q12_encoding_grid" -> q(Seq("events"),
      """SELECT count(1) AS cnt, min(event_id) AS min_id, max(event_id) AS max_id,
         min(user_id) AS min_u, max(user_id) AS max_u,
         min(event_type) AS min_et, max(event_type) AS max_et,
         count(DISTINCT event_type) AS ndv_et,
         min(value) AS min_v, max(value) AS max_v,
         min(ts DIV 1000) AS min_ts_us, max(ts DIV 1000) AS max_ts_us
         FROM events"""),

    // ---- relational inventory inherited from Spark (§2.7) ----
    "q13_tpch_q1" -> q(Seq("lineitem"),
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(1) AS avg_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(1) AS avg_price,
         CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(1) AS avg_disc,
         count(1) AS count_order
         FROM lineitem WHERE l_shipdate <= timestamp'1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus"""),
    "q14_tpch_q6" -> q(Seq("lineitem"),
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= timestamp'1996-01-01 00:00:00'
           AND l_shipdate < timestamp'1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24"""),
    "q15_join_agg" -> q(Seq("orders", "customer"),
      """SELECT c_mktsegment, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
         count(1) AS n
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment"""),
    "q16_window" -> q(Seq("orders"),
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey,
                  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t
         WHERE rn <= 3"""),
    "q17_setops" -> q(Seq("customer", "orders"),
      """SELECT c_custkey AS k FROM customer
         EXCEPT
         SELECT o_custkey AS k FROM orders"""),
    "q18_rollup" -> q(Seq("nation", "region"),
      """SELECT coalesce(r_name, '__ALL__') AS region, coalesce(n_name, '__ALL__') AS nation,
         count(1) AS cnt
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)"""),
    "q19_semijoin" -> q(Seq("customer", "orders"),
      """SELECT count(1) AS n FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""),
    "q20_events_window" -> q(Seq("events"),
      """SELECT event_type, ts - ts % 3600000000000 AS hour_ns,
         count(1) AS cnt, min(value) AS min_v, max(value) AS max_v
         FROM events GROUP BY event_type, ts - ts % 3600000000000"""),
    "q21_sessionize" -> q(Seq("events"),
      """SELECT user_id, count(1) AS n_sessions, max(session_len) AS max_len FROM (
           SELECT user_id, session_id, count(1) AS session_len FROM (
             SELECT user_id, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
             FROM (
               SELECT user_id, ts, event_id,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        > 1800000000000 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
               FROM events) t1) t2
           GROUP BY user_id, session_id) t3
         GROUP BY user_id"""),
    "q22_json_extract" -> q(Seq("events"),
      """SELECT get_json_object(props, '$.k') AS k, count(1) AS cnt
         FROM events GROUP BY get_json_object(props, '$.k')"""),
    // filtered aggregate pushdown (ValueHook-lite): every stripe all-matches
    // l_orderkey >= 0, so COUNT/MIN/MAX are answered from footer stats with
    // the filter pushed — zero data bytes read (AggPushdown.tryComputeFiltered)
    "q23_filtered_agg" -> q(Seq("lineitem"),
      """SELECT count(1) AS cnt, min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
         min(l_quantity) AS min_q, max(l_quantity) AS max_q
         FROM lineitem WHERE l_orderkey >= 0"""),
    // sorted-index range probe (SortedIndex analog): orders re-written with a
    // sorted (key,position) index on o_orderkey — data arrives sorted by
    // o_custkey, so the range genuinely needs the index, not stripe stats
    "q24_range_lookup" -> ((s, dir) => {
      val src = Tables.nimble(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val d = Tables.roundTripDir(s, dir, "q24_range_lookup", src,
        Map("indexColumns" -> "o_orderkey"))
      val rows = graft.format.Lookup.rangeLookup(d, "o_orderkey", 1000L, 1500L)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_custkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_orderstatus", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("o_totalprice", org.apache.spark.sql.types.DoubleType)))
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          rows.map(m => org.apache.spark.sql.Row(
            m("o_orderkey"), m("o_custkey"), m("o_orderstatus"), m("o_totalprice"))).asJava),
        schema)
    }),
    // composite sorted index (KeyEncoder analog): prefix-equality on
    // o_orderstatus + range on o_custkey via the memcomparable #cidx stream
    "q25_composite_lookup" -> ((s, dir) => {
      val src = Tables.nimble(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val d = Tables.roundTripDir(s, dir, "q25_composite_lookup", src,
        Map("indexColumns" -> "o_orderstatus+o_custkey"))
      val rows = graft.format.Lookup.compositeLookup(
        d, Seq("o_orderstatus", "o_custkey"), Seq("O"), Some((100L, 140L)))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_custkey", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_orderstatus", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("o_totalprice", org.apache.spark.sql.types.DoubleType)))
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          rows.map(m => org.apache.spark.sql.Row(
            m("o_orderkey"), m("o_custkey"), m("o_orderstatus"), m("o_totalprice"))).asJava),
        schema)
    }),

    // mid-scan filtered aggregation (ValueHook proper): l_quantity is
    // uniform within stripes, so every surviving stripe is MIXED — the
    // partials fold during the scan's decode loop (AggScan), not from stats
    "q26_midscan_agg" -> q(Seq("lineitem"),
      """SELECT count(1) AS cnt, count(l_returnflag) AS cnt_rf,
         min(l_orderkey) AS min_ok, max(l_extendedprice) AS max_price,
         min(l_returnflag) AS min_rf, max(l_returnflag) AS max_rf
         FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05"""),
    // unsigned import widening (SURVEY §1.2): signed two's-complement bit
    // patterns written to a nimble table read back widened
    // (u8->short, u16->int, u32->long, u64->decimal(20,0)); the oracle
    // replays the reinterpretation arithmetically from the source parquet
    "q27_unsigned_widen" -> ((s, dir) => {
      val src = Tables.nimble(s, dir, "orders").selectExpr(
        "o_orderkey",
        "CAST((o_custkey % 256) - 128 AS TINYINT) AS u8",
        "CAST((o_custkey % 65536) - 32768 AS SMALLINT) AS u16",
        "CAST(o_custkey - 2000 AS INT) AS u32",
        "CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey ELSE -o_orderkey END AS u64")
      val d = Tables.roundTripDir(s, dir, "q27_unsigned_widen", src)
      s.read.format("nimble").option("unsignedColumns", "u8,u16,u32,u64").load(d)
        .selectExpr("o_orderkey", "u8", "u16", "u32", "CAST(u64 AS STRING) AS u64")
    }),

    // SUM/AVG pushdown (decode-fold — footer stats carry no sums): the
    // shipdate filter splits stripes into all-match / mixed; surviving
    // chunks fold sums during decode, stats-answerable ops (count/max)
    // still fold from chunk stats, and AVG arrives split into SUM+COUNT
    // by Spark's partial-pushdown rewrite (SPARK-37839)
    "q28_agg_sum" -> q(Seq("lineitem"),
      """SELECT count(1) AS cnt, sum(l_suppkey) AS sum_sk, sum(l_quantity) AS sum_qty,
         avg(l_quantity) AS avg_qty, max(l_quantity) AS max_q
         FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-06-01'"""),

    // grouped aggregate pushdown: GROUP BY low-card strings rides the
    // mid-scan fold — dict-preserved chunks key accumulators by composite
    // dictionary id (no per-row hashing), one partial row per (task, group)
    "q29_group_agg" -> q(Seq("lineitem"),
      """SELECT l_returnflag, l_linestatus, count(1) AS cnt, sum(l_quantity) AS sum_qty,
         avg(l_quantity) AS avg_qty, sum(l_suppkey) AS sum_sk, max(l_extendedprice) AS max_price
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus"""),

    // pushed TopN over the declared-sorted lineitem table: the scan plans
    // only each file's tail stripes (row-range skip); projecting just the
    // sort column keeps the tie cut deterministic as a multiset
    "q30_topn_pushdown" -> q(Seq("lineitem"),
      "SELECT l_orderkey FROM lineitem ORDER BY l_orderkey DESC LIMIT 500"),

    // storage-partitioned join: lineitem/orders co-bucketed on the join key
    // (bucket(16) at write), so the join runs with ZERO shuffle on either
    // side — the catalog resolves the bucket transform and the scans report
    // KeyGroupedPartitioning (BucketingSpec pins the no-Exchange plan)
    "q31_spj_join" -> ((s, dir) => {
      val cat = Tables.spjTables(s, dir)
      s.sql(s"""SELECT l.l_orderkey AS okey, count(1) AS cnt,
               max(l.l_extendedprice) AS max_price, max(o.o_totalprice) AS max_total
               FROM $cat.lineitem_b l JOIN $cat.orders_b o ON l.l_orderkey = o.o_orderkey
               GROUP BY l.l_orderkey""")
    }),

    // OPTIMIZE end-to-end: a 16-file sorted+indexed table compacts to one
    // file with its layout recovered from the footers alone; the compacted
    // table must answer queries identically to the original data
    "q32_compact_scan" -> ((s, dir) => {
      val src = Tables.parquet(s, dir, "orders")
        .repartitionByRange(16, col("o_orderkey")).sortWithinPartitions("o_orderkey")
      val srcDir = Tables.roundTripDir(s, dir, "q32_src", src,
        Map("sortColumns" -> "o_orderkey", "indexColumns" -> "o_orderkey"))
      val outDir = srcDir + "-compacted"
      graft.ops.Compaction.compact(s, srcDir, outDir, targetFileBytes = 1L << 30)
      s.read.format("nimble").load(outDir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          min("o_orderkey").as("min_ok"), max("o_orderkey").as("max_ok"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    }),

    // row-level DELETE end-to-end: a sorted 16-file table takes one
    // file-separable range delete (metadata-only file unlinks) plus one
    // keyhole delete (copy-on-write rewrite of the hit files); the
    // surviving table must answer identically to filtering the source
    "q33_delete" -> ((s, dir) => {
      val src = Tables.parquet(s, dir, "orders")
        .repartitionByRange(16, col("o_orderkey")).sortWithinPartitions("o_orderkey")
      val srcDir = Tables.roundTripDir(s, dir, "q33_src", src,
        Map("sortColumns" -> "o_orderkey"))
      val cut = 30000L
      graft.ops.Delete.delete(s, srcDir, col("o_orderkey") > cut) // file-separable
      graft.ops.Delete.delete(s, srcDir, // keyhole: mixed-file rewrite
        col("o_orderkey") >= 100L && col("o_orderkey") <= 500L)
      s.read.format("nimble").load(srcDir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          min("o_orderkey").as("min_ok"), max("o_orderkey").as("max_ok"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    }),

    // row-level UPDATE end-to-end: matching rows take new values computed
    // from their ORIGINAL columns, non-matching rows and provably-untouched
    // files stay byte-identical
    "q34_update" -> ((s, dir) => {
      val src = Tables.parquet(s, dir, "orders")
        .repartitionByRange(16, col("o_orderkey")).sortWithinPartitions("o_orderkey")
      val srcDir = Tables.roundTripDir(s, dir, "q34_src", src,
        Map("sortColumns" -> "o_orderkey"))
      graft.ops.Delete.update(s, srcDir,
        col("o_orderkey") <= 5000L && col("o_orderstatus") === "F",
        Map("o_orderstatus" -> lit("X")))
      s.read.format("nimble").load(srcDir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    }),

    // MERGE/upsert end-to-end: a delta of updates (every 100th key flips to
    // status 'U') plus inserts (new keys past the table max, status 'N')
    // applies with SQL MERGE semantics; the merged table must answer
    // identically to the relational replay
    "q35_merge" -> ((s, dir) => {
      val src = Tables.parquet(s, dir, "orders")
        .repartitionByRange(16, col("o_orderkey")).sortWithinPartitions("o_orderkey")
      val srcDir = Tables.roundTripDir(s, dir, "q35_src", src,
        Map("sortColumns" -> "o_orderkey"))
      val updates = Tables.parquet(s, dir, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .withColumn("o_orderstatus", lit("U"))
      val inserts = Tables.parquet(s, dir, "orders")
        .filter(col("o_orderkey") % 100 === 50)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
        .withColumn("o_orderstatus", lit("N"))
      graft.ops.Merge.upsert(s, srcDir, updates.unionByName(inserts), Seq("o_orderkey"))
      s.read.format("nimble").load(srcDir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), max("o_orderkey").as("max_ok"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    }),

    // SQL row-level DML end-to-end through the catalog: UPDATE takes the
    // group-based copy-on-write path (the predicate is mixed inside the
    // hit files), DELETE short-circuits metadata checks where stats prove
    // it; the surviving table must answer identically to the relational
    // replay
    "q36_sql_rowlevel" -> ((s, dir) => {
      val cat = Tables.spjTables(s, dir)
      s.sql(s"DROP TABLE IF EXISTS $cat.rl_orders")
      Tables.parquet(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .repartitionByRange(8, col("o_orderkey")).sortWithinPartitions("o_orderkey")
        .writeTo(s"$cat.rl_orders").tableProperty("sortColumns", "o_orderkey").create()
      s.sql(s"UPDATE $cat.rl_orders SET o_orderstatus = 'X' " +
        "WHERE o_orderkey <= 1000 AND o_orderstatus = 'O'")
      s.sql(s"DELETE FROM $cat.rl_orders WHERE o_totalprice > 250000.0")
      s.table(s"$cat.rl_orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    }),

    // incremental OPTIMIZE end-to-end: a sorted orders table with a
    // small-file tail compacts in place (only the tail rewrites; the
    // well-sized files never open) and answers identically to the source
    "q38_compact_small" -> ((s, dir) => {
      val src = Tables.parquet(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val sorted = src.repartitionByRange(2, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
      val base = Tables.roundTripDir(s, dir, "q38_src", sorted,
        Map("sortColumns" -> "o_orderkey"))
      val work = base + "-inc"
      graft.format.GraftIO.delete(work, recursive = true)
      s.read.format("nimble").load(base).write.format("nimble")
        .mode("overwrite").option("sortColumns", "o_orderkey").save(work)
      // small tail: 8 tiny sorted files appended after the fact
      src.filter(col("o_orderkey") % 97 === 0)
        .repartitionByRange(8, col("o_orderkey")).sortWithinPartitions("o_orderkey")
        .write.format("nimble").mode("append")
        .option("sortColumns", "o_orderkey").save(work)
      graft.ops.Compaction.compactSmall(s, work,
        minFileBytes = 1L << 16, targetFileBytes = 1L << 30)
      s.read.format("nimble").load(work)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          min("o_orderkey").as("min_ok"), max("o_orderkey").as("max_ok"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    }),

    // OPTIMIZE ZORDER end-to-end: lineitem rewritten on the Morton curve
    // over (l_partkey, l_suppkey) answers a both-dimension filter query
    // identically to the parquet original — the rewrite is value-preserving
    // and declares no false sort (pruning rides plain stripe stats)
    "q37_zorder" -> ((s, dir) => {
      val src = Tables.parquet(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
      val srcDir = Tables.roundTripDir(s, dir, "q37_src", src)
      val zDir = srcDir + "-zordered"
      graft.ops.ZOrder.zorder(s, srcDir, zDir, Seq("l_partkey", "l_suppkey"),
        targetFileBytes = 1L << 30)
      s.read.format("nimble").load(zDir)
        .filter(col("l_partkey") <= 200 || col("l_suppkey") <= 10)
        .groupBy((col("l_suppkey") % 7).cast("int").as("sgrp"))
        .agg(count(lit(1)).as("cnt"),
          min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
    }),

    // SQL CALL maintenance end-to-end: fragment a catalog table, fold it
    // with CALL compact_small, re-cluster with CALL zorder, and answer a
    // both-dimension filter identically to the parquet source
    "q39_call_optimize" -> ((s, dir) => {
      val cat = Tables.spjTables(s, dir)
      s.sql(s"DROP TABLE IF EXISTS $cat.opt_li")
      Tables.parquet(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
        .repartition(8)
        .writeTo(s"$cat.opt_li").create()
      s.sql(s"CALL $cat.system.compact_small(table => 'opt_li', " +
        s"min_file_bytes => ${1L << 30}, target_file_bytes => ${1L << 30})")
      s.sql(s"CALL $cat.system.zorder(table => 'opt_li', " +
        "columns => 'l_partkey,l_suppkey')")
      s.table(s"$cat.opt_li")
        .filter(col("l_partkey") <= 150 || col("l_suppkey") <= 8)
        .agg(count(lit(1)).as("cnt"),
          min("l_partkey").as("min_pk"), max("l_suppkey").as("max_sk"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
    }),

    // nested struct-leaf predicate pruning: lineitem packed into a struct,
    // written clustered by the leaf `st.d` — the range filter on the dotted
    // path prunes stripes from the leaf stream's stats (never claimed as
    // pushed; Spark re-evaluates rows, so pruning only proves none-match)
    "q40_nested_prune" -> ((s, dir) => {
      val nested = Tables.nimble(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          struct(col("l_shipdate").as("d"), col("l_quantity").as("qty"),
            col("l_extendedprice").as("px")).as("st"))
        .orderBy(col("st.d"), col("l_orderkey"), col("l_linenumber"))
      val d = Tables.roundTripDir(s, dir, "q40_nested_prune", nested,
        Map("stripeBytes" -> "262144"))
      s.read.format("nimble").load(d)
        .filter(col("st.d") >= lit("2001-06-01 00:00:00").cast("timestamp_ntz") &&
          col("st.d") < lit("2001-09-01 00:00:00").cast("timestamp_ntz"))
        .select(col("l_orderkey"), col("l_linenumber"),
          unix_millis(col("st.d").cast("timestamp")).as("d_ms"), col("st.qty").as("qty"))
    }),

    // nested struct-leaf aggregate pushdown: min/max/count over dotted
    // struct paths answer from the leaf streams' footer stats (O(metadata)
    // LocalScan — leaf streams are row-aligned, so their stats mirror
    // Spark's field extraction exactly)
    "q41_nested_agg" -> ((s, dir) => {
      val nested = Tables.nimble(s, dir, "lineitem")
        .select(col("l_orderkey"),
          struct(col("l_quantity").as("qty"), col("l_extendedprice").as("px"),
            col("l_shipdate").as("d")).as("st"))
      val d = Tables.roundTripDir(s, dir, "q41_nested_agg", nested)
      s.read.format("nimble").load(d)
        .agg(count(col("st.qty")).as("cnt"),
          min(col("st.qty")).as("min_q"), max(col("st.qty")).as("max_q"),
          min(col("st.px")).as("min_px"), max(col("st.px")).as("max_px"),
          unix_millis(min(col("st.d")).cast("timestamp")).as("min_d_ms"))
    }),

    // multi-directory read (.load(dirA, dirB), parquet parity): orders
    // split by key range into two tablet directories, loaded as one table —
    // pruning/pushdown span both roots, the union answers like the source
    "q42_multipath" -> ((s, dir) => {
      val orders = Tables.nimble(s, dir, "orders")
      val dA = Tables.roundTripDir(s, dir, "q42_lo", orders.filter(col("o_orderkey") % 2 === 0))
      val dB = Tables.roundTripDir(s, dir, "q42_hi", orders.filter(col("o_orderkey") % 2 =!= 0))
      s.read.format("nimble").load(dA, dB)
        .filter(col("o_totalprice") > 50000.0)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), min(col("o_orderkey")).as("min_ok"),
          max(col("o_orderkey")).as("max_ok"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    }),

    // batch index-lookup table function (SelectiveNimbleIndexReader
    // surface): one SQL call, many probe requests, results in request order
    // with lookup_seq carrying the request index — including a repeated key
    // (two requests for the same key each get their own result rows)
    "q43_lookup_tvf" -> ((s, dir) => {
      val src = Tables.nimble(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val d = Tables.roundTripDir(s, dir, "q43_lookup_tvf", src,
        Map("indexColumns" -> "o_orderkey"))
      graft.spark.NimbleLookupTvf.install(s)
      s.sql(s"""SELECT lookup_seq, o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM nimble_lookup('$d', 'o_orderkey', 7, 1211, 42, 1211, 998)""")
    }),
    // range probes through the same surface (IndexLookup.h:55-65 bounds):
    // two inclusive ranges + a point probe in one request batch
    "q44_lookup_range" -> ((s, dir) => {
      val src = Tables.nimble(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val d = Tables.roundTripDir(s, dir, "q44_lookup_range", src,
        Map("indexColumns" -> "o_orderkey"))
      graft.spark.NimbleLookupTvf.install(s)
      s.sql(s"""SELECT lookup_seq, o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM nimble_lookup('$d', 'o_orderkey',
          named_struct('lo', 100, 'hi', 140),
          named_struct('lo', 4000, 'hi', 4005),
          7)""")
    }),

    // composite struct probes through the TVF's r17 BATCH path: equality
    // tuples + an eq-prefix+range request answered with one #cidx load per
    // stripe for the whole batch (request order via lookup_seq)
    "q45_lookup_composite_batch" -> ((s, dir) => {
      val src = Tables.nimble(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val d = Tables.roundTripDir(s, dir, "q45_lookup_composite_batch", src,
        Map("indexColumns" -> "o_orderstatus+o_custkey"))
      graft.spark.NimbleLookupTvf.install(s)
      s.sql(s"""SELECT lookup_seq, o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM nimble_lookup('$d', 'o_orderstatus+o_custkey',
          struct('O', 400),
          struct('F', named_struct('lo', 10, 'hi', 15)),
          struct('P', 77),
          struct('O', 400))""")
    }),

    // ---- LLM-data-pipeline extensions (§2.8) ----
    "x01_dedup_fingerprint" -> ((s, dir) =>
      Dedup.fingerprintGroups(Tables.nimble(s, dir, "documents"), "doc_id", "text")),
    "x02_neardup_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(Tables.nimble(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.8)),
    // bands=32 (r=1): a pair at Jaccard J is missed only with prob (1-J)^32
    // (2.3e-10 at the 0.5 threshold) and every candidate is exact-verified,
    // so the output equals the exact all-pairs result — full DuckDB oracle.
    "x03_neardup_minhash" -> ((s, dir) =>
      Dedup.minhashPairs(Tables.nimble(s, dir, "documents"), "doc_id", "text",
        n = 3, numPerms = 32, bands = 32, threshold = 0.5)),
    "x04_simhash" -> ((s, dir) =>
      Dedup.simhash(Tables.nimble(s, dir, "documents"), "doc_id", "text")),
    "x05_embed_topk" -> ((s, dir) => {
      val emb = Tables.nimble(s, dir, "embeddings")
      Similarity.cosineTopK(emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", 3)
    }),
    "x06_embed_lsh_ann" -> ((s, dir) => {
      val emb = Tables.nimble(s, dir, "embeddings")
      Similarity.lshTopK(emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding",
        k = 3, dims = 64, planes = 6, nprobes = 3)
    }),
    "x07_text_quality" -> ((s, dir) =>
      TextAnalysis.quality(Tables.nimble(s, dir, "documents"), "doc_id", "text")),
    "x08_token_count" -> ((s, dir) => {
      val docs = Tables.nimble(s, dir, "documents")
      docs.select(col("doc_id"),
        TextAnalysis.wsTokens(col("text")).as("ws_tokens"),
        TextAnalysis.bpeTokens(col("text")).as("bpe_tokens"))
    }),
    "x09_langid" -> ((s, dir) => {
      val docs = Tables.nimble(s, dir, "documents")
      docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("pred_lang"))
    }),
    "x10_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(Tables.nimble(s, dir, "documents"), "doc_id", "text")),
    "x11_multimodal" -> ((s, dir) => {
      val docs = Tables.nimble(s, dir, "documents")
      val media = Multimodal.decodeStub(Multimodal.binarize(docs, "doc_id", col("text"), "text/plain"))
      media.select(
        col("doc_id"),
        col("meta.size").as("media_size"),
        col("meta.sha").as("media_sha"),
        col("decoded.width").as("w"),
        col("decoded.height").as("h"),
        ceil(col("meta.size").cast("double") / 64.0).cast("int").as("n_frames"))
    }),
    "x12_frame_sample" -> ((s, dir) => {
      val docs = Tables.nimble(s, dir, "documents")
      val media = Multimodal.binarize(docs, "doc_id", col("text"), "text/plain")
      Multimodal.sampleFrames(media, "doc_id", frameBytes = 64, everyNth = 2)
        .select(col("doc_id"), col("frame_idx"), col("frame_size"))
    }),
    "x13_embed_neardup" -> ((s, dir) => {
      val emb = Tables.nimble(s, dir, "embeddings")
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", threshold = 0.4)
    }),
    // IVF coarse quantization (the ANN scale path's other half): every 50th
    // vector stands in for a trained centroid codebook; each vector joins its
    // nearest cell only. Oracle replays the argmax-cosine assignment in SQL.
    "x14_ivf_assign" -> ((s, dir) => {
      val emb = Tables.nimble(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.ivfAssign(emb, "vec_id", "embedding", centroids)
    }),
    // SimHash near-dup pairs by hamming distance over the x04 signatures —
    // the banding-free exact form (at 100 TB, band the signature bytes first
    // and verify candidates, same shape as minhash LSH).
    "x15_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.nimble(s, dir, "documents"), "doc_id", "text", maxDist = 4)),
    // int8 embedding quantization (4x storage cut before ANN indexing);
    // checked via derived scalars (sum/min/max of the quantized vector) so
    // the oracle is array-layout-agnostic.
    "x17_embed_quantize" -> ((s, dir) => {
      val q = Similarity.quantizeInt8(Tables.nimble(s, dir, "embeddings"), "vec_id", "embedding")
      q.select(col("vec_id"), round(col("scale"), 6).as("scale_r"),
        aggregate(col("q"), lit(0L), (a, x) => a + x.cast("long")).as("qsum"),
        array_min(col("q")).as("qmin"), array_max(col("q")).as("qmax"))
    }),
    // Salted fact⋈dim join (hot-key mitigation for when AQE/broadcast can't
    // help): row-identical to the plain join, so the oracle is the plain SQL.
    "x16_salted_join" -> ((s, dir) => {
      val li = Tables.nimble(s, dir, "lineitem").withColumnRenamed("l_suppkey", "suppkey")
      val supp = Tables.nimble(s, dir, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      graft.ops.Skew.saltedJoin(li, supp, "suppkey", salt = 8)
        .groupBy(col("s_nationkey").as("nation"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("qty"))
    }),
    // benchmark decontamination: trigram overlap against a broadcast eval set
    "x18_decontaminate" -> ((s, dir) => {
      val docs = Tables.nimble(s, dir, "documents")
      Dedup.decontaminate(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 3)
    }),
    // connected-components dedup clustering: near-dup pairs (minhash-exact,
    // same params as x03) collapse into one canonical (min-id) doc per
    // cluster; singletons self-label — the canonicalization step a training
    // pipeline runs after pair generation
    "x21_dedup_clusters" -> ((s, dir) => {
      val docs = Tables.nimble(s, dir, "documents")
      Dedup.dedupClusters(docs, "doc_id",
        Dedup.minhashPairs(docs, "doc_id", "text",
          n = 3, numPerms = 32, bands = 32, threshold = 0.5))
    }),
    // end-to-end dedup: keep one canonical doc (cluster-min id) per
    // near-dup cluster, singletons survive — the materialization step a
    // training pipeline runs after clustering
    "x22_dedup_apply" -> ((s, dir) => {
      val docs = Tables.nimble(s, dir, "documents")
      Dedup.dedupApply(docs, "doc_id",
        Dedup.minhashPairs(docs, "doc_id", "text",
          n = 3, numPerms = 32, bands = 32, threshold = 0.5))
        .select("doc_id", "lang")
    }),
    // deterministic stratified sampling: hash-threshold per language stratum
    "x19_stratified_sample" -> ((s, dir) =>
      TextAnalysis.stratifiedSample(Tables.nimble(s, dir, "documents"),
        "doc_id", "lang", Map("en" -> 10), defaultRate = 50)
        .select(col("doc_id"), col("lang"))),
    // within-document repetition (boilerplate/spam signal)
    "x20_repetition" -> ((s, dir) =>
      TextAnalysis.repetition(Tables.nimble(s, dir, "documents"), "doc_id", "text")),
    // point-in-time attribution: each click joined to the user's most
    // recent prior purchase (union + one window per key — no join explosion)
    "x23_asof_join" -> ((s, dir) => {
      val ev = Tables.nimble(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts").as("click_ts"), col("user_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("purchase_ts"),
          col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      // click_ts stays out of the output: DuckDB truncates ns → µs through
      // TIMESTAMP, so raw ns values cannot round-trip the oracle compare
      AsOfJoin.asof(clicks, purchases, "click_ts", "purchase_ts", Seq("user_id"),
          rightTieBreak = Some("purchase_id"))
        .select("click_id", "user_id", "purchase_id", "purchase_value")
    }),
    // tf/df keyword extraction (log-free tf-idf ranking, bit-deterministic)
    "x24_tfidf_keywords" -> ((s, dir) =>
      TextAnalysis.tfidfKeywords(Tables.nimble(s, dir, "documents"), "doc_id", "text", 3)),
    // sliding context-window chunking (training-row shaping; zero shuffles)
    "x25_chunk_windows" -> ((s, dir) =>
      TextAnalysis.chunkWindows(Tables.nimble(s, dir, "documents"), "doc_id", "text", 64, 48)),
    // sequence packing: contiguous token bins via the two-level prefix sum
    // (global cumsum without a single-partition window)
    "x27_seq_pack" -> ((s, dir) => {
      val docs = Tables.nimble(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.wsTokens(col("text")).as("n_tokens"))
      TextAnalysis.packSequences(docs, "doc_id", "n_tokens",
        binTokens = 4096, bucketWidth = 64)
    }),
    // training-mixture rebalancing: integer-exact per-domain accept
    // thresholds hit the 50/30/20 target over three sources, binding
    // domain keeps everything; the accept set is bit-reproducible
    "x28_mixture_sample" -> ((s, dir) =>
      TextAnalysis.mixtureSample(Tables.nimble(s, dir, "documents"),
        "doc_id", "source",
        Map("src1" -> 500000L, "src2" -> 300000L, "src3" -> 200000L))
        .select(col("doc_id"), col("source"))),
    // Gopher-style composite quality gate: every violated rule lands in a
    // deterministic reasons string (empty = pass)
    "x29_quality_gate" -> ((s, dir) =>
      TextAnalysis.qualityGate(Tables.nimble(s, dir, "documents"),
        "doc_id", "text", minTokens = 20, maxTokens = 100000,
        maxRepetition = 0.6, minStopRatio = 0.04)),
    // Unicode NFC canonicalization ahead of fingerprint/dedup hashing
    // (identity on this ASCII corpus — the spec pins real Unicode forms;
    // the driver check proves the native expression runs the whole table)
    "x30_normalize" -> ((s, dir) =>
      TextAnalysis.normalize(Tables.nimble(s, dir, "documents"),
        "doc_id", "text")),
    // PII redaction: plant a deterministic email/IP per 10th doc, scrub,
    // and the placeholder tokens must land exactly where the plants were
    "x31_pii_scrub" -> ((s, dir) => {
      val planted = Tables.nimble(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" contact u"), col("doc_id").cast("string"),
            lit("@example.com or 10.0.0."), (col("doc_id") % 256).cast("string")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.scrubPii(planted, "doc_id", "text")
    }),
    // leakage-proof dataset split: ppm-exact md5 thresholds, engine-replayable
    "x32_dataset_split" -> ((s, dir) =>
      TextAnalysis.datasetSplit(Tables.nimble(s, dir, "documents"), "doc_id")
        .select(col("doc_id"), col("split"))),
    // IVF ANN search end-to-end: probe the 2 nearest cells per query, exact
    // re-rank inside them (corpus cell assignment is a zero-shuffle fold)
    "x26_ivf_topk" -> ((s, dir) => {
      val emb = Tables.nimble(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.ivfTopK(emb.filter(col("vec_id") % 97 === 0), emb,
        "vec_id", "embedding", centroids, k = 3, nprobe = 2)
    }),
    // distributed k-means codebook training (integer-exact: quantized
    // vectors, truncated-mean centroids — the full 2-iteration pipeline
    // replays value-for-value in the oracle)
    "x33_kmeans" -> ((s, dir) =>
      Similarity.kmeansInt8(Tables.nimble(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8, iters = 2,
        persist = false)), // consume-once: the harness must not leak a cache
    // semantic near-dup: kmeans clusters as the blocking key, exact cosine
    // within blocks (paraphrase-level dedup where shingle/LSH blocking
    // can't collide)
    "x34_semantic_neardup" -> ((s, dir) =>
      Similarity.semanticNearDupPairs(Tables.nimble(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.4, k = 8, iters = 2)),
    // exact substring-overlap profile (ExactSubstr family): per doc, how
    // many of its 8-token windows occur verbatim in other docs
    "x35_substring_overlap" -> ((s, dir) =>
      Dedup.substringOverlapProfile(Tables.nimble(s, dir, "documents"),
        "doc_id", "text", windowTokens = 8)),
    // corpus-trained unigram surprisal (CCNet-style LM quality signal,
    // integer-exact via binary digit counts — no floating log anywhere)
    "x36_surprisal" -> ((s, dir) =>
      TextAnalysis.unigramSurprisal(Tables.nimble(s, dir, "documents"),
        "doc_id", "text"))
  )

  // ---------------------------------------------------------------- oracle

  // shared k-means replay chain (x33/x34): quantize -> init -> iterate x2;
  // ends at CTE a2 = the final assignment (id, cid)
  private val kmeansCte =
    """WITH s AS (SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
           FROM embeddings),
         uq AS (SELECT vec_id AS id,
             list_transform(embedding, x -> CASE WHEN scale = 0 THEN CAST(127 AS BIGINT)
               ELSE CAST(round(CAST(x AS DOUBLE) / scale * 127) AS BIGINT) + 127 END) AS u
           FROM s),
         c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cid, u AS cvec
                FROM (SELECT id, u FROM uq ORDER BY id LIMIT 8)),
         d1 AS (SELECT uq.id, c.cid,
             list_sum(list_transform(range(1, 65), i -> (uq.u[i]-c.cvec[i])*(uq.u[i]-c.cvec[i]))) AS dist
           FROM uq CROSS JOIN c0 c),
         a1 AS (SELECT id, cid FROM (
             SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY dist ASC, cid ASC) AS rn
             FROM d1) WHERE rn = 1),
         s1 AS (SELECT a1.cid, dd.d, sum(uq.u[dd.d]) AS sm, count(*) AS n
           FROM a1 JOIN uq USING (id) CROSS JOIN (SELECT unnest(range(1, 65)) AS d) dd
           GROUP BY 1, 2),
         c1n AS (SELECT cid, list(sm // n ORDER BY d) AS cvec FROM s1 GROUP BY cid),
         c1 AS (SELECT c0.cid, coalesce(c1n.cvec, c0.cvec) AS cvec
                FROM c0 LEFT JOIN c1n USING (cid)),
         d2 AS (SELECT uq.id, c.cid,
             list_sum(list_transform(range(1, 65), i -> (uq.u[i]-c.cvec[i])*(uq.u[i]-c.cvec[i]))) AS dist
           FROM uq CROSS JOIN c1 c),
         a2 AS (SELECT id, cid FROM (
             SELECT id, cid, row_number() OVER (PARTITION BY id ORDER BY dist ASC, cid ASC) AS rn
             FROM d2) WHERE rn = 1)
         """

  private val shinglesCte =
    """WITH w AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
       sh AS (SELECT doc_id, list_distinct(list_transform(range(0, greatest(len(w)-3,0)+1),
              i -> array_to_string(w[i+1:i+3], ' '))) AS s FROM w)"""

  def oracleSql: Map[String, String] = Map(
    "q01_scan_full" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         epoch_ms(l_shipdate) AS l_shipdate_ms FROM lineitem""",
    "q02_projection" -> "SELECT l_orderkey, l_quantity FROM lineitem",
    "q03_filter_num" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45",
    "q04_filter_str_in" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus FROM lineitem
         WHERE l_returnflag IN ('A','N') AND l_linestatus = 'F'""",
    "q05_filter_null" ->
      """SELECT l_returnflag, count(1) AS cnt FROM lineitem
         WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
         GROUP BY l_returnflag""",
    "q06_filter_range" ->
      """SELECT l_orderkey, l_linenumber, epoch_ms(l_shipdate) AS sd_ms FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'""",
    "q07_topk" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         ORDER BY l_orderkey, l_linenumber LIMIT 100""",
    "q08_stats_agg" ->
      """SELECT count(1) AS cnt, count(l_quantity) AS cnt_q,
         min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
         min(l_quantity) AS min_q, max(l_quantity) AS max_q,
         min(l_returnflag) AS min_rf, max(l_returnflag) AS max_rf,
         min(epoch_ms(l_shipdate)) AS min_sd, max(epoch_ms(l_shipdate)) AS max_sd
         FROM lineitem""",
    "q09_index_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         epoch_ms(o_orderdate) AS o_orderdate_ms, o_orderpriority
         FROM orders WHERE o_custkey = 371""",
    "q10_nested" ->
      """SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS total,
         unnest([o_totalprice, o_totalprice * 2.0]) AS v, o_orderstatus AS ms
         FROM orders""",
    "q11_flatmap_proj" ->
      """SELECT doc_id,
         CASE WHEN source = 'src3' THEN n_chars END AS v_src3,
         CASE WHEN source = 'src7' THEN n_chars END AS v_src7
         FROM documents""",
    "q12_encoding_grid" ->
      """SELECT count(1) AS cnt, min(event_id) AS min_id, max(event_id) AS max_id,
         min(user_id) AS min_u, max(user_id) AS max_u,
         min(event_type) AS min_et, max(event_type) AS max_et,
         count(DISTINCT event_type) AS ndv_et,
         min(value) AS min_v, max(value) AS max_v,
         min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us
         FROM events""",
    "q13_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(1) AS avg_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(1) AS avg_price,
         CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(1) AS avg_disc,
         count(1) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "q14_tpch_q6" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""",
    "q15_join_agg" ->
      """SELECT c_mktsegment, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
         count(1) AS n
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q16_window" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey,
                  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t
         WHERE rn <= 3""",
    "q17_setops" ->
      """SELECT c_custkey AS k FROM customer
         EXCEPT
         SELECT o_custkey AS k FROM orders""",
    "q18_rollup" ->
      """SELECT coalesce(r_name, '__ALL__') AS region, coalesce(n_name, '__ALL__') AS nation,
         count(1) AS cnt
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)""",
    "q19_semijoin" ->
      """SELECT count(1) AS n FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q20_events_window" ->
      """SELECT event_type, epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS hour_ns,
         count(1) AS cnt, min(value) AS min_v, max(value) AS max_v
         FROM events GROUP BY 1, 2""",
    "x01_dedup_fingerprint" ->
      """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
         count(1) AS cnt, min(doc_id) AS keeper
         FROM documents GROUP BY 1""",
    "x02_neardup_jaccard" -> (shinglesCte +
      """, inv AS (SELECT doc_id, len(s) AS sz, unnest(s) AS sg FROM sh),
         p AS (SELECT a.doc_id AS a, b.doc_id AS b, a.sz AS sza, b.sz AS szb, count(1) AS inter
               FROM inv a JOIN inv b ON a.sg = b.sg AND a.doc_id < b.doc_id
               GROUP BY 1, 2, 3, 4)
         SELECT a, b, inter, CAST(inter AS DOUBLE) / (sza + szb - inter) AS jaccard
         FROM p WHERE CAST(inter AS DOUBLE) / (sza + szb - inter) >= 0.8"""),
    "x03_neardup_minhash" -> (shinglesCte +
      """, inv AS (SELECT doc_id, len(s) AS sz, unnest(s) AS sg FROM sh),
         p AS (SELECT a.doc_id AS a, b.doc_id AS b, a.sz AS sza, b.sz AS szb, count(1) AS inter
               FROM inv a JOIN inv b ON a.sg = b.sg AND a.doc_id < b.doc_id
               GROUP BY 1, 2, 3, 4)
         SELECT a, b, CAST(inter AS DOUBLE) / (sza + szb - inter) AS jaccard
         FROM p WHERE CAST(inter AS DOUBLE) / (sza + szb - inter) >= 0.5"""),
    // reachability closure over the symmetric >= 0.5 pair graph, then the
    // minimum reachable id labels the cluster (recursive CTE; the pair CTE
    // is the x03 oracle verbatim)
    "x21_dedup_clusters" -> (shinglesCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, inv AS (SELECT doc_id, len(s) AS sz, unnest(s) AS sg FROM sh),
         p AS (SELECT a.doc_id AS a, b.doc_id AS b, a.sz AS sza, b.sz AS szb, count(1) AS inter
               FROM inv a JOIN inv b ON a.sg = b.sg AND a.doc_id < b.doc_id
               GROUP BY 1, 2, 3, 4),
         pairs AS (SELECT a, b FROM p WHERE CAST(inter AS DOUBLE) / (sza + szb - inter) >= 0.5),
         edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b AS u, a AS v FROM pairs),
         reach AS (SELECT doc_id AS u, doc_id AS v FROM documents
                   UNION
                   SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
         SELECT u AS doc_id, min(v) AS cluster FROM reach GROUP BY u"""),
    "x22_dedup_apply" -> (shinglesCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """, inv AS (SELECT doc_id, len(s) AS sz, unnest(s) AS sg FROM sh),
         p AS (SELECT a.doc_id AS a, b.doc_id AS b, a.sz AS sza, b.sz AS szb, count(1) AS inter
               FROM inv a JOIN inv b ON a.sg = b.sg AND a.doc_id < b.doc_id
               GROUP BY 1, 2, 3, 4),
         pairs AS (SELECT a, b FROM p WHERE CAST(inter AS DOUBLE) / (sza + szb - inter) >= 0.5),
         edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b AS u, a AS v FROM pairs),
         reach AS (SELECT doc_id AS u, doc_id AS v FROM documents
                   UNION
                   SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         labels AS (SELECT u AS doc_id, min(v) AS cluster FROM reach GROUP BY u)
         SELECT d.doc_id, d.lang FROM documents d
         JOIN labels l USING (doc_id) WHERE l.doc_id = l.cluster"""),
    "x04_simhash" ->
      """WITH toks AS (SELECT doc_id AS doc, unnest(string_split_regex(lower(text), '\s+')) AS t
                       FROM documents),
         h AS (SELECT doc, ('0x' || substr(md5(t), 25, 8))::BIGINT AS h FROM toks),
         bits AS (SELECT doc, b.bit, sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
                  FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) b
                  GROUP BY doc, b.bit)
         SELECT doc, CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
         FROM bits GROUP BY doc""",
    "x05_embed_topk" ->
      """WITH q AS (SELECT vec_id AS q, embedding AS qv FROM embeddings WHERE vec_id < 20),
         scored AS (
           SELECT q.q, c.vec_id AS neighbor,
             list_sum(list_transform(range(1, 65),
               i -> CAST(q.qv[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))) *
              sqrt(list_sum(list_transform(range(1, 65), i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))) AS sim
           FROM q CROSS JOIN embeddings c WHERE q.q <> c.vec_id),
         ranked AS (SELECT q, neighbor,
             row_number() OVER (PARTITION BY q ORDER BY round(sim, 6) DESC, neighbor ASC) AS rank
           FROM scored)
         SELECT q, neighbor, rank FROM ranked WHERE rank <= 3""",
    // Full oracle: the hyperplane weights are a pure arithmetic formula
    // (pmod-hash of (plane, dim)), so DuckDB replays the exact bucketing,
    // the multi-probe flip order (raw |margin| ascending, plane index
    // tiebreak — every replay folds dimensions in ascending order, so the
    // margin doubles are bit-identical and need no rounding) and the exact
    // re-rank — the oracle verifies the whole multi-probe LSH pipeline, not
    // just row counts.
    "x06_embed_lsh_ann" ->
      """WITH planes AS (SELECT unnest(range(0, 6)) AS p),
         m AS (SELECT vec_id, p, list_sum(list_transform(range(0, 64),
                 d -> CAST(embedding[d+1] AS DOUBLE) * (((d*2654435761 + p*40503 + 7) % 1000003) / 500001.5 - 1.0))) AS acc
             FROM embeddings CROSS JOIN planes),
         b AS (SELECT vec_id, sum(CASE WHEN acc >= 0
               THEN CAST(1 AS BIGINT) << p ELSE CAST(0 AS BIGINT) END) AS bucket
             FROM m GROUP BY vec_id),
         flips AS (SELECT vec_id, p,
               row_number() OVER (PARTITION BY vec_id ORDER BY abs(acc), p) AS rn
             FROM m WHERE vec_id < 20),
         qprobes AS (
           SELECT vec_id, bucket AS probe FROM b WHERE vec_id < 20
           UNION ALL
           SELECT f.vec_id, xor(b.bucket, CAST(1 AS BIGINT) << f.p) AS probe
           FROM flips f JOIN b ON b.vec_id = f.vec_id WHERE f.rn <= 2),
         e AS (SELECT vec_id, embedding FROM embeddings),
         scored AS (
           SELECT qp.vec_id AS q, cb.vec_id AS neighbor,
             list_sum(list_transform(range(1, 65), i -> CAST(qe.embedding[i] AS DOUBLE) * CAST(ce.embedding[i] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qe.embedding[i] AS DOUBLE) * CAST(qe.embedding[i] AS DOUBLE)))) *
              sqrt(list_sum(list_transform(range(1, 65), i -> CAST(ce.embedding[i] AS DOUBLE) * CAST(ce.embedding[i] AS DOUBLE))))) AS sim
           FROM qprobes qp JOIN b cb ON cb.bucket = qp.probe AND qp.vec_id <> cb.vec_id
           JOIN e qe ON qe.vec_id = qp.vec_id JOIN e ce ON ce.vec_id = cb.vec_id),
         ranked AS (SELECT q, neighbor, row_number() OVER (PARTITION BY q ORDER BY round(sim, 6) DESC, neighbor ASC) AS rank FROM scored)
         SELECT q, neighbor, rank FROM ranked WHERE rank <= 3""",
    "x07_text_quality" ->
      """SELECT doc_id, length(text) AS n_chars_m,
         len(regexp_extract_all(text, '\S+')) AS n_tokens,
         len(list_distinct(string_split_regex(lower(text), '\s+'))) AS n_uniq_tokens,
         len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
         len(regexp_extract_all(text, '\b(the|a|of|and|in|to|is)\b')) AS n_stopwords,
         CAST(len(list_distinct(string_split_regex(lower(text), '\s+'))) AS DOUBLE) /
           CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS uniq_ratio
         FROM documents""",
    "x08_token_count" ->
      """SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS ws_tokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
         FROM documents""",
    "x09_langid" ->
      """SELECT doc_id,
         CASE
           WHEN len(regexp_extract_all(lower(text), '[一-鿿]')) > len(regexp_extract_all(lower(text), '\b(the|and|of|is|was|a)\b'))
            AND len(regexp_extract_all(lower(text), '[一-鿿]')) > len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b'))
            AND len(regexp_extract_all(lower(text), '[一-鿿]')) > len(regexp_extract_all(lower(text), '\b(le|la|les|et|est)\b'))
            AND len(regexp_extract_all(lower(text), '[一-鿿]')) > len(regexp_extract_all(lower(text), '\b(el|los|las|es|y)\b')) THEN 'zh'
           WHEN len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b')) > len(regexp_extract_all(lower(text), '\b(the|and|of|is|was|a)\b'))
            AND len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b')) > len(regexp_extract_all(lower(text), '\b(le|la|les|et|est)\b'))
            AND len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b')) > len(regexp_extract_all(lower(text), '\b(el|los|las|es|y)\b')) THEN 'de'
           WHEN len(regexp_extract_all(lower(text), '\b(le|la|les|et|est)\b')) > len(regexp_extract_all(lower(text), '\b(the|and|of|is|was|a)\b'))
            AND len(regexp_extract_all(lower(text), '\b(le|la|les|et|est)\b')) > len(regexp_extract_all(lower(text), '\b(el|los|las|es|y)\b')) THEN 'fr'
           WHEN len(regexp_extract_all(lower(text), '\b(el|los|las|es|y)\b')) > len(regexp_extract_all(lower(text), '\b(the|and|of|is|was|a)\b')) THEN 'es'
           ELSE 'en'
         END AS pred_lang
         FROM documents""",
    "x10_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS md5_fp,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split_regex(regexp_replace(lower(text), '\s+', ' ', 'g'), ' '),
             t -> CAST(length(t) AS BIGINT))),
           (acc, x) -> (acc * 31 + x) % 1000000007) AS poly_fp
         FROM documents""",
    "x11_multimodal" ->
      """SELECT doc_id, octet_length(encode(text)) AS media_size,
         sha256(text) AS media_sha,
         ('0x' || substr(hex(encode(text)), 1, 4))::BIGINT % 1920 AS w,
         ('0x' || substr(hex(encode(text)), 5, 4))::BIGINT % 1080 AS h,
         CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) AS n_frames
         FROM documents""",
    "x12_frame_sample" ->
      """SELECT doc_id, f.frame_idx,
         least(64, octet_length(encode(text)) - f.frame_idx * 64) AS frame_size
         FROM documents, LATERAL (
           SELECT unnest(range(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT), 2)) AS frame_idx) f""",
    "x13_embed_neardup" ->
      """WITH sims AS (
           SELECT a.vec_id AS a, b.vec_id AS b,
             round(
               list_sum(list_transform(range(1, 65),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
               (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
                sqrt(list_sum(list_transform(range(1, 65), i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))), 6) AS sim
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
         SELECT a, b, sim FROM sims WHERE sim >= 0.4""",
    "x14_ivf_assign" ->
      """WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 50 = 0),
         scored AS (
           SELECT e.vec_id, c.cid,
             round(
               list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE))) /
               (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) *
                sqrt(list_sum(list_transform(range(1, 65), i -> CAST(c.cvec[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE))))), 6) AS sim
           FROM embeddings e CROSS JOIN c),
         ranked AS (SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
           FROM scored)
         SELECT vec_id, cid FROM ranked WHERE rn = 1""",
    "x15_simhash_pairs" ->
      """WITH toks AS (SELECT doc_id AS doc, unnest(string_split_regex(lower(text), '\s+')) AS t
                       FROM documents),
         h AS (SELECT doc, ('0x' || substr(md5(t), 25, 8))::BIGINT AS h FROM toks),
         bits AS (SELECT doc, b.bit, sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
                  FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) b
                  GROUP BY doc, b.bit),
         sig AS (SELECT doc, CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
                 FROM bits GROUP BY doc)
         SELECT a.doc AS a, b.doc AS b, bit_count(xor(a.simhash, b.simhash)) AS dist
         FROM sig a JOIN sig b ON a.doc < b.doc
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 4""",
    "x17_embed_quantize" ->
      """WITH s AS (SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
           FROM embeddings),
         q AS (SELECT vec_id, scale,
             list_transform(embedding, x -> CASE WHEN scale = 0 THEN 0
               ELSE CAST(round(CAST(x AS DOUBLE) / scale * 127) AS INT) END) AS qv
           FROM s)
         SELECT vec_id, round(scale, 6) AS scale_r,
           CAST(list_sum(qv) AS BIGINT) AS qsum,
           list_min(qv) AS qmin, list_max(qv) AS qmax
         FROM q""",
    "x16_salted_join" ->
      """SELECT s_nationkey AS nation, count(1) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_nationkey""",
    "q21_sessionize" ->
      """SELECT user_id, count(1) AS n_sessions, max(session_len) AS max_len FROM (
           SELECT user_id, session_id, count(1) AS session_len FROM (
             SELECT user_id, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
             FROM (
               SELECT user_id, ts, event_id,
                 CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        > 1800000000000 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
               FROM events) t1) t2
           GROUP BY user_id, session_id) t3
         GROUP BY user_id""",
    "q22_json_extract" ->
      """SELECT json_extract_string(props, '$.k') AS k, count(1) AS cnt
         FROM events GROUP BY json_extract_string(props, '$.k')""",
    "q23_filtered_agg" ->
      """SELECT count(1) AS cnt, min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
         min(l_quantity) AS min_q, max(l_quantity) AS max_q
         FROM lineitem WHERE l_orderkey >= 0""",
    "q24_range_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
         FROM orders WHERE o_orderkey BETWEEN 1000 AND 1500""",
    "q25_composite_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
         FROM orders WHERE o_orderstatus = 'O' AND o_custkey BETWEEN 100 AND 140""",
    "q26_midscan_agg" ->
      """SELECT count(1) AS cnt, count(l_returnflag) AS cnt_rf,
         min(l_orderkey) AS min_ok, max(l_extendedprice) AS max_price,
         min(l_returnflag) AS min_rf, max(l_returnflag) AS max_rf
         FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05""",
    "q27_unsigned_widen" ->
      """SELECT o_orderkey,
         CAST(CASE WHEN (o_custkey % 256) - 128 < 0 THEN (o_custkey % 256) - 128 + 256
              ELSE (o_custkey % 256) - 128 END AS SMALLINT) AS u8,
         CAST(CASE WHEN (o_custkey % 65536) - 32768 < 0 THEN (o_custkey % 65536) - 32768 + 65536
              ELSE (o_custkey % 65536) - 32768 END AS INTEGER) AS u16,
         CAST(CASE WHEN o_custkey - 2000 < 0 THEN o_custkey - 2000 + 4294967296
              ELSE o_custkey - 2000 END AS BIGINT) AS u32,
         CAST(CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_orderkey AS HUGEINT)
              ELSE 18446744073709551616::HUGEINT - o_orderkey END AS VARCHAR) AS u64
         FROM orders""",
    "q28_agg_sum" ->
      """SELECT count(1) AS cnt, CAST(sum(l_suppkey) AS BIGINT) AS sum_sk,
         sum(l_quantity) AS sum_qty, avg(l_quantity) AS avg_qty, max(l_quantity) AS max_q
         FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-06-01'""",
    "q29_group_agg" ->
      """SELECT l_returnflag, l_linestatus, count(1) AS cnt, sum(l_quantity) AS sum_qty,
         avg(l_quantity) AS avg_qty, CAST(sum(l_suppkey) AS BIGINT) AS sum_sk,
         max(l_extendedprice) AS max_price
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q30_topn_pushdown" ->
      "SELECT l_orderkey FROM lineitem ORDER BY l_orderkey DESC LIMIT 500",
    "q31_spj_join" ->
      """SELECT l.l_orderkey AS okey, count(1) AS cnt,
         max(l.l_extendedprice) AS max_price, max(o.o_totalprice) AS max_total
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY l.l_orderkey""",
    "q32_compact_scan" ->
      """SELECT o_orderstatus, count(1) AS cnt,
         min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders GROUP BY o_orderstatus""",
    "q33_delete" ->
      """SELECT o_orderstatus, count(1) AS cnt,
         min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders
         WHERE NOT (o_orderkey > 30000)
           AND NOT (o_orderkey >= 100 AND o_orderkey <= 500)
         GROUP BY o_orderstatus""",
    "q34_update" ->
      """SELECT o_orderstatus, count(1) AS cnt,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM (SELECT CASE WHEN o_orderkey <= 5000 AND o_orderstatus = 'F'
                           THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
                      o_totalprice FROM orders) t
         GROUP BY o_orderstatus""",
    "q35_merge" ->
      """WITH merged AS (
           SELECT o_orderstatus, o_orderkey, o_totalprice FROM orders
             WHERE o_orderkey % 100 <> 0
           UNION ALL SELECT 'U', o_orderkey, o_totalprice FROM orders
             WHERE o_orderkey % 100 = 0
           UNION ALL SELECT 'N', o_orderkey + 10000000, o_totalprice FROM orders
             WHERE o_orderkey % 100 = 50)
         SELECT o_orderstatus, count(1) AS cnt, max(o_orderkey) AS max_ok,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM merged GROUP BY o_orderstatus""",
    "q36_sql_rowlevel" ->
      """SELECT o_orderstatus, count(1) AS cnt,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM (SELECT CASE WHEN o_orderkey <= 1000 AND o_orderstatus = 'O'
                           THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
                      o_totalprice FROM orders) t
         WHERE NOT (o_totalprice > 250000.0)
         GROUP BY o_orderstatus""",
    "q38_compact_small" ->
      """WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
           WHERE o_orderkey % 97 = 0)
         SELECT o_orderstatus, count(1) AS cnt,
           min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM t GROUP BY o_orderstatus""",
    "q39_call_optimize" ->
      """SELECT count(1) AS cnt, min(l_partkey) AS min_pk,
           max(l_suppkey) AS max_sk,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem WHERE l_partkey <= 150 OR l_suppkey <= 8""",
    "q37_zorder" ->
      """SELECT CAST(l_suppkey % 7 AS INT) AS sgrp, count(1) AS cnt,
           min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem WHERE l_partkey <= 200 OR l_suppkey <= 10
         GROUP BY 1""",
    "q40_nested_prune" ->
      """SELECT l_orderkey, l_linenumber, epoch_ms(l_shipdate) AS d_ms,
           l_quantity AS qty
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00'
           AND l_shipdate < TIMESTAMP '2001-09-01 00:00:00'""",
    "q41_nested_agg" ->
      """SELECT CAST(count(l_quantity) AS BIGINT) AS cnt,
           min(l_quantity) AS min_q, max(l_quantity) AS max_q,
           min(l_extendedprice) AS min_px, max(l_extendedprice) AS max_px,
           epoch_ms(min(l_shipdate)) AS min_d_ms
         FROM lineitem""",
    "q42_multipath" ->
      """SELECT o_orderstatus, count(1) AS cnt,
           min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders WHERE o_totalprice > 50000.0
         GROUP BY o_orderstatus""",
    "q43_lookup_tvf" ->
      """SELECT s.lookup_seq, o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice
         FROM (VALUES (0, 7), (1, 1211), (2, 42), (3, 1211), (4, 998))
           AS s(lookup_seq, k)
         JOIN orders o ON o.o_orderkey = s.k""",
    "q44_lookup_range" ->
      """SELECT s.lookup_seq, o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice
         FROM (VALUES (0, 100, 140), (1, 4000, 4005), (2, 7, 7))
           AS s(lookup_seq, lo, hi)
         JOIN orders o ON o.o_orderkey BETWEEN s.lo AND s.hi""",
    "q45_lookup_composite_batch" ->
      """SELECT s.lookup_seq, o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice
         FROM (VALUES (0, 'O', 400, 400), (1, 'F', 10, 15), (2, 'P', 77, 77),
                      (3, 'O', 400, 400))
           AS s(lookup_seq, st, lo, hi)
         JOIN orders o ON o.o_orderstatus = s.st AND o.o_custkey BETWEEN s.lo AND s.hi""",
    "x18_decontaminate" -> (shinglesCte +
      """, bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 50 = 0),
         corpus AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 50 <> 0)
         SELECT c.doc_id, count(DISTINCT c.g) AS hits
         FROM corpus c JOIN bench b USING (g)
         GROUP BY c.doc_id"""),
    "x19_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 8))::BIGINT % 100 <
           (CASE WHEN lang = 'en' THEN 10 ELSE 50 END)""",
    "x20_repetition" ->
      """SELECT doc_id,
         len(string_split_regex(lower(text), '\s+')) AS n_words,
         len(list_distinct(string_split_regex(lower(text), '\s+'))) AS n_uniq,
         1.0 - CAST(len(list_distinct(string_split_regex(lower(text), '\s+'))) AS DOUBLE) /
           CAST(len(string_split_regex(lower(text), '\s+')) AS DOUBLE) AS repetition
         FROM documents""",
    "x23_asof_join" ->
      """SELECT l.event_id AS click_id, l.user_id AS user_id,
           r.event_id AS purchase_id, r.value AS purchase_value
         FROM events l LEFT JOIN events r
           ON l.user_id = r.user_id AND r.event_type = 'purchase' AND r.ts <= l.ts
         WHERE l.event_type = 'click'
         QUALIFY row_number() OVER (PARTITION BY l.event_id
           ORDER BY r.ts DESC NULLS LAST, r.event_id DESC NULLS LAST) = 1""",
    "x24_tfidf_keywords" ->
      """WITH w AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS word
                    FROM documents),
         tf AS (SELECT doc_id, word, count(1) AS tf FROM w GROUP BY 1, 2),
         dfq AS (SELECT word, count(1) AS df FROM tf GROUP BY 1),
         s AS (SELECT tf.doc_id, tf.word, tf.tf, dfq.df,
                 CAST(tf.tf AS DOUBLE) / dfq.df AS score,
                 row_number() OVER (PARTITION BY tf.doc_id
                   ORDER BY CAST(tf.tf AS DOUBLE) / dfq.df DESC, tf.word) AS rnk
               FROM tf JOIN dfq USING (word))
         SELECT doc_id, rnk, word, tf, df, score FROM s WHERE rnk <= 3""",
    "x25_chunk_windows" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents),
         c AS (SELECT doc_id, w, CASE WHEN len(w) <= 64 THEN 1
                 ELSE CAST(ceil(CAST(len(w) - 64 AS DOUBLE) / 48) AS INT) + 1 END AS nc FROM w),
         e AS (SELECT doc_id, w, unnest(range(nc)) AS i FROM c)
         SELECT doc_id, i AS chunk_idx,
           len(w[i*48+1 : i*48+64]) AS n_tokens,
           array_to_string(w[i*48+1 : i*48+64], ' ') AS chunk_text
         FROM e""",
    // global-cumsum replay: the engine's two-level prefix sum must equal the
    // straightforward single-window running sum bin for bin
    "x27_seq_pack" ->
      """WITH t AS (SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens FROM documents),
         c AS (SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t)
         SELECT doc_id, n_tokens,
           CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 4096) AS BIGINT) AS bin
         FROM c""",
    // mixture replay: same integer-exact threshold derivation
    // (T = min(n*1e6 DIV ppm); thr = T*ppm DIV n; md5-hash32 accept)
    "x28_mixture_sample" ->
      """WITH p AS (SELECT doc_id, source,
             CASE source WHEN 'src1' THEN 500000 WHEN 'src2' THEN 300000
                         WHEN 'src3' THEN 200000 END AS ppm
           FROM documents WHERE source IN ('src1','src2','src3')),
         c AS (SELECT source, ppm, count(*) AS n FROM p GROUP BY source, ppm),
         t AS (SELECT min(n * 1000000 // ppm) AS tt FROM c),
         thr AS (SELECT source, (tt * ppm) // n AS thr FROM c, t)
         SELECT doc_id, p.source AS source FROM p JOIN thr ON p.source = thr.source
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 8))::BIGINT % 1000000 < thr""",
    "x29_quality_gate" ->
      """WITH m AS (SELECT doc_id,
             len(regexp_extract_all(text, '\S+')) AS ntok,
             1.0 - CAST(len(list_distinct(string_split_regex(lower(text), '\s+'))) AS DOUBLE)
               / len(regexp_extract_all(text, '\S+')) AS rep,
             CAST(len(regexp_extract_all(text, '\b(the|a|of|and|in|to|is)\b')) AS DOUBLE)
               / len(regexp_extract_all(text, '\S+')) AS stopr
           FROM documents)
         SELECT doc_id,
           concat_ws(',',
             CASE WHEN ntok < 20 THEN 'too_short' END,
             CASE WHEN ntok > 100000 THEN 'too_long' END,
             CASE WHEN rep > 0.6 THEN 'repetitive' END,
             CASE WHEN stopr < 0.04 THEN 'low_stopword' END) AS reasons,
           len(concat_ws(',',
             CASE WHEN ntok < 20 THEN 'too_short' END,
             CASE WHEN ntok > 100000 THEN 'too_long' END,
             CASE WHEN rep > 0.6 THEN 'repetitive' END,
             CASE WHEN stopr < 0.04 THEN 'low_stopword' END)) = 0 AS pass
         FROM m""",
    "x30_normalize" ->
      "SELECT doc_id, nfc_normalize(text) AS norm_text FROM documents",
    "x31_pii_scrub" ->
      """WITH planted AS (SELECT doc_id,
           CASE WHEN doc_id % 10 = 0
                THEN text || ' contact u' || CAST(doc_id AS VARCHAR) ||
                     '@example.com or 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
                ELSE text END AS text
           FROM documents)
         SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
             '\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}', '<PHONE>', 'g')
           AS scrubbed
         FROM planted""",
    "x32_dataset_split" ->
      """SELECT doc_id,
           CASE WHEN h < 980000 THEN 'train'
                WHEN h < 990000 THEN 'val' ELSE 'test' END AS split
         FROM (SELECT doc_id,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 8))::BIGINT % 1000000 AS h
               FROM documents) t""",
    // full IVF pipeline replay: query-cell probing (nprobe=2), corpus cell
    // assignment (argmax with min-cid tie-break), exact re-rank — same
    // rounded-cosine determinism contract as x05/x06/x14
    "x26_ivf_topk" ->
      """WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 50 = 0),
         q AS (SELECT vec_id AS q, embedding AS qv FROM embeddings WHERE vec_id % 97 = 0),
         qc AS (SELECT q.q, q.qv, c.cid,
             round(
               list_sum(list_transform(range(1, 65), i -> CAST(q.qv[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE))) /
               (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))) *
                sqrt(list_sum(list_transform(range(1, 65), i -> CAST(c.cvec[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE))))), 6) AS csim
           FROM q CROSS JOIN c),
         probes AS (SELECT q, qv, cid FROM (
             SELECT q, qv, cid, row_number() OVER (PARTITION BY q ORDER BY csim DESC, cid ASC) AS rn
             FROM qc) WHERE rn <= 2),
         ec AS (SELECT e.vec_id AS neighbor, e.embedding AS cv, c.cid,
             round(
               list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE))) /
               (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) *
                sqrt(list_sum(list_transform(range(1, 65), i -> CAST(c.cvec[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE))))), 6) AS csim
           FROM embeddings e CROSS JOIN c),
         cells AS (SELECT neighbor, cv, cid FROM (
             SELECT neighbor, cv, cid, row_number() OVER (PARTITION BY neighbor ORDER BY csim DESC, cid ASC) AS rn
             FROM ec) WHERE rn = 1),
         s AS (SELECT p.q, cel.neighbor,
             list_sum(list_transform(range(1, 65), i -> CAST(p.qv[i] AS DOUBLE) * CAST(cel.cv[i] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(p.qv[i] AS DOUBLE) * CAST(p.qv[i] AS DOUBLE)))) *
              sqrt(list_sum(list_transform(range(1, 65), i -> CAST(cel.cv[i] AS DOUBLE) * CAST(cel.cv[i] AS DOUBLE))))) AS sim
           FROM probes p JOIN cells cel USING (cid) WHERE p.q <> cel.neighbor),
         r AS (SELECT q, neighbor,
             row_number() OVER (PARTITION BY q ORDER BY round(sim, 6) DESC, neighbor ASC) AS rank
           FROM s)
         SELECT q, neighbor, rank FROM r WHERE rank <= 3""",
    // full k-means replay, both iterations: int8 quantize (x17 derivation,
    // shifted to [0,254]), k-smallest-id init, argmin L2 with min-cid
    // tie-break, truncated-mean centroid update (// == Spark's long
    // division on the non-negative sums), empty clusters keep centroids
    "x33_kmeans" -> (kmeansCte +
      "SELECT id AS vec_id, cid AS cluster FROM a2"),
    // kmeans blocking replay + exact within-cluster cosine (x05 formula)
    "x34_semantic_neardup" -> (kmeansCte +
      """, p AS (SELECT x.id AS a, y.id AS b
           FROM a2 x JOIN a2 y ON x.cid = y.cid AND x.id < y.id),
         sc AS (SELECT p.a, p.b,
             round(
               list_sum(list_transform(range(1, 65), i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))) /
               (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(ea.embedding[i] AS DOUBLE)))) *
                sqrt(list_sum(list_transform(range(1, 65), i -> CAST(eb.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))))), 6) AS sim
           FROM p JOIN embeddings ea ON ea.vec_id = p.a
                  JOIN embeddings eb ON eb.vec_id = p.b)
         SELECT a, b, sim FROM sc WHERE sim >= 0.4"""),
    // window text itself is the key (no hash): shared = in 2+ distinct docs
    "x35_substring_overlap" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
                    FROM documents WHERE text IS NOT NULL),
         b AS (SELECT doc_id, w, greatest(len(w) - 8 + 1, 0) AS nw FROM w),
         wins AS (SELECT doc_id,
             unnest(list_transform(range(0, nw), i -> array_to_string(w[i+1:i+8], ' '))) AS win
           FROM b WHERE nw > 0),
         dh AS (SELECT win, doc_id, count(1) AS cnt FROM wins GROUP BY 1, 2),
         hs AS (SELECT win, count(1) AS ndocs FROM dh GROUP BY 1),
         dup AS (SELECT dh.doc_id, CAST(sum(dh.cnt) AS BIGINT) AS dup
                 FROM dh JOIN hs ON dh.win = hs.win AND hs.ndocs >= 2
                 GROUP BY 1)
         SELECT b.doc_id, nw AS total_windows,
           coalesce(dup.dup, 0) AS dup_windows
         FROM b LEFT JOIN dup ON b.doc_id = dup.doc_id""",
    // binary digit counts, never log(): length(bin(n)) == floor(log2 n)+1
    "x36_surprisal" ->
      """WITH toks AS (SELECT doc_id AS doc,
             unnest(string_split_regex(lower(text), '\s+')) AS w
           FROM documents WHERE text IS NOT NULL),
         counts AS (SELECT w, count(1) AS c FROM toks GROUP BY 1),
         total AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM counts),
         bits AS (SELECT toks.doc,
             CAST(length(bin(total.t)) AS BIGINT) - CAST(length(bin(counts.c)) AS BIGINT) AS b
           FROM toks JOIN counts USING (w) CROSS JOIN total)
         SELECT doc AS doc_id, count(1) AS n_tokens,
           CAST(sum(b) AS BIGINT) AS sum_bits,
           CAST(sum(b) AS DOUBLE) / count(1) AS avg_bits
         FROM bits GROUP BY doc"""
  )
}
