package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.format.Tablet
import graft.spark.NimbleSource

/** MERGE / upsert over tablet directories — the delta-application step of a
  * training-data pipeline (corrections, re-crawls, label fixes) completed
  * file-granularly, like [[Delete]]: only files that can contain a source
  * key are rewritten.
  *
  * Affected-file discovery is metadata-only: every file's footer carries
  * min/max for the merge key, so a tiny (file, lo, hi) bounds frame
  * broadcast-joins against the source keys and the distinct hit list comes
  * back — on a key-sorted table a narrow delta touches only the boundary
  * files; an unsorted table degrades to rewriting everything, honestly.
  * The pruning is also what makes insert detection SOUND without a second
  * pass: a file whose bounds exclude every source key provably holds no
  * match, so a source key unmatched within the affected set is unmatched in
  * the whole table.
  *
  * Upsert semantics (SQL MERGE with WHEN MATCHED UPDATE SET * / WHEN NOT
  * MATCHED INSERT *): matched target rows take the source row's non-key
  * columns; unmatched source rows insert. The SQL-MERGE cardinality rule is
  * enforced — a source with duplicate keys fails rather than
  * nondeterministically picking a row. Null source keys are rejected (a
  * null never equals anything; silently inserting it would hide bugs).
  */
object Merge {

  final case class Report(
      filesRewritten: Int, filesUntouched: Int,
      rowsMatched: Long, rowsInserted: Long)

  /** Deltas at or under this many distinct keys AND this many cached bytes
    * take the broadcast (shuffle-free) rewrite plan; larger deltas take the
    * shuffled full_outer. The count is exact (the cardinality check already
    * ran) and the byte bound comes from the persisted delta's own cache
    * stats — full-width rows broadcast, so a row-count bound alone would
    * let a 2M-row × multi-KB-row delta blow the executor broadcast budget
    * where the shuffled plan works fine. */
  private final val BroadcastMaxSourceKeys = 2000000L
  private final val BroadcastMaxSourceBytes = 256L << 20

  def upsert(spark: SparkSession, dir: String, source: DataFrame,
      keyCols: Seq[String],
      readOptions: Map[String, String] = Map.empty): Report = {
    require(keyCols.nonEmpty, "nimble: merge: keyCols required")
    val files = NimbleSource.listFiles(dir)
    require(files.nonEmpty, s"nimble: merge: no tablet files under $dir")
    val schema = DataType.fromJson(NimbleSource.footerOf(files.head).schemaJson)
      .asInstanceOf[StructType]
    require(keyCols.forall(schema.fieldNames.contains),
      s"nimble: merge: key columns ${keyCols.mkString(",")} must exist in the table")
    require(schema.fieldNames.forall(source.columns.contains),
      "nimble: merge: source must carry every target column " +
        s"(missing: ${schema.fieldNames.filterNot(source.columns.contains).mkString(",")})")
    val unsigned = readOptions.collectFirst {
      case (k, v) if k.equalsIgnoreCase("unsignedColumns") => v
    }.nonEmpty
    require(!unsigned, "nimble: merge: unsigned-widened tables cannot rewrite " +
      "(the widened values are a different physical domain)")

    // the delta is consumed by FIVE independent actions (cardinality check,
    // affected-bounds join, update join, matched-keys semi, insert anti) —
    // persist it once so a real source (a table scan, a shuffle output)
    // computes once instead of five times; unpersisted before returning
    val src = source.select(schema.fieldNames.toIndexedSeq.map(c => col(s"`$c`")): _*)
      .persist()
    try { // every action on src (the cardinality head() included) runs
          // inside this try, so a failing source never leaks the cache entry

    // SQL MERGE cardinality check + null-key rejection, one pass over source
    val keyExprs = keyCols.map(c => col(s"`$c`"))
    val card = src.groupBy(keyExprs: _*).count()
      .select(max("count").as("mx"),
        sum(when(keyExprs.map(_.isNull).reduce(_ || _), 1L).otherwise(0L)).as("nulls"),
        count(lit(1)).as("distinctKeys"))
      .head()
    val sourceKeyCount = card.getLong(2)
    if (sourceKeyCount == 0L) return Report(0, files.length, 0L, 0L)
    require(card.getLong(0) <= 1L,
      "nimble: merge: source has duplicate keys — SQL MERGE cardinality violation")
    require(card.getLong(1) == 0L, "nimble: merge: source has null merge keys")

    // metadata-only affected-file discovery on the FIRST key column's
    // file-level bounds (additional key columns refine matching, not
    // pruning); files without usable bounds are conservatively affected
    val k0 = keyCols.head
    val k0Type = schema(k0).dataType
    // (a file's null target keys never match any source key — keys are
    // checked non-null above — so bounds exclusion stays sound without
    // tracking per-file null counts)
    val bounds: Seq[(String, Option[(Any, Any)])] = files.map { f =>
      val r = new Tablet.Reader(f, NimbleSource.footerOf(f))
      try {
        val st = r.fileStatsOf(k0)
        val b = st.filter(_.hasMinMax).flatMap { s =>
          k0Type match {
            // integral domains only: cast-to-long on the source side is
            // value-preserving for these (a timestamp's cast-to-long is
            // SECONDS while stats carry micros — those stay unbounded)
            case ByteType | ShortType | IntegerType | LongType =>
              Some((s.minLong: Any, s.maxLong: Any))
            case StringType =>
              // stats bytes truncate at 64: the min side is a prefix (≤ true
              // min, conservative); a truncated max cannot bound above
              if (s.minBytes == null || s.maxBytes == null || s.maxBytes.length >= 64) None
              else Some((new String(s.minBytes, "UTF-8"): Any,
                new String(s.maxBytes, "UTF-8"): Any))
            case _ => None // float/ts/date/binary/nested keys: no metadata pruning
          }
        }
        (f, b)
      } finally r.close()
    }
    val unbounded = bounds.collect { case (f, None) => f }
    val boundRows = bounds.collect { case (f, Some((lo, hi))) => (f, lo, hi) }
    val affected: Seq[String] =
      if (boundRows.isEmpty) files
      else {
        import spark.implicits._
        val hits = k0Type match {
          case StringType =>
            val bdf = boundRows.map { case (f, lo, hi) =>
              (f, lo.asInstanceOf[String], hi.asInstanceOf[String]) }.toDF("f", "lo", "hi")
            src.select(col(s"`$k0`").cast("string").as("k")).distinct()
              .join(broadcast(bdf), col("k") >= col("lo") && col("k") <= col("hi"))
          case _ =>
            val bdf = boundRows.map { case (f, lo, hi) =>
              (f, lo.asInstanceOf[Long], hi.asInstanceOf[Long]) }.toDF("f", "lo", "hi")
            src.select(col(s"`$k0`").cast("long").as("k")).distinct()
              .join(broadcast(bdf), col("k") >= col("lo") && col("k") <= col("hi"))
        }
        (hits.select("f").distinct().as[String].collect().toSeq ++ unbounded).distinct
      }

    val layout = try Compaction.recoverLayout(dir) catch { case _: Throwable => Map.empty[String, String] }
    val joinKeys = keyCols
    val (rowsBefore, rowsAfter) =
      if (affected.isEmpty) {
        // pure insert: no file can match — append the source as new files
        // (per-file sort contract: each task sorts its own output file)
        val shaped = layout.get("sortColumns").map(_.split(",").toSeq) match {
          case Some(sc) if !layout.contains("numBuckets") =>
            src.sortWithinPartitions(sc.head, sc.tail: _*)
          case _ => src
        }
        var w = shaped.write.format("nimble").mode("append")
        layout.foreach { case (k, v) => w = w.option(k, v) }
        w.save(dir)
        (0L, 0L)
      } else Delete.rewriteFiles(spark, dir, affected, files, schema, layout,
        readOptions, { t =>
          // matched rows take the source row WHOLESALE (including its
          // nulls); unmatched target rows pass through; unmatched source
          // rows insert. Matched-ness is decided by the source KEY being
          // present (source keys are non-null by the check above), never by
          // per-column coalescing — a legit null update must stick.
          val s2 = src.select(src.columns.toIndexedSeq.map(c => col(s"`$c`").as(s"_s_$c")): _*)
          // the persisted delta's own plan stats carry its cached byte size
          // (exact after the cardinality action materialized it)
          val srcBytes =
            try src.queryExecution.optimizedPlan.stats.sizeInBytes
            catch { case _: Exception => BigInt(Long.MaxValue) }
          if (sourceKeyCount <= BroadcastMaxSourceKeys &&
              srcBytes <= BroadcastMaxSourceBytes) {
            // small-delta plan (the 100 TB common case — corrections/label
            // fixes against a huge sorted table): a full_outer join cannot
            // broadcast, so it would SHUFFLE + sort every affected file's
            // rows against a 1000-row delta. Split it: (a) updates ride a
            // broadcast LEFT join — the target never shuffles; (b) the
            // insert set is source ANTI-join the matched keys, where the
            // matched-key frame is itself ≤ |source| rows (target SEMI
            // broadcast source), so both joins are map-side. Unmatched-key
            // soundness is inherited from the bounds pruning: a key absent
            // from every affected file is absent from the table.
            val cond = joinKeys.map(c => t(c) <=> s2(s"_s_$c")).reduce(_ && _)
            val fromSource = col(s"`_s_${keyCols.head}`").isNotNull
            val updated = t.join(broadcast(s2), cond, "left")
              .select(schema.fieldNames.toIndexedSeq.map { c =>
                (if (keyCols.contains(c)) col(s"`$c`")
                 else when(fromSource, col(s"`_s_$c`")).otherwise(col(s"`$c`"))).as(c)
              }: _*)
            // distinct() bounds the matched-key frame by |source keys| even
            // when the TARGET holds duplicate keys (MERGE cardinality
            // constrains the source only) — without it a dup-key target
            // could inflate the broadcast below arbitrarily
            val matchedKeys = t.select(keyCols.toIndexedSeq.map(c => col(s"`$c`")): _*)
              .join(broadcast(src.select(keyCols.toIndexedSeq.map(c => col(s"`$c`")): _*)),
                keyCols, "left_semi")
              .distinct()
            val inserts = src.join(broadcast(matchedKeys), keyCols, "left_anti")
              .select(schema.fieldNames.toIndexedSeq.map(c => col(s"`$c`")): _*)
            updated.unionByName(inserts)
          } else {
            // big-delta plan: the delta is comparable to the affected set —
            // a shuffled full_outer is the right shape, honestly
            val cond = joinKeys.map(c => t(c) <=> s2(s"_s_$c")).reduce(_ && _)
            val fromSource = col(s"`_s_${keyCols.head}`").isNotNull
            t.join(s2, cond, "full_outer")
              .select(schema.fieldNames.toIndexedSeq.map { c =>
                (if (keyCols.contains(c)) coalesce(col(s"`_s_$c`"), col(s"`$c`"))
                 else when(fromSource, col(s"`_s_$c`")).otherwise(col(s"`$c`"))).as(c)
              }: _*)
          }
        })

    val inserted =
      if (affected.isEmpty) sourceKeyCount
      else rowsAfter - rowsBefore
    Report(affected.length, files.length - affected.length,
      rowsMatched = sourceKeyCount - inserted, rowsInserted = inserted)
    } finally src.unpersist()
  }

  /** Continuous CDC apply: every micro-batch upserts into the tablet dir
    * (foreachBatch — the standard Structured Streaming pattern for sinks
    * with merge semantics). A batch may carry several versions of one key;
    * `versionCol` picks the survivor (max version per key — last-write-wins
    * with an explicit, replayable ordering; keep versions unique per key:
    * a tie picks arbitrarily and replay may then diverge).
    * Exactly-once note: foreachBatch can REPLAY a batch after a failure —
    * upsert is idempotent for updates (same rows overwrite) and for
    * inserts (the key now exists and re-matches), so replay converges. */
  def streamingUpsert(stream: DataFrame, dir: String, keyCols: Seq[String],
      versionCol: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val w = Window.partitionBy(keyCols.map(c => col(s"`$c`")): _*)
            .orderBy(col(s"`$versionCol`").desc)
          val latest = batch.withColumn("_rn", row_number().over(w))
            .filter(col("_rn") === 1).drop("_rn")
          upsert(batch.sparkSession, dir, latest, keyCols)
        }
        ()
      }
      .start()
  }
}
