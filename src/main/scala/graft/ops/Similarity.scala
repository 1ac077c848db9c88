package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2.8).
  *
  * Brute-force cosine top-k is the exact baseline (broadcast the query set,
  * scan the corpus once — no shuffle of the corpus at all); the LSH-bucketed
  * variant is the 100 TB scale path: random-hyperplane signs bucket the
  * corpus so each query only joins its bucket. Dot products use
  * `zip_with` + `aggregate` with explicit left-to-right summation so results
  * are bit-deterministic.
  */
object Similarity {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Deterministic left-to-right cosine similarity of two float arrays.
    * Native fused expression ([[graft.functions.CosineSim]]) — bit-identical
    * to [[cosineComposed]] but one pass per row instead of interpreted
    * per-element higher-order functions. */
  def cosine(a: Column, b: Column): Column = {
    graft.functions.VectorOps.register(SparkSession.active)
    call_function("graft_cosine", a, b)
  }

  /** Composed-operator cosine (the cross-validation reference). */
  def cosineComposed(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * Output: (q, neighbor, rank, sim). Excludes self-matches. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("q"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor"), col(vecCol).as("cv"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("q") =!= col("neighbor"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("q").orderBy(round(col("sim"), 6).desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q"), col("neighbor"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs — EXACT, via a blocked pair join
    * (no CartesianProduct operator anywhere in the plan).
    *
    * Why not LSH here: this operator promises the exact pair set, and on real
    * near-threshold data LSH cannot. Measured on the test corpus at t=0.4 the
    * qualifying similarities form a continuum across the threshold (min
    * qualifying 0.4005, max non-qualifying 0.3999): random-hyperplane
    * collision probability for a pair AT the threshold is fixed
    * (1-acos(t)/pi ~= 0.63), so any table/probe budget leaves a nonzero miss
    * rate — probabilistic recall is the wrong contract for an exact operator.
    * [[lshTopK]]/[[ivfAssign]] are the declared-approximate ANN paths.
    *
    * Exact all-pairs compare is irreducibly O(n^2); what must NOT be O(n^2)
    * is any single task or the driver. Grid scheme: each vector lands in
    * block g = hash(id) mod G; the G*(G+1)/2 unordered block pairs become the
    * join key, so the work is hash-partitioned into uniform block-x-block
    * tiles across the cluster, the per-tile compare pipelines through
    * codegen'd filter before anything else shuffles, and no task holds more
    * than (n/G)^2 candidates. Replication cost: each row is shuffled into
    * G+1 tiles total (G-blk as the a-side, blk+1 as the b-side), so G is the
    * vector-column shuffle amplification — it must grow like sqrt(desired
    * tasks), NOT linearly with cluster size. Default targets ~2 waves:
    * G(G+1)/2 ~= 2*parallelism, i.e. G ~= 2*sqrt(parallelism), capped at 256
    * (beyond which replication, not task count, dominates cost). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, blocks: Int = 0, exactLimit: Long = Long.MaxValue): DataFrame = {
    val spark = df.sparkSession
    // Size routing (r12, OPT-IN since r13): the grid path is EXACT but
    // O(n^2) compute — fine distributed up to a few million rows, ruinous at
    // corpus scale. A caller passing a finite `exactLimit` opts in: above
    // that many rows the call degrades to the kmeans-blocked approximate
    // path ([[semanticNearDupPairs]]): only intra-cluster pairs compare, so
    // compute drops to k * (n/k)^2 at a DOCUMENTED recall contract — pairs
    // whose members land in different clusters are missed; at near-dup
    // thresholds (>= ~0.85) duplicates co-cluster almost always. The default
    // is Long.MaxValue — an existing exact call NEVER silently changes
    // semantics, and pays no extra count() job.
    //
    // The exact-vs-approximate decision must NEVER ride an estimate:
    // optimizer rowCount is a selectivity guess (flipping result semantics
    // on it is silent data loss) and sizeInBytes under-counts through
    // compression and Catalyst defaultSize scaling (routing a 10M-row
    // corpus to the exact grid on it is a runaway O(n^2) job). One exact
    // count() — a single scan, trivial next to the pair join either way —
    // makes the routing deterministic. An explicit `blocks` is the caller
    // hand-sizing the exact grid: routing (and its count job) is skipped.
    if (exactLimit < Long.MaxValue && blocks <= 0) {
      val rows = df.count()
      if (rows > exactLimit) {
        log.warn(s"cosineNearDupPairs: $rows rows > exactLimit=$exactLimit — " +
          "degrading to the approximate kmeans-blocked path (cross-cluster pairs are missed)")
        val k = math.max(8, math.min(8192, (rows / 20000L).toInt))
        return semanticNearDupPairs(df, idCol, vecCol, threshold, k)
      }
    }
    val g = if (blocks > 0) blocks
      else math.max(4, math.min(256,
        math.ceil(2 * math.sqrt(spark.sparkContext.defaultParallelism.toDouble)).toInt))
    val blockPairs = spark.createDataFrame(
      for { i <- 0 until g; j <- i until g } yield (i, j)).toDF("bi", "bj")
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("blk", pmod(xxhash64(col("id")), lit(g)).cast("int"))
    val aSide = v.join(broadcast(blockPairs), col("blk") === col("bi"))
      .select(col("bi"), col("bj"), col("id").as("ida"), col("v").as("av"))
    val bSide = v.join(broadcast(blockPairs), col("blk") === col("bj"))
      .select(col("bi"), col("bj"), col("id").as("idb"), col("v").as("bv"))
    aSide.join(bSide, Seq("bi", "bj"))
      // diagonal tiles (bi==bj) see each unordered pair twice -> keep one
      // orientation; off-diagonal tiles see it exactly once -> keep all
      .filter(col("bi") =!= col("bj") || col("ida") < col("idb"))
      .withColumn("sim", round(cosine(col("av"), col("bv")), 6))
      .filter(col("sim") >= threshold)
      .select(least(col("ida"), col("idb")).as("a"),
        greatest(col("ida"), col("idb")).as("b"), col("sim"))
  }

  /** All-pairs reference form of [[cosineNearDupPairs]] (cross-validation
    * only — cartesian plan, never the production path). */
  def cosineNearDupPairsAllPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("a"), col(vecCol).as("av"))
    val b = df.select(col(idCol).as("b"), col(vecCol).as("bv"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .withColumn("sim", round(cosine(col("av"), col("bv")), 6))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
  }

  /** Random-hyperplane LSH bucket id for a vector: sign bits of dot products
    * with `planes` pseudo-random hyperplanes derived deterministically from
    * dimension index (no data-dependent state — reproducible cluster-wide). */
  def lshBucket(vec: Column, dims: Int, planes: Int): Column = {
    graft.functions.VectorOps.register(SparkSession.active)
    call_function("graft_lsh_bucket", vec, lit(dims), lit(planes))
  }

  /** Composed-operator LSH bucket (the cross-validation reference). */
  def lshBucketComposed(vec: Column, dims: Int, planes: Int): Column = {
    // plane p, dim d weight = deterministic pseudo-random in [-1, 1)
    val sigs = (0 until planes).map { p =>
      val weighted = aggregate(
        zip_with(vec, sequence(lit(0), lit(dims - 1)),
          (v, d) => v.cast("double") *
            (pmod(d * lit(2654435761L) + lit(p.toLong * 40503L + 7L), lit(1000003L)).cast("double") / 500001.5 - 1.0)),
        lit(0.0), (acc, v) => acc + v)
      when(weighted >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    sigs.reduce(_ + _)
  }

  /** Multi-probe bucket list: main bucket + single-bit flips of the
    * lowest-|margin| planes (see [[graft.functions.LshProbes]]). */
  def lshProbes(vec: Column, dims: Int, planes: Int, nprobes: Int): Column = {
    graft.functions.VectorOps.register(SparkSession.active)
    call_function("graft_lsh_probes", vec, lit(dims), lit(planes), lit(nprobes))
  }

  /** Composed-operator multi-probe list (the cross-validation reference):
    * same margin arithmetic as [[lshBucketComposed]], flips ordered by raw
    * |margin| with plane index as tiebreak — the fold accumulates dimensions
    * ascending exactly like the native expression and the SQL oracle, so the
    * doubles are bit-identical and the order needs no rounding. */
  def lshProbesComposed(vec: Column, dims: Int, planes: Int, nprobes: Int): Column = {
    def margin(p: Int): Column = aggregate(
      zip_with(vec, sequence(lit(0), lit(dims - 1)),
        (v, d) => v.cast("double") *
          (pmod(d * lit(2654435761L) + lit(p.toLong * 40503L + 7L), lit(1000003L)).cast("double") / 500001.5 - 1.0)),
      lit(0.0), (acc, v) => acc + v)
    val bucket = (0 until planes)
      .map(p => when(margin(p) >= 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
    // (raw |margin|, plane, mask) sorted ascending give the flip order;
    // the mask rides along so the lambda needs no dynamic shift
    val ranked = array_sort(array((0 until planes).map(p =>
      struct(abs(margin(p)).as("m"), lit(p).as("p"), lit(1L << p).as("mask"))): _*))
    val flips = transform(slice(ranked, 1, math.min(nprobes - 1, planes)),
      e => bucket.bitwiseXOR(e.getField("mask")))
    concat(array(bucket), flips)
  }

  /** Approximate top-k with multi-probe: each query joins its own bucket plus
    * the `nprobes - 1` buckets reached by flipping its least-confident sign
    * bits — bucket-miss queries (empty main bucket) fall back to near-boundary
    * buckets instead of returning nothing. The probe list explodes on the
    * (small, broadcast) query side only; the corpus keeps one bucket per row,
    * so corpus shuffle cost is unchanged and recall rises with nprobes at
    * O(nprobes) extra probe-join fan-out. nprobes=1 is plain single-probe. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, dims: Int, planes: Int = 8, nprobes: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("q"), col(vecCol).as("qv"))
      .withColumn("bucket", explode(lshProbes(col("qv"), dims, planes, nprobes)))
    val c = corpus.select(col(idCol).as("neighbor"), col(vecCol).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), dims, planes))
    val scored = broadcast(q).join(c, Seq("bucket"))
      .filter(col("q") =!= col("neighbor"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("q").orderBy(round(col("sim"), 6).desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q"), col("neighbor"), col("rank"))
  }

  /** Symmetric int8 quantization of an embedding column: per-vector scale =
    * max |v_i|, q_i = round(v_i / scale * 127). The 4x storage cut every
    * large embedding corpus applies before indexing; scale rides along for
    * dequantization. Deterministic (max is order-independent, one division
    * per element). */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    quantizeFull(df, idCol, vecCol).select(col(idCol), col("scale"), col("q"))

  /** [[quantizeInt8]] with the original vector kept alongside — (id, v,
    * scale, q). One definition of the quantization arithmetic, so consumers
    * that carry the raw vector (k-means blocking) can never drift from the
    * x17-oracle-pinned formula. */
  private def quantizeFull(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val withScale = df.select(col(idCol), col(vecCol).as("v"))
      .withColumn("scale", aggregate(col("v"), lit(0.0),
        (a, x) => greatest(a, abs(x.cast("double")))))
    withScale.select(col(idCol), col("v"),
      col("scale"),
      transform(col("v"), x =>
        when(col("scale") === 0.0, lit(0))
          .otherwise(round(x.cast("double") / col("scale") * 127).cast("int"))).as("q"))
  }

  /** The centroid table as a one-row broadcastable codebook array — the
    * shape that lets a corpus-sized argmax run as a per-row fold with ZERO
    * shuffles (vs. crossJoin + window, which explodes the corpus ×C and
    * re-shuffles it by id just to pick each row's max). */
  private def codebook(centroids: DataFrame): DataFrame =
    broadcast(centroids.agg(collect_list(
      struct(col("cid").cast("long").as("cid"), col("cvec").as("cvec"))).as("cb")))

  /** Per-row nearest-cell id over the codebook array: running (sim, cid)
    * maximum with the smaller cid winning exact ties — order-independent, so
    * the nondeterministic collect_list order cannot change the result.
    * Matches ORDER BY round(sim, 6) DESC, cid ASC LIMIT 1 — including the
    * NaN edge (zero vectors): ORDER BY ranks NaN above every value in both
    * Spark and DuckDB, while the comparison operator the fold uses says
    * NaN > x is false, so NaN maps to +Inf before comparing. */
  private def bestCell(vec: Column, cb: Column): Column =
    aggregate(cb,
      struct(lit(-2.0).as("s"), lit(Long.MaxValue).as("c")),
      (acc, e) => {
        val raw = round(cosine(vec, e.getField("cvec")), 6)
        val s = when(isnan(raw), lit(Double.PositiveInfinity)).otherwise(raw)
        when(s > acc.getField("s") ||
            (s === acc.getField("s") && e.getField("cid") < acc.getField("c")),
          struct(s.as("s"), e.getField("cid").as("c"))).otherwise(acc)
      }).getField("c")

  /** IVF-style coarse quantization: assign each vector to the nearest of
    * `centroids` (a small broadcast table of (cid, vec)); ANN search then
    * probes only the query's cell. The centroid table stands in for a trained
    * codebook (k-means training is a separate offline job). The assignment is
    * a narrow per-row fold over the broadcast codebook — no corpus shuffle,
    * no ×C row blowup, the plan a 100 TB assignment needs. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    df.select(col(idCol), col(vecCol))
      .crossJoin(codebook(centroids)) // one row: a join in name only
      .select(col(idCol), bestCell(col(vecCol), col("cb")).as("cid"))

  /** IVF ANN top-k: each query searches only its `nprobe` nearest cells.
    * Corpus side: one zero-shuffle fold assigns every vector its cell
    * (vector kept for the re-rank). Query side (small): crossJoin the
    * centroid table + window picks the nprobe closest cells per query, then
    * the probe list broadcast-joins the assigned corpus on cell id — corpus
    * rows outside probed cells never reach the re-rank. Exact cosine re-rank
    * with the deterministic (round(sim,6) DESC, neighbor ASC) order shared
    * by [[cosineTopK]] and [[lshTopK]]. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, k: Int, nprobe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qcells = queries.select(col(idCol).as("q"), col(vecCol).as("qv"))
      .crossJoin(broadcast(centroids.select(col("cid").cast("long").as("cid"), col("cvec"))))
      .withColumn("csim", round(cosine(col("qv"), col("cvec")), 6))
    val wq = Window.partitionBy("q").orderBy(col("csim").desc, col("cid").asc)
    val probes = qcells.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe).select(col("q"), col("qv"), col("cid"))
    val cells = corpus.select(col(idCol).as("neighbor"), col(vecCol).as("cv"))
      .crossJoin(codebook(centroids))
      .select(col("neighbor"), col("cv"), bestCell(col("cv"), col("cb")).as("cid"))
    val scored = broadcast(probes).join(cells, Seq("cid"))
      .filter(col("q") =!= col("neighbor"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("q").orderBy(round(col("sim"), 6).desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q"), col("neighbor"), col("rank"))
  }

  /** Distributed k-means over int8-quantized embeddings — the offline
    * codebook-training job [[ivfAssign]]'s doc points at, and the blocking
    * key for semantic dedup / diversity sampling over a 100 TB corpus.
    *
    * Every arithmetic step is INTEGER-exact and order-independent, so the
    * whole T-iteration pipeline replays value-for-value in any engine (the
    * x33 DuckDB oracle re-derives all iterations; a float k-means could
    * never hash-match across engines because centroid sums would depend on
    * partitioning order):
    *  - vectors quantize to `u = round(x/scale*127) + 127` ∈ [0,254]
    *    (the [[quantizeInt8]] derivation, shifted non-negative so integral
    *    division below truncates and floors identically)
    *  - init: centroids j=0..k-1 are the u-vectors of the k smallest ids
    *  - assignment: argmin_j Σ_d (u_d − c_d)² in longs; ties → smaller j
    *  - update: per-dimension truncated mean `sum div count`; an empty
    *    cluster keeps its previous centroid
    *
    * Scale shape: each assignment is a ZERO-SHUFFLE per-row fold over the
    * broadcast k×d codebook (the [[ivfAssign]] plan); each update is a
    * partial-aggregating (cluster, dim) sum — k·d result rows map-side
    * combined; the driver holds k·d longs per round, independent of corpus
    * size. Iterations are a fixed small T, not run-to-convergence: T passes
    * over the corpus is the cost model a 100 TB training job budgets for.
    *
    * Returns (idCol, cluster) for every input row, the final-iteration
    * assignment. With `persist = true` (default) it comes back PERSISTED
    * and materialized (the iterations already paid for it; reuse is free) —
    * the caller owns the cache: call `.unpersist()` on the returned frame
    * when done, the dedupClusters contract. Pass `persist = false` for
    * consume-once pipelines (the assignment recomputes through lineage in
    * one pass; nothing is leaked into the session). */
  def kmeansInt8(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 2, persist: Boolean = true): DataFrame =
    kmeansCore(df, idCol, vecCol, k, iters, carryVec = false, persistResult = persist)

  /** Shared k-means engine; `carryVec` keeps the ORIGINAL vector column in
    * the output (id, v, cluster) so downstream exact re-ranks/joins need no
    * corpus-wide id join back to the source. */
  private def kmeansCore(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, carryVec: Boolean, persistResult: Boolean): DataFrame = {
    require(k >= 1, "kmeansInt8: k must be >= 1")
    require(iters >= 1, "kmeansInt8: iters must be >= 1")
    val spark = df.sparkSession
    val carried: Seq[org.apache.spark.sql.Column] =
      if (carryVec) Seq(col("v")) else Nil
    val u0 = quantizeFull(df, idCol, vecCol)
      .select(col(idCol).as("id") +: carried :+
        transform(col("q"), x => (x + lit(127)).cast("long")).as("u"): _*)
    // persisted (NOT localCheckpoint — recomputable lineage survives
    // executor loss); released before returning, like Dedup.dedupApply
    val u = u0.persist()
    val init = u.orderBy(col("id")).limit(k).collect()
    require(init.length == k, s"kmeansInt8: corpus has ${init.length} rows < k=$k")
    var cents: Array[Array[Long]] = init.map(_.getAs[scala.collection.Seq[Long]]("u").toArray)
    val dims = cents.head.length
    require(cents.forall(_.length == dims), "kmeansInt8: ragged vector widths")

    def assign(): DataFrame = {
      val cbRows = cents.toIndexedSeq.zipWithIndex
        .map { case (c, j) => (j.toLong, c.toIndexedSeq) }
      val sess = spark; import sess.implicits._
      val cb = broadcast(cbRows.toDF("cid", "cvec")
        .agg(collect_list(struct(col("cid"), col("cvec"))).as("cb")))
      val best = aggregate(col("cb"),
        struct(lit(Long.MaxValue).as("dist"), lit(Long.MaxValue).as("c")),
        (acc, e) => {
          val dist = aggregate(
            zip_with(col("u"), e.getField("cvec"), (a, b) => (a - b) * (a - b)),
            lit(0L), (s, x) => s + x)
          when(dist < acc.getField("dist") ||
              (dist === acc.getField("dist") && e.getField("cid") < acc.getField("c")),
            struct(dist.as("dist"), e.getField("cid").as("c"))).otherwise(acc)
        }).getField("c")
      u.crossJoin(cb).select(col("id") +: carried ++: Seq(col("u"), best.as("cluster")): _*)
    }

    var assigned = assign()
    for (_ <- 1 until iters) {
      // per-dim sums: k*dims partial-agg rows to the driver, corpus-size-free
      val sums = assigned
        .select(col("cluster"), posexplode(col("u")).as(Seq("d", "uv")))
        .groupBy("cluster", "d")
        .agg(sum("uv").as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone) // empty cluster keeps its previous centroid
      sums.foreach { r =>
        // non-negative operands: truncating long division == floor (and
        // == DuckDB's // in the oracle replay)
        next(r.getLong(0).toInt)(r.getInt(1)) = r.getLong(2) / r.getLong(3)
      }
      cents = next
      assigned = assign()
    }
    val out = assigned
      .select(col("id").as(idCol) +: carried :+ col("cluster"): _*)
    if (persistResult) {
      val cached = out.persist()
      cached.count() // materialize before releasing the quantized cache underneath
      u.unpersist()
      cached
    } else {
      // caller will not keep the cache: skip the materializing count (a
      // whole wasted corpus pass) — consumers recompute the assignment
      // through lineage (quantize + fold, one pass per consumer)
      u.unpersist(false)
      out
    }
  }

  /** Semantic near-duplicate pairs — k-means clusters as the blocking key,
    * exact cosine within blocks.
    *
    * The LSH/SimHash near-dup family blocks on SYNTACTIC signatures; this
    * blocks on embedding-space neighborhoods, the right tool when
    * paraphrases should collide. At corpus scale, `k` plays the role LSH
    * band count plays: size it so clusters stay bounded (k ~ corpus/10⁵),
    * and the within-block self-join stays quadratic only in block size —
    * the same blowup contract as [[cosineNearDupPairs]]'s grid tiles, with
    * data-adaptive blocks instead of hash-random ones. Recall is bounded by
    * the blocking (a pair straddling two clusters is missed — by design,
    * like any blocked near-dup); the x34 oracle replays the IDENTICAL
    * pipeline, so correctness is exact over the declared semantics.
    *
    * Returns (a, b, sim) with a < b, sim = round(cosine, 6) >= threshold,
    * both members in the same cluster. */
  def semanticNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, k: Int, iters: Int = 2): DataFrame = {
    // carryVec: the assignment hands back (id, v, cluster) directly — no
    // corpus-wide join back to the source just to recover the vectors.
    // persistResult=false: no session-leaked cache and no wasted
    // materializing pass; each join side recomputes the assignment through
    // lineage (the centroids are baked in as a local relation, so no
    // driver iteration re-runs)
    val v = kmeansCore(df, idCol, vecCol, k, iters,
      carryVec = true, persistResult = false).withColumnRenamed(idCol, "id")
    val a = v.select(col("cluster"), col("id").as("a"), col("v").as("av"))
    val b = v.select(col("cluster"), col("id").as("b"), col("v").as("bv"))
    val pairs = a.join(b, Seq("cluster")).filter(col("a") < col("b"))
      .withColumn("sim", round(cosine(col("av"), col("bv")), 6))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
    pairs
  }
}
