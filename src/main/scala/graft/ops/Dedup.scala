package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale deduplication operators (SURVEY.md §2.8).
  *
  * All operators are pure DataFrame compositions (codegen'd `functions._`,
  * no UDFs) and scale by shuffle-on-key: exact/fingerprint dedup is a single
  * hash aggregation; n-gram Jaccard uses an inverted shingle index with a
  * document-frequency cap so hot shingles cannot quadratically explode the
  * pair join at 100 TB; MinHash/LSH buckets candidates by band signature so
  * the join is linear in bucket sizes, then verifies candidates exactly.
  */
object Dedup {

  /** Tokenized, lower-cased words. */
  def words(text: Column): Column = split(lower(text), "\\s+")

  /** Distinct word n-gram shingles of `text`. */
  def shingles(text: Column, n: Int): Column = {
    val w = words(text)
    array_distinct(transform(
      sequence(lit(0), greatest(size(w) - n, lit(0))),
      i => concat_ws(" ", slice(w, i + 1, lit(n)))))
  }

  /** Stable 32-bit shingle/token id from md5 (reproducible everywhere,
    * including SQL engines: conv(substr(md5(s),25,8),16,10)). */
  def hash32(c: Column): Column = conv(substr(md5(c), lit(25), lit(8)), 16, 10).cast("long")

  /** Exact duplicate removal on a key set — one hash aggregation. */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame = df.dropDuplicates(cols)

  /** Fingerprint dedup: md5 of whitespace-normalized lower-cased text;
    * returns one group row per fingerprint with the keeper id (min). */
  def fingerprintGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("keeper"))

  /** Exact n-gram Jaccard near-duplicate pairs via inverted shingle index.
    *
    * Scale path: explode distinct shingles -> (shingle, doc) -> optional
    * doc-frequency cap (drops shingles appearing in > maxDf docs; a hot
    * shingle contributes ~maxDf^2 candidate pairs) -> self-join on shingle ->
    * per-pair intersection counts -> Jaccard = |A∩B| / (|A|+|B|-|A∩B|).
    * Exact (recall 1.0) when maxDf disabled (<=0). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDf: Int = -1): DataFrame = {
    // 64-bit-hash the shingles once up front: every downstream shuffle,
    // sort_array, join key and array_intersect then works on longs instead of
    // ~n-word strings (same sets — a 64-bit collision inside one pair's union
    // has probability ~|union|^2/2^64, irrelevant even at 100 TB). The native
    // single-pass expression is bit-identical to
    // array_distinct(transform(shingles(text, n), xxhash64)) but ~30x faster
    // (higher-order functions evaluate interpreted per element).
    graft.functions.ShingleHashes.register(df.sparkSession)
    val docs = df.select(col(idCol).as("doc"),
        call_function("graft_shingle_hashes", col(textCol), lit(n)).as("sh"))
      .withColumn("sz", size(col("sh")))
    // Prefix filtering (PPJoin-style, EXACT): order shingles by ascending
    // global document frequency; a pair with Jaccard >= t must share at least
    // one shingle within each side's first (sz - ceil(t*sz) + 1) shingles in
    // that order — only those prefix shingles enter the candidate join, so
    // hot shingles stop driving a quadratic pair blowup while recall stays
    // 1.0 (candidates are then verified with the exact intersection count).
    val inv0 = docs.select(col("doc"), col("sz"), explode(col("sh")).as("s"))
    // document frequency via partial-aggregating groupBy + join-back: the
    // aggregation shuffles map-side-combined (shingle, count) pairs rather
    // than raw postings, and the join-back is AQE-skew-splittable — unlike a
    // window partition, which pins a corpus-hot shingle's entire posting
    // list (O(corpus) rows for a stop-word trigram) on one reducer
    val dfCounts = inv0.groupBy("s").agg(count(lit(1)).as("df"))
    val withDf = inv0.join(dfCounts, Seq("s"))
    // length-aware prefix (exact): any partner B of A has |B| >= max(Lmin,
    // ceil(t*|A|)) (below that Jaccard can't reach t), so the required
    // overlap is at least ceil(t/(1+t) * (|A| + that bound)) — which shortens
    // the indexed prefix well below the naive |A| - ceil(t*|A|) + 1.
    // r21: folding this min into the df-count aggregate (one fewer corpus
    // pass on paper) was MEASURED AND REJECTED — column pruning strips the
    // extra min from the join-back branch, the two aggregate subtrees then
    // canonicalize differently, exchange reuse never fires (runtime AQE plan:
    // Reused=0), and the "shared" pass re-runs the whole explode+shuffle:
    // warm A/B 1.06 s (this shape) vs 1.16 s (fused). tools/X02MinSzAB.scala.
    val minSz = docs.agg(min(col("sz")).as("lmin"))
    // rank each doc's shingles by ascending global frequency with a window
    // (one shuffle on doc; no per-doc array materialization — the previous
    // collect_list + sort_array + posexplode stage at 10x the memory), then
    // keep only the PPJoin prefix
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy(col("df"), col("s"))
    val ranked = withDf
      .withColumn("pos", row_number().over(byRarity) - 1)
      .crossJoin(broadcast(minSz))
      .withColumn("omin",
        ceil(lit(threshold / (1 + threshold)) *
          (col("sz") + greatest(col("lmin"), ceil(lit(threshold) * col("sz"))))))
      .withColumn("plen", greatest(col("sz") - col("omin") + 1, lit(1)).cast("int"))
      .filter(col("pos") < col("plen"))
      .select(col("doc"), col("sz"), col("pos"), col("s"), col("df"))
      // optional recall-trading cap for adversarial corpora: drop prefix
      // entries whose shingle is hotter than maxDf (maxDf <= 0 keeps exact)
      .filter(if (maxDf > 0) col("df") <= maxDf else lit(true))
    // PPJoin positional filter (exact): a shared shingle at sorted positions
    // (pa, pb) caps the possible overlap at 1 + min(remaining_a, remaining_b);
    // Jaccard >= t needs overlap >= t/(1+t) * (|A|+|B|).
    // r21 OPT (guide §2.4): candidates come from ONE posting-bucket
    // aggregate instead of the a/b self-join on s — the join's two aliased
    // sides each re-evaluated the whole inverted-index + window pipeline
    // (no exchange reuse fires across the renames), which was the single
    // largest x02 stage. Grouping the prefix postings per shingle and
    // exploding within-bucket ordered pairs emits exactly the join's
    // (a < b)-filtered pair set under the same positional bound; a hot
    // bucket costs O(|B|^2) pairs either way, and the collected list is
    // the PPJoin PREFIX posting list (rarity-ordered, length-capped), not
    // the full inverted list.
    val buckets = ranked.groupBy("s")
      .agg(collect_list(struct(col("doc"), col("sz"), col("pos"))).as("ps"))
      .filter(size(col("ps")) >= 2)
    val candidates = buckets
      .select(explode(col("ps")).as("x"), col("ps"))
      .select(col("x"), explode(col("ps")).as("y"))
      .filter(col("x.doc") < col("y.doc"))
      .filter((lit(1) + least(col("x.sz") - col("x.pos") - 1, col("y.sz") - col("y.pos") - 1)) >=
        ceil(lit(threshold / (1 + threshold)) * (col("x.sz") + col("y.sz"))))
      .select(col("x.doc").as("a"), col("y.doc").as("b")).distinct()
    // exact verification on full shingle sets
    val sets = docs.select(col("doc"), col("sh"), col("sz"))
    candidates
      .join(sets.select(col("doc").as("a"), col("sh").as("sha"), col("sz").as("sza")), Seq("a"))
      .join(sets.select(col("doc").as("b"), col("sh").as("shb"), col("sz").as("szb")), Seq("b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("inter"), col("jaccard"))
  }

  /** MinHash + LSH banding near-dup candidates with exact verification.
    *
    * numPerms permutations h_j(x) = (a_j*x + b_j) mod p over 32-bit shingle
    * ids, banded into `bands` groups of numPerms/bands rows; docs sharing any
    * band signature become candidates; candidates are verified with exact
    * shingle-set Jaccard (so precision 1.0; recall is the LSH probability).
    * Reference capability: SURVEY.md §2.8 (MinHashLSH). */
  /** Benchmark decontamination: corpus documents sharing at least one word
    * n-gram with a benchmark/eval set, with the overlap count (the standard
    * train-test contamination filter in LLM data pipelines).
    *
    * Scale path: benchmark shingles are DISTINCT + broadcast (eval suites
    * are tiny next to a 100 TB corpus — a Bloom filter of the set drops in
    * for extreme cases), so the corpus side is one narrow scan with a
    * map-side semi join; the only shuffle is the per-doc overlap count,
    * which is partial-aggregating on doc id. */
  /** Exact substring-overlap profile — the ExactSubstr dedup family
    * ("Deduplicating Training Data Makes Language Models Better", Lee et
    * al. 2022) recast for Spark: instead of a monolithic suffix array,
    * every length-`windowTokens` token window of every document becomes a
    * grouping key; a window whose EXACT text occurs in 2+ distinct
    * documents is a duplicated span. Emits one row per document:
    * (id, total_windows, dup_windows) — dup_windows/total_windows is the
    * "fraction of this doc that is copied from elsewhere" signal used to
    * drop or trim boilerplate-heavy docs.
    *
    * Exactness: windows group by their TEXT, not a hash — no collision
    * caveat (at extreme scale, substituting a 128-bit hash for the key cuts
    * shuffle bytes; the semantics then hold modulo hash collisions). Cost
    * shape: the explode is linear in corpus tokens (stride 1 — the price of
    * catching EVERY shared span); all three aggregations are
    * partial-aggregating shuffles on (window[, doc]) keys, AQE-splittable
    * under skew; nothing is quadratic and the driver holds nothing. */
  def substringOverlapProfile(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 8): DataFrame = {
    require(windowTokens > 0, "substringOverlapProfile: windowTokens must be > 0")
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc"), words(col(textCol)).as("w"))
      .withColumn("nw",
        greatest(size(col("w")) - windowTokens + 1, lit(0)).cast("long"))
    val wins = base.filter(col("nw") > 0)
      .select(col("doc"), explode(transform(sequence(lit(1), col("nw")),
        i => array_join(slice(col("w"), i, lit(windowTokens)), " "))).as("win"))
    val dh = wins.groupBy("win", "doc").agg(count(lit(1)).as("cnt"))
    val hs = dh.groupBy("win").agg(count(lit(1)).as("ndocs"))
    val dup = dh.join(hs.filter(col("ndocs") >= 2), Seq("win"))
      .groupBy("doc").agg(sum("cnt").as("dup"))
    base.select(col("doc"), col("nw"))
      .join(dup, Seq("doc"), "left")
      .select(col("doc").as(idCol), col("nw").as("total_windows"),
        coalesce(col("dup"), lit(0L)).as("dup_windows"))
  }

  def decontaminate(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val b = bench.select(explode(shingles(col(textCol), n)).as("g")).distinct()
    corpus.select(col(idCol), explode(shingles(col(textCol), n)).as("g"))
      .join(broadcast(b), Seq("g"))
      .groupBy(col(idCol))
      // plain count: shingles() is per-doc distinct and the bench side is
      // DISTINCT, so g is already unique per (doc, g) — a count_distinct
      // would drag a per-group hash set through both aggregate phases
      .agg(count(lit(1)).as("hits"))
  }

  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numPerms: Int = 32, bands: Int = 8,
      threshold: Double = 0.5,
      /** r22 (guide §5): when > 0, (band, sig) buckets larger than this take
        * a salted two-level pair explosion so no aggregation-buffer row ever
        * holds more than ~maxBucket ids — a degenerate corpus (mass
        * near-identical docs) otherwise concentrates the whole corpus's ids
        * into ONE collect_list row. The pair set is EXACT either way (unlike
        * jaccard's recall-trading maxDf). Off (<= 0) by default: the routing
        * needs a bucket-size count pass plus semi/anti splits that
        * re-evaluate the signature pipeline several times (no exchange reuse
        * fires across the branches — measured 30 -> 142 Exchanges), a tax
        * the common corpus must not pay; a 100 TB pipeline with boilerplate
        * duplicate storms sets it explicitly. */
      maxBucket: Int = -1): DataFrame = {
    val p = 4294967311L // first prime > 2^32
    val rows = numPerms / bands
    val perms = (0 until numPerms).map(j => (j, 2L * j + 1L, (j * 12582917L + 3L) % p))

    // hashed shingle sets (native single-pass; see ngramJaccardPairs) —
    // minhash permutations run over the low 32 bits, candidate verification
    // over the full 64-bit sets (identical Jaccard as string sets)
    graft.functions.ShingleHashes.register(df.sparkSession)
    val docs = df.select(col(idCol).as("doc"),
      call_function("graft_shingle_hashes", col(textCol), lit(n)).as("sh"))
    val ids = docs.select(col("doc"), explode(col("sh")).as("s"))
      .withColumn("h", col("s").bitwiseAND(lit(0xffffffffL)))
    // r21 OPT (guide §2.3/§2.4): all numPerms minhashes fold into ONE
    // map-side-combining groupBy(doc) — numPerms parallel min aggregates
    // over the same shingle rows, each permutation a literal affine map of
    // `h` (identical 64-bit wraparound arithmetic to the old broadcast-join
    // form). The previous shape crossJoin-exploded every (doc, shingle) row
    // numPerms times and shuffled that 32x frame to a (doc, j) aggregate,
    // then shuffled AGAIN to group (doc, band) signatures; both corpus-sized
    // shuffles and the 32x row blowup are gone. Band signatures stay as
    // long arrays in fixed j order (two docs share a band iff every minhash
    // in the band matches — exactly the old sorted "j:mh" string equality,
    // minus the per-row string building), and candidates come from ONE
    // bucket aggregate instead of a self-join: the old l/r join evaluated
    // the whole shingle+minhash pipeline twice (no exchange reuse across
    // the differently-aliased sides); grouping (band, sig) and exploding
    // within-bucket pairs computes it once and shuffles the same bytes the
    // join's one side shuffled. A degenerate hot bucket costs O(|B|^2)
    // pairs either way (join or explode) — the explode holds one |B|-long
    // id array per bucket, the join an equal-size hash/sort run.
    val mhCols = perms.map { case (j, pa, pb) =>
      min((lit(pa) * col("h") + lit(pb)) % p).as(s"mh$j") }
    val mh = ids.groupBy("doc").agg(mhCols.head, mhCols.tail: _*)
    val sigOf = (b: Int) =>
      array((b * rows until (b + 1) * rows).map(j => col(s"mh$j")): _*)
    val sigs = mh.select(col("doc"), explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), sigOf(b).as("sig"))): _*)).as("bs"))
      .select(col("bs.band").as("band"), col("bs.sig").as("sig"), col("doc"))
    // maxBucket > 0 (guide §5): bound the bucket aggregate's per-row memory.
    // A map-side-combining COUNT pass finds oversized (band, sig) buckets
    // (empty at any realistic dup rate — the broadcast is a handful of keys
    // at most); ordinary buckets keep the one-aggregate explode, while
    // oversized ones split into salted sub-buckets (expected |B|/64 ids per
    // aggregation row) whose within- and cross-group pair explosions emit
    // exactly the same unordered pair set: sub-groups PARTITION the bucket,
    // so each {a, b} appears once — in its own group when salts collide, in
    // the one ordered (ga < gb) group product otherwise.
    val candidates = if (maxBucket <= 0) {
      sigs.groupBy("band", "sig")
        .agg(collect_list(col("doc")).as("ds"))
        .filter(size(col("ds")) >= 2)
        .select(explode(col("ds")).as("a"), col("ds"))
        .select(col("a"), explode(col("ds")).as("b"))
        .filter(col("a") < col("b"))
        .select("a", "b").distinct()
    } else {
      val big = sigs.groupBy("band", "sig").agg(count(lit(1)).as("bn"))
        .filter(col("bn") > maxBucket).select("band", "sig")
      val smallPairs = sigs.join(broadcast(big), Seq("band", "sig"), "left_anti")
        .groupBy("band", "sig")
        .agg(collect_list(col("doc")).as("ds"))
        .filter(size(col("ds")) >= 2)
        .select(explode(col("ds")).as("a"), col("ds"))
        .select(col("a"), explode(col("ds")).as("b"))
        .filter(col("a") < col("b"))
        .select("a", "b")
      val sub = sigs.join(broadcast(big), Seq("band", "sig"), "left_semi")
        .withColumn("g", pmod(xxhash64(col("doc")), lit(64)))
        .groupBy("band", "sig", "g").agg(collect_list(col("doc")).as("ds"))
      val bigPairs = sub.select(col("band"), col("sig"), col("g").as("ga"), col("ds").as("dsa"))
        .join(sub.select(col("band"), col("sig"), col("g").as("gb"), col("ds").as("dsb")),
          Seq("band", "sig"))
        .filter(col("ga") <= col("gb"))
        .select(col("ga"), col("gb"), explode(col("dsa")).as("a"), col("dsb"))
        .select(col("ga"), col("gb"), col("a"), explode(col("dsb")).as("b"))
        .filter(col("ga") < col("gb") || col("a") < col("b"))
        .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      smallPairs.union(bigPairs).distinct()
    }
    // exact verify (kept as the two-join shape: a measured A/B of the
    // single-join explode-regroup alternative ran 1.4x slower unhinted —
    // the max-over-array regroup is a SortAggregate — and 4x slower with a
    // broadcast-pinned candidate side, so the classic broadcast-candidates
    // double join stays)
    val sets = docs.select(col("doc"), col("sh"))
    candidates
      .join(sets.withColumnRenamed("doc", "a").withColumnRenamed("sh", "sha"), Seq("a"))
      .join(sets.withColumnRenamed("doc", "b").withColumnRenamed("sh", "shb"), Seq("b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Rounds the most recent [[dedupClusters]] call took to converge (bench /
    * diagnostics introspection, same pattern as NimbleSource.chunksSkipped). */
  val lastClusterRounds = new java.util.concurrent.atomic.AtomicInteger()

  /** Candidate-set count JOBS the most recent [[dedupClusters]] call ran.
    * r18: always 0 — the broadcast gate now runs off a provable per-round
    * bound (frontier degree-sum + frontier size, folded into the fixpoint
    * aggregate) instead of measuring the candidate set; the field stays so
    * CcProbe / OpsSpec pin the no-count-job contract. */
  val lastCandCountJobs = new java.util.concurrent.atomic.AtomicInteger()

  /** Per-round broadcast decisions of the most recent [[dedupClusters]]
    * call (true = the neighbor/self candidate set was broadcast). OpsSpec
    * reads it to prove a late-changing hub forces the shuffle path mid-run
    * while the surrounding small rounds stay broadcast. */
  @volatile var lastCandBroadcasts: Seq[Boolean] = Nil

  /** Rounds of the most recent [[dedupClusters]] call that ran as
    * delta-OVERLAY rounds (driver-side patch over the persisted base frame,
    * zero full-frame persists) / overlay rounds that had to BAIL back to the
    * dense machinery mid-round (pointer-in-degree past the driver budget).
    * Diagnostics, same pattern as [[lastClusterRounds]]. */
  val lastOverlayRounds = new java.util.concurrent.atomic.AtomicInteger()
  val lastOverlayBails = new java.util.concurrent.atomic.AtomicInteger()

  /** Connected-components dedup clustering — the canonicalization step after
    * near-dup pair generation: every document labels with the SMALLEST doc
    * id reachable through the pair graph (so one canonical representative
    * per duplicate cluster); documents in no pair label themselves.
    *
    * Iterative min-label propagation: each round is one shuffle join
    * (labels re-keyed by neighbor) + a map-side-combining min aggregate,
    * rounds bounded by component diameter — near-dup clusters are shallow
    * (a handful of hops), so convergence lands in a few rounds even at
    * 100 TB; the only driver-side state is the changed-label counter that
    * detects the fixpoint (same contract as GraphX/GraphFrames CC). Labels
    * persist per round and unpersist as soon as the next round materializes,
    * so lineage never re-computes earlier rounds. */
  def dedupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
      maxIters: Int = 25, broadcastMaxRows: Long = 2000000L): DataFrame = {
    // id-type-generic (string doc ids work like every other Dedup op):
    // labels compare with least()/min(), which order strings binary-wise
    val e0 = pairs.select(col("a").as("u"), col("b").as("v"))
    // r20: restrict edges to endpoints that EXIST in docs before anything
    // aggregates over them. Pre-r19 stray pair ids were silently ignored
    // (every candidate inner-joined against the docs-derived label frame);
    // the r19 round-0 fast path folded min-neighbor into the init aggregate,
    // where a non-doc id could become a cluster's canonical label — and
    // dedupApply's drop set (members with id != cluster min) would then
    // delete EVERY member of that cluster. Filtering both endpoints also
    // keeps the broadcast bound exact: deg(v) counts precisely the rows the
    // neighbor join emits per frontier node, with no one-sided stray edges.
    val idsOnly = docs.select(col(idCol))
    // r21 OPT (guide §2.3/§2.4): build the symmetric edge frame with HALF the
    // shuffled volume of the old union-then-distinct shape. Normalizing each
    // pair to (min, max) first means the distinct dedupes 1x|E| rows instead
    // of the 2x|E| symmetric frame (and catches (a,b)/(b,a) input twins in
    // one pass); the two stray-endpoint semi-joins then run once over the
    // deduped frame; and the reversal is a narrow explode over that result —
    // the old `e.union(e.reversed)` re-evaluated e's whole lineage (both
    // semi-joins) a second time. Self-loops are dropped up front: an (x, x)
    // edge can never change a min-label, and dropping it keeps deg(x) equal
    // to exactly the rows the neighbor join emits for x. Null endpoints die
    // in the normalize filter just as they died in the semi-joins before
    // (null join keys never match). The resulting symmetric edge SET is
    // identical to the old build's minus self-loops.
    val eNorm = e0.filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .join(idsOnly.select(col(idCol).as("u")), Seq("u"), "left_semi")
      .join(idsOnly.select(col(idCol).as("v")), Seq("v"), "left_semi")
      .select(col("u"), col("v"))
    val edges = eNorm.select(explode(array(
        struct(col("u"), col("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .persist()
    // r18 (r17 verdict #2): per-node edge degree rides the label frame from
    // init on, so every round's fixpoint aggregate yields the NEXT frontier's
    // degree-sum for free — the broadcast gate below becomes a provable
    // bound with zero count jobs (was: measure-then-arm hysteresis with a
    // ≤4-round uncounted window)
    // r19: `nbrMin` rides the same aggregate — on round 0's identity labels
    // the min over neighbor LABELS is just the min over neighbor IDS, so the
    // whole first round collapses to a projection over this init frame (see
    // the round-0 fast path below) instead of three corpus-sized self-joins
    val degrees = edges.groupBy("u")
      .agg(count(lit(1)).as("deg"), min("v").as("nbrMin"))
    var labels = docs.select(col(idCol).as("u"), col(idCol).as("lbl"))
      .join(degrees, Seq("u"), "left")
      .select(col("u"), col("lbl"), coalesce(col("deg"), lit(0L)).as("deg"),
        col("nbrMin"))
    // the frame actually persisted each round (unpersist must target the
    // EXACT cached plan — a projection on top would silently miss the cache).
    // null until round 0 lands: the init frame is read exactly once, by the
    // round-0 projection, so caching it would be a wasted full-frame write.
    var labelsCache: DataFrame = null
    var changed = 1L
    var iter = 0
    // r15: DELTA iteration (the Flink/Giraph CC shape). After the first
    // round only a shrinking frontier still changes — in the bench shape
    // ~1M two-node clusters converge in one round and the 1,000-hop chain
    // alone drives rounds 2..11 — yet the dense loop kept re-shuffling the
    // FULL label frame three times per round. A row's label can change in
    // round t only if (a) a NEIGHBOR's label changed in round t-1, or (b)
    // its POINTER TARGET's label changed in round t-1 (lbl(u) in delta) —
    // so candidates come from two delta-sized joins, and the full-frame
    // update is one left join against the (broadcast-small) candidate set.
    // Pointer jumping survives: a chain node's parent changes every round
    // until convergence, so case (b) keeps every still-converging node
    // re-jumping and path lengths keep halving. Convergence (empty delta)
    // is a true fixpoint: any row still able to decrease via neighbor v
    // would have re-evaluated in the round after v last changed.
    var delta: DataFrame = null // null = round 1 evaluates everything
    // the NEXT frontier's edge-degree sum, measured by the same aggregate
    // that detects the fixpoint (zero extra jobs) — the provable broadcast
    // bound below
    var frontierDegSum = 0L
    val bcastLog = scala.collection.mutable.ArrayBuffer[Boolean]()
    lastCandCountJobs.set(0)
    lastOverlayRounds.set(0)
    lastOverlayBails.set(0)

    // ---- r22 OPT: delta-OVERLAY tail rounds (guide §2.4/§5). Once the
    // frontier is driver-small, a round's full-frame rebuild + re-persist
    // touches ~|labels| rows to patch ~|frontier| of them (bench shape:
    // rounds 1-3 each re-persisted the 2M-row cache to patch ~1K rows; at
    // 100 TB a full-frame pass per round). Instead, tail rounds keep the
    // last persisted frame as an immutable BASE and accumulate changes in a
    // driver-side overlay map, applying the IDENTICAL per-round update rule
    // (min over changed-neighbor labels, self re-jump through the pointer
    // target, pointer-jump for rows whose target changed) with three
    // delta-sized jobs against the cached base/edges — no shuffle, no
    // persist. Every driver structure is bounded BEFORE it is built:
    //  - frontier rows = `changed` and candidate rows = frontierDegSum +
    //    changed, both from the previous round's aggregate (the r18
    //    provable-bound contract, zero count jobs);
    //  - the one bound with no pre-folded witness — pointer IN-degree of
    //    the frontier (the r18 hub hole) — is probed with a LIMIT job and
    //    the round BAILS to the dense machinery when it overflows, before
    //    any driver state mutates.
    // The overlay folds back into a real frame (one broadcast join over the
    // cached base) on bail or at convergence. Labels, round count and every
    // broadcast decision are bit-identical to the dense path by
    // construction.
    val ovGate = math.min(65536L, broadcastMaxRows)
    val ov = scala.collection.mutable.LinkedHashMap.empty[Any, (Any, Long)]
    var ovFrontier = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
    var ovMode = false
    // Spark's binary string ordering (UTF8String), not Java's UTF-16 order
    def ltAny(a: Any, b: Any): Boolean = (a, b) match {
      case (x: String, y: String) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(x)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)) < 0
      case (x: java.lang.Long, y: java.lang.Long) => x.longValue() < y.longValue()
      case (x: java.lang.Integer, y: java.lang.Integer) => x.intValue() < y.intValue()
      case (x: Comparable[Any] @unchecked, _) => x.compareTo(b) < 0
      case _ => throw new IllegalArgumentException(
        s"dedupClusters: unorderable id type ${a.getClass}")
    }
    def mkDF(rows: Seq[org.apache.spark.sql.Row],
        schema: org.apache.spark.sql.types.StructType): DataFrame = {
      val l = new java.util.ArrayList[org.apache.spark.sql.Row](rows.length)
      rows.foreach(l.add)
      docs.sparkSession.createDataFrame(l, schema)
    }
    def ulSchema = org.apache.spark.sql.types.StructType(
      Seq(labels.schema("u"), labels.schema("lbl")))
    // base + overlay as one logical frame: a single broadcast-join pass over
    // the cached base, built lazily on bail / at convergence
    def overlayFrame(): DataFrame = {
      val ovDF = mkDF(ov.toSeq.map { case (u, (l, _)) =>
        org.apache.spark.sql.Row(u, l) }, ulSchema)
        .withColumnRenamed("lbl", "olbl")
      labels.join(broadcast(ovDF), Seq("u"), "left")
        .select(col("u"), coalesce(col("olbl"), col("lbl")).as("lbl"), col("deg"))
    }
    // one overlay round over frontier `f` (u -> current lbl, all present in
    // cur-resolution). Some(patch) with (u, newLbl, deg) rows, or None when
    // the pointer-in-degree probe overflows (nothing mutated).
    def overlayRound(f: scala.collection.mutable.LinkedHashMap[Any, Any])
        : Option[Seq[(Any, Any, Long)]] = {
      // path compression (identical to the dense branch's: the frontier map
      // is a functional graph with lbl < u strictly, so walks terminate)
      val comp = new scala.collection.mutable.HashMap[Any, Any]()
      val path = new scala.collection.mutable.ArrayBuffer[Any]()
      f.keysIterator.foreach { k =>
        var x: Any = f(k)
        path.clear(); path += k
        var steps = 0
        while (f.contains(x) && !comp.contains(x)) {
          path += x; x = f(x); steps += 1
          require(steps <= f.size, "dedupClusters: cycle in label map?!")
        }
        val root = comp.getOrElse(x, x)
        path.foreach(p => comp.put(p, root))
      }
      val fIds = f.keySet
      // (a) neighbor candidates: edges into the frontier — exactly
      // frontierDegSum rows, bounded by the entry gate
      val fDF = mkDF(comp.toSeq.map { case (u, l) =>
        org.apache.spark.sql.Row(u, l) }, ulSchema)
      val nbrRows = edges
        .join(broadcast(fDF.select(col("u").as("v"), col("lbl").as("nl"))), Seq("v"))
        .select(col("u"), col("nl")).collect()
      // (b) pointer-jump in-edges: rows whose CURRENT label is a frontier
      // node id. Overlay rows resolve driver-side; base rows come from a
      // LIMIT-probed scan (current label = base label exactly when u is not
      // overlaid). Overflow -> bail before any state mutates.
      val tDF = mkDF(fIds.toSeq.map(org.apache.spark.sql.Row(_)),
        org.apache.spark.sql.types.StructType(Seq(labels.schema("lbl"))))
      val inPtrRaw = labels.join(broadcast(tDF), Seq("lbl"))
        .select(col("u"), col("lbl"), col("deg"))
        .limit(ovGate.toInt + 1).collect()
      // overflow check BEFORE dropping overlaid rows: past the limit there
      // may be arbitrarily many more in-pointers the probe never saw
      if (inPtrRaw.length > ovGate) return None
      val inPtrBase = inPtrRaw.filterNot(r => ov.contains(r.get(0)))
      val inPtrOv = ov.iterator
        .filter { case (_, (l, _)) => fIds.contains(l) }
        .map { case (u, (l, d)) => (u, l, d) }.toSeq
      // (c) batched base lookups for every key the round needs a current
      // label/degree for and the overlay does not cover
      val selfTargets = f.keysIterator.map(comp(_)).toSet
      val lookKeys = (nbrRows.iterator.map(_.get(0)) ++
        f.keysIterator ++ selfTargets.iterator)
        .filterNot(ov.contains).toSet
      val lookups = new scala.collection.mutable.HashMap[Any, (Any, Long)]()
      if (lookKeys.nonEmpty) {
        val kDF = mkDF(lookKeys.toSeq.map(org.apache.spark.sql.Row(_)),
          org.apache.spark.sql.types.StructType(Seq(labels.schema("u"))))
        labels.join(broadcast(kDF), Seq("u"))
          .select(col("u"), col("lbl"), col("deg")).collect()
          .foreach(r => lookups.put(r.get(0), (r.get(1), r.getLong(2))))
      }
      inPtrBase.foreach(r => lookups.put(r.get(0), (r.get(1), r.getLong(2))))
      def cur(u: Any): (Any, Long) = ov.getOrElse(u, lookups(u))
      // min-merge all three candidate sources, then patch strictly-smaller
      val cand = new scala.collection.mutable.HashMap[Any, Any]()
      def offer(u: Any, c: Any): Unit = cand.get(u) match {
        case Some(old) => if (ltAny(c, old)) cand.put(u, c)
        case None => cand.put(u, c)
      }
      nbrRows.foreach(r => offer(r.get(0), r.get(1)))
      f.keysIterator.foreach(u => offer(u, cur(comp(u))._1))
      inPtrBase.foreach(r => offer(r.get(0), comp(r.get(1))))
      inPtrOv.foreach { case (u, l, _) => offer(u, comp(l)) }
      val patch = Vector.newBuilder[(Any, Any, Long)]
      cand.foreach { case (u, c) =>
        val (cl, cd) = cur(u)
        if (ltAny(c, cl)) patch += ((u, c, cd))
      }
      Some(patch.result())
    }

    while (changed > 0 && iter < maxIters) {
      val roundT0 = System.nanoTime()
      // overlay eligibility: every driver structure bounded up front
      val overlayEligible = delta != null && changed <= ovGate &&
        frontierDegSum + changed <= ovGate && ov.size + changed <= 4 * ovGate
      if (overlayEligible) {
        if (!ovMode) {
          // entering overlay: collect the dense delta as the first frontier
          // (bounded by `changed` <= ovGate, the same bound the dense path's
          // compression collect uses)
          ovFrontier = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
          delta.collect().foreach(r => ovFrontier.put(r.get(0), r.get(1)))
          ovMode = true
        }
        overlayRound(ovFrontier) match {
          case Some(patch) =>
            bcastLog += true // candidate set driver-bounded, no shuffle
            patch.foreach { case (u, l, d) => ov.put(u, (l, d)) }
            changed = patch.length.toLong
            frontierDegSum = patch.iterator.map(_._3).sum
            ovFrontier = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
            patch.foreach { case (u, l, _) => ovFrontier.put(u, l) }
            lastOverlayRounds.incrementAndGet()
            if (sys.env.contains("GRAFT_CC_DEBUG"))
              println(f"CC round=$iter changed=$changed degSum=$frontierDegSum " +
                f"wall=${(System.nanoTime() - roundT0) / 1e9}%.3f s overlay")
            iter += 1
          case None =>
            // pointer-in-degree overflow: fold the overlay back into a real
            // frame and run THIS round on the dense machinery
            lastOverlayBails.incrementAndGet()
            if (ov.nonEmpty) {
              labels = overlayFrame()
              delta = mkDF(ovFrontier.toSeq.map { case (u, l) =>
                org.apache.spark.sql.Row(u, l) }, ulSchema)
              ov.clear()
            }
            ovMode = false
            denseRound(roundT0)
        }
      } else {
        if (ovMode) {
          // frontier/overlay outgrew the driver bounds: materialize and
          // hand back to the dense machinery
          if (ov.nonEmpty) {
            labels = overlayFrame()
            delta = mkDF(ovFrontier.toSeq.map { case (u, l) =>
              org.apache.spark.sql.Row(u, l) }, ulSchema)
            ov.clear()
          }
          ovMode = false
        }
        denseRound(roundT0)
      }
    }

    def denseRound(roundT0: Long): Unit = {
      val next = if (delta == null) {
        // ---- round 0 fast path (r19): on identity labels every candidate
        // source is degenerate — lbl(v) = v makes the neighbor join the edge
        // list itself (its per-node min is `nbrMin`, pre-folded into the init
        // aggregate), and both the pointer jump and the self re-jump resolve
        // to label-of(u) = u, provable no-ops. What the general path would
        // compute with three corpus-sized self-joins and a 2|E|-row
        // aggregate is exactly this projection — at 100 TB, round 0 is the
        // largest round, and this removes its full-frame shuffles entirely.
        bcastLog += false // no candidate set was broadcast (none was built)
        labels.select(col("u"),
          least(col("lbl"), coalesce(col("nbrMin"), col("lbl"))).as("lbl"),
          col("lbl").as("prev"), col("deg"))
      } else {
      // r19: when the frontier is small enough to broadcast ANYWAY (so its
      // driver materialization is already paid for and bounded by `changed`,
      // exact), PATH-COMPRESS it first: the frontier's (u -> lbl) map is a
      // functional graph with lbl < u strictly (labels only decrease from
      // identity), so following it to each chain's exit is acyclic — every
      // frontier label jumps over ALL frontier-internal hops in one round.
      // Every downstream consumer (neighbor candidates, the full-frame
      // re-jump, the pointer-jump side) then hands out the compressed label,
      // which collapses the converging tail: a D-hop chain's interior
      // resolves in O(1) rounds once the whole chain is in the frontier,
      // instead of log(D) rounds of pairwise jump doubling. Soundness: the
      // compressed value is still a same-component node id and only
      // decreases; the row count and schema are unchanged, so every bound
      // below (changed, degree-sum) holds verbatim.
      // gate on min(64K, broadcastMaxRows): the driver materialization is
      // justified as "already paid for by the broadcast", so compression
      // must only fire when the frontier genuinely IS broadcast-bound —
      // with a caller cap below 64K the raw 65536 gate would collect a
      // frontier the join side never broadcasts (r19 ADVICE)
      val frontier =
        if (changed <= math.min(65536L, broadcastMaxRows)) {
          val m = new scala.collection.mutable.HashMap[Any, Any]()
          delta.collect().foreach(r => m.put(r.get(0), r.get(1)))
          val comp = new scala.collection.mutable.HashMap[Any, Any]()
          val path = new scala.collection.mutable.ArrayBuffer[Any]()
          m.keysIterator.foreach { k =>
            var x: Any = m(k)
            path.clear(); path += k
            var steps = 0
            while (m.contains(x) && !comp.contains(x)) {
              path += x; x = m(x); steps += 1
              // labels strictly decrease along the walk, so a cycle is
              // impossible; a step count past the map size means corrupted
              // labels — fail loudly rather than hang the driver
              require(steps <= m.size, "dedupClusters: cycle in label map?!")
            }
            val root = comp.getOrElse(x, x)
            path.foreach(p => comp.put(p, root))
          }
          val schema = delta.schema
          val rows = new java.util.ArrayList[org.apache.spark.sql.Row](m.size)
          m.keysIterator.foreach { k =>
            rows.add(org.apache.spark.sql.Row(k, comp(k)))
          }
          docs.sparkSession.createDataFrame(rows, schema)
        } else delta
      // broadcast the delta side once it is small: the candidate joins then
      // run map-side — no full-frame shuffle. `changed` is EXACTLY the
      // frontier's row count, so this hint is bounded by construction.
      def small(df: DataFrame): DataFrame =
        if (changed <= broadcastMaxRows) broadcast(df) else df
      // (a) min over CHANGED neighbors' labels ...
      val nbrCand = edges
        .join(small(frontier.select(col("u").as("v"), col("lbl").as("nl"))), Seq("v"))
        .select(col("u"), col("nl").as("c"))
      // (c) rows that THEMSELVES changed re-jump through their current
      // pointer against the FULL label frame (label-of-label): without this
      // a node whose target converged rounds ago would creep one hop per
      // round — (b) alone decays the doubling into a linear tail once the
      // wavefront of converged nodes leaves the frontier. With (c), path
      // lengths keep halving for every still-active row, so a 2^25-hop
      // chain converges inside the default cap.
      val selfJump = small(frontier)
        .join(labels.select(col("u").as("lbl"), col("lbl").as("sj")), Seq("lbl"))
        .select(col("u"), col("sj").as("c"))
      val candNS = nbrCand.union(selfJump).groupBy("u").agg(min("c").as("cm"))
      // r18 (r17 verdict #2, closes the r15 ADVICE hole for good): the
      // broadcast gate is now a PROVABLE bound, not a measured-then-trusted
      // count. candNS's pre-aggregation row count is exactly
      //   Σ_{v∈frontier} degree(v)   (nbrCand: each frontier node emits one
      //                               row per neighbor)
      // + |frontier|                 (selfJump: one row per frontier node —
      //                               labels has exactly one row per u, so
      //                               the frontier-to-labels join is 1:1)
      // and both terms come from the previous round's fixpoint aggregate
      // (frontierDegSum, changed) at zero extra jobs — so a high-degree hub
      // entering the frontier in ANY round, armed window or not, flips the
      // decision to the shuffle path BEFORE anything is built on the driver.
      // The old design's second hole (a node with huge pointer IN-degree —
      // millions of rows pointing at one converging target, invisible to
      // edge degree) is closed structurally: the pointer-jump update no
      // longer routes through the broadcast candidate set at all. It joins
      // the full label frame against the FRONTIER (size = `changed`,
      // exact), so the potentially-huge set of re-pointed rows is a
      // streamed join OUTPUT, never a driver-side build.
      val candBroadcastable = changed <= broadcastMaxRows &&
        frontierDegSum + changed <= broadcastMaxRows
      bcastLog += candBroadcastable
      val cand = if (candBroadcastable) broadcast(candNS) else candNS
      // pointer-jump side of the update: rows whose pointer TARGET is in the
      // frontier take its new label (join key = frontier node id)
      val frontierPtr = small(frontier.select(col("u").as("lbl"), col("lbl").as("pl")))
      labels.join(frontierPtr, Seq("lbl"), "left")
        .join(cand, Seq("u"), "left")
        .select(col("u"),
          least(col("lbl"), coalesce(col("pl"), col("lbl")),
            coalesce(col("cm"), col("lbl"))).as("lbl"),
          col("lbl").as("prev"), col("deg"))
      }
      // Cut the SQL plan: persist() truncates *execution* but not the
      // *logical plan* — each round's `next` references `labels` in three
      // joins, so the plan tree grows ~4^k and deep chains OOM the driver
      // just rendering AQE explain strings. Rebuilding the frame from the
      // (to-be-persisted) RDD makes the plan a LogicalRDD leaf; the RDD
      // lineage underneath stays recomputable if cached blocks are lost
      // (unlike localCheckpoint, whose blocks die with decommissioned
      // executors). The changed-count below runs over `cut`, so one job
      // both materializes the new round's cache and detects the fixpoint —
      // `prev` rides along precisely so this check is a narrow filter over
      // the cache, not another shuffle join against the old labels.
      // r15: cut at the InternalRow level (public on the classic session in
      // Spark 4) — `next.rdd` would bounce every row through the Row encoder
      // both ways, a per-round 2x row-conversion tax pointer jumping never
      // needs; the columnar cache build copies rows, so UnsafeRow reuse in
      // the underlying scan stays safe
      val cut = org.apache.spark.sql.GraftShims
        .internalCreateDataFrame(docs.sparkSession, next.queryExecution.toRdd, next.schema)
        .persist()
      // one job materializes the cache, detects the fixpoint, AND measures
      // the next frontier's degree-sum for the broadcast bound above
      val fix = cut.agg(
        count(when(col("lbl") < col("prev"), 1)).as("n"),
        sum(when(col("lbl") < col("prev"), col("deg")).otherwise(lit(0L))).as("ds"))
        .collect()(0)
      changed = fix.getLong(0)
      frontierDegSum = if (fix.isNullAt(1)) 0L else fix.getLong(1)
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(f"CC round=$iter changed=$changed degSum=$frontierDegSum " +
          f"wall=${(System.nanoTime() - roundT0) / 1e9}%.3f s")
      // safe: cut is materialized, no recompute through it (null on round 0 —
      // the init frame was never cached)
      if (labelsCache != null) labelsCache.unpersist()
      labelsCache = cut
      labels = cut.select(col("u"), col("lbl"), col("deg"))
      // next round's frontier: a cheap filter over the round's own cache
      delta = cut.filter(col("lbl") < col("prev")).select(col("u"), col("lbl"))
      iter += 1
    }
    require(changed == 0,
      s"dedupClusters: not converged after $maxIters rounds — component diameter " +
        s"exceeds 2^$maxIters?! raise maxIters (a silent cut would mislabel clusters)")
    // converged while in overlay mode: fold the accumulated patch back over
    // the persisted base in ONE broadcast-join pass (the per-round full-frame
    // rebuilds this replaces)
    if (ovMode && ov.nonEmpty) labels = overlayFrame()
    lastClusterRounds.set(iter)
    lastCandBroadcasts = bcastLog.toList
    edges.unpersist()
    // hand back a persisted, caller-unpersistable result (localCheckpoint
    // blocks are non-recomputable and die with decommissioned executors —
    // wrong default under dynamic allocation); losing these cached blocks
    // merely recomputes through lineage, which stays correct
    val out = labels.select(col("u").as(idCol), col("lbl").as("cluster")).persist()
    out.count()
    labelsCache.unpersist()
    out
  }

  /** End-to-end dedup application — the step after clustering: keep exactly
    * one canonical document (the cluster-minimum id) per near-duplicate
    * cluster; singletons survive by self-labeling. Formulated as an
    * anti-join against the DROP set (cluster members whose id is not the
    * cluster minimum) rather than a semi-join against survivors: the
    * survivor set is corpus-sized, but the drop set is only the duplicate
    * docs minus one per cluster — small at any realistic dup rate, so
    * Spark broadcasts it and the corpus never shuffles. Null-id docs
    * survive by construction (a null id never matches the drop set): a doc
    * that cannot be identified cannot be proven a duplicate, so it is
    * never silently deleted. The drop set is persisted and counted (NOT
    * localCheckpoint: those blocks die with decommissioned executors and
    * have no lineage fallback — wrong under dynamic allocation), so the
    * big `clusters` label cache can be released here; losing the small
    * drop-set blocks later merely recomputes through lineage. */
  def dedupApply(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val clusters = dedupClusters(docs, idCol, pairs)
    val drop = clusters.filter(col(idCol) =!= col("cluster")).select(idCol).persist()
    drop.count() // materialize before releasing the clusters cache underneath
    clusters.unpersist()
    docs.join(drop, Seq(idCol), "left_anti")
  }

  /** 32-bit SimHash signature per document: per-token md5-derived 32-bit
    * hash; each bit votes +1/-1 weighted by token frequency; signature bit i
    * set iff the vote sum is positive. Uses the native single-pass
    * [[graft.functions.SimHash32]] expression (no 32-way explode). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.SimHash32.register(df.sparkSession)
    df.select(col(idCol).as("doc"),
      call_function("graft_simhash32", col(textCol)).as("simhash"))
  }

  /** Composed-operator SimHash (explode + bit votes) — same semantics as
    * [[simhash]]; kept as the cross-validation reference implementation. */
  def simhashViaExplode(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc"), explode(words(col(textCol))).as("t"))
      .withColumn("h", hash32(col("t")))
    val bits = toks.select(col("doc"), col("h"),
      explode(sequence(lit(0), lit(31))).as("bit"))
      .withColumn("vote", expr("CASE WHEN (shiftright(h, bit) & 1) = 1 THEN 1 ELSE -1 END"))
      .groupBy("doc", "bit")
      .agg(sum(col("vote")).as("v"))
    bits.groupBy("doc")
      .agg(sum(expr("CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), bit) ELSE CAST(0 AS BIGINT) END")).as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance <= maxDist — EXACT banded
    * join, no cartesian product.
    *
    * Pigeonhole: split the 32-bit signature into (maxDist+1) bit bands; any
    * pair at Hamming distance <= maxDist has all its differing bits inside at
    * most maxDist bands, so at least one band matches bit-exactly. Candidates
    * come from an equi-join on (band index, band bits) — linear in bucket
    * sizes, hash-partitioned, no driver state — then `bit_count(xor)`
    * verifies the true distance. Identical output to the all-pairs form
    * ([[simhashPairsAllPairs]], kept as the spec cross-check) by
    * construction; recall 1.0 is guaranteed, not probabilistic. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxDist: Int = 3): DataFrame = {
    val sig = simhash(df, idCol, textCol)
    val nBands = maxDist + 1
    val bounds = (0 to nBands).map(i => i * 32 / nBands)
    val bandCols = (0 until nBands).map { i =>
      val start = bounds(i)
      val width = bounds(i + 1) - start
      struct(lit(i).as("band"),
        shiftright(col("simhash"), start).bitwiseAND(lit((1L << width) - 1)).as("bits"))
    }
    val banded = sig.select(col("doc"), col("simhash"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc"), col("simhash"), col("bb.band").as("band"), col("bb.bits").as("bits"))
    val a = banded.select(col("band"), col("bits"), col("doc").as("a"), col("simhash").as("ha"))
    val b = banded.select(col("band"), col("bits"), col("doc").as("b"), col("simhash").as("hb"))
    a.join(b, Seq("band", "bits"))
      .filter(col("a") < col("b"))
      .withColumn("dist", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("dist") <= maxDist)
      // a pair can collide in several bands — dedupe (dist is functional in (a,b))
      .select("a", "b", "dist").distinct()
  }

  /** All-pairs reference form of [[simhashPairs]] (cross-validation only —
    * O(n^2) through one join, never the production path). */
  def simhashPairsAllPairs(df: DataFrame, idCol: String, textCol: String, maxDist: Int = 3): DataFrame = {
    val sig = simhash(df, idCol, textCol)
    val a = sig.select(col("doc").as("a"), col("simhash").as("ha"))
    val b = sig.select(col("doc").as("b"), col("simhash").as("hb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .withColumn("dist", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("dist") <= maxDist)
      .select("a", "b", "dist")
  }

  // ------------------------------------------------------- streaming dedup

  /** The shared text fingerprint (md5 of whitespace-normalized lower-cased
    * text — same normalization as [[fingerprintGroups]], so batch and
    * streaming dedup agree on what "duplicate" means). */
  def fingerprint(text: Column): Column = md5(regexp_replace(lower(text), "\\s+", " "))

  /** Streaming exact dedup for a continuous ingest pipeline: drops any
    * document whose fingerprint was already seen within the watermark
    * horizon. Rides Spark's `dropDuplicatesWithinWatermark`, whose state
    * store keeps one entry per distinct live fingerprint and evicts entries
    * older than the watermark — bounded state at any stream length, exactly
    * the semantics a 100 TB rolling crawl needs (a duplicate arriving later
    * than `watermarkDelay` after the original is the caller's declared
    * staleness bound, not silent data loss). `timeCol` must be a timestamp
    * column (the event time the watermark advances on). */
  def streamingDedup(stream: DataFrame, textCol: String, timeCol: String,
      watermarkDelay: String): DataFrame =
    stream
      .withColumn("_fp", fingerprint(col(textCol)))
      .withWatermark(timeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  /** Row-preserving streaming dedup: every document flows through, annotated
    * with `is_duplicate` and the `keeper` id it duplicates (the first-seen
    * doc of its fingerprint) — the router shape (quarantine duplicates,
    * pass originals, keep full provenance) that the dropping variant cannot
    * express. Custom state via `flatMapGroupsWithState`: one
    * (fingerprint -> first id) entry per live fingerprint, expired by
    * event-time timeout once the watermark passes lastSeen + `ttl`, so
    * state is bounded by the distinct-fingerprint rate within the TTL
    * window, not stream length. Within a micro-batch, rows of one
    * fingerprint are ordered by (event time, id) so the keeper is
    * deterministic under replay. Output columns: `idCol`, `is_duplicate`,
    * `keeper`. */
  def streamingDedupAnnotate(stream: DataFrame, idCol: String, textCol: String,
      timeCol: String, watermarkDelay: String, ttl: java.time.Duration): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val ttlMs = ttl.toMillis
    require(ttlMs > 0, "ttl must be positive")
    // watermark AFTER the projection: an alias-of-cast drops the event-time
    // metadata, so tagging timeCol earlier would not survive the select
    val prepared = stream
      .select(fingerprint(col(textCol)).as("_1"), col(idCol).cast("long").as("_2"),
        col(timeCol).cast("timestamp").as("_3"))
      .withWatermark("_3", watermarkDelay)
      .as[(String, Long, java.sql.Timestamp)]
    prepared.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Boolean, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[(String, Long, java.sql.Timestamp)],
            state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // deterministic in-batch order: first by event time, then id
            val batch = rows.toArray.sortBy(r => (r._3.getTime, r._2))
            val hadState = state.exists
            val keeper = if (hadState) state.get._1 else batch.head._2
            val lastSeen = math.max(batch.map(_._3.getTime).max,
              if (hadState) state.get._2 else Long.MinValue)
            state.update((keeper, lastSeen))
            // timeout must exceed the current watermark; a group fed only
            // late data still gets a valid (immediate-next-batch) expiry
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs + 1, lastSeen + ttlMs))
            batch.iterator.zipWithIndex.map { case ((_, id, _), i) =>
              (id, hadState || i > 0, keeper)
            }
          }
      }
      .toDF(idCol, "is_duplicate", "keeper")
  }
}
