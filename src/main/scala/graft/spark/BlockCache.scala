package graft.spark

/** Executor-local stream-block cache (AsyncDataCache analog — reference:
  * docs/develop/velox_cache_and_nimble_datapath.rst: Velox's block cache
  * fronts Nimble's stream loads so repeated queries over the same files
  * serve decode input from memory).
  *
  * Bounded LRU of stream byte ranges keyed (file, mtime, length, stripe,
  * stream key); the footer cache already follows the same mtime-invalidation
  * pattern, and length rides in the key as a second overwrite guard for
  * coarse-mtime filesystems. Entries are immutable byte arrays (ChunkCursor
  * never mutates its input), so tasks share them freely.
  *
  * Capacity comes from `spark.graft.scan.blockCacheBytes` (default 256 MB,
  * 0 disables); a single block larger than 1/8 of capacity is never cached
  * so one giant stream cannot evict the whole working set. At 100 TB the
  * win is interactive/repeated workloads on remote storage: stripe i's
  * stream bytes survive across tasks AND across queries in the same
  * executor, where the one-ahead prefetch only overlaps within a task.
  */
object BlockCache {
  final case class Key(file: String, mtime: Long, length: Long, stripe: Int, stream: String)

  val hits = new java.util.concurrent.atomic.AtomicLong()
  val misses = new java.util.concurrent.atomic.AtomicLong()

  @volatile private var capacity: Long = -1L
  private def cap: Long = {
    if (capacity < 0) capacity = confLong("spark.graft.scan.blockCacheBytes", 256L << 20)
    capacity
  }
  def enabled: Boolean = cap > 0

  /** Read a spark.graft.* setting where this JVM can see it: the session
    * conf on the driver / local mode, SparkEnv's SparkConf on cluster-mode
    * executors (so --conf-set values — including 0 = disable — are honored
    * there too), default otherwise. */
  private[spark] def confLongPub(key: String, dflt: Long): Long = confLong(key, dflt)

  private def confLong(key: String, dflt: Long): Long = {
    try return org.apache.spark.sql.SparkSession.active.conf.get(key, dflt.toString).toLong
    catch { case _: Throwable => () }
    try {
      val env = org.apache.spark.SparkEnv.get
      if (env != null) return env.conf.get(key, dflt.toString).toLong
    } catch { case _: Throwable => () }
    dflt
  }

  private var totalBytes = 0L
  private val lru = new java.util.LinkedHashMap[Key, Array[Byte]](256, 0.75f, true)

  // ---- file-status amortization: cache keys need (mtime, length), which
  // costs a getFileStatus RPC per stripe fetch on remote stores. The default
  // keeps every status fresh (zero staleness; a local stat is ~1us); remote
  // deployments set spark.graft.scan.statusTtlMs to amortize, accepting up
  // to that many ms of overwrite-invalidation delay.
  @volatile private var statusTtl: Long = -1L
  private def ttlMs: Long = {
    if (statusTtl < 0) statusTtl = confLong("spark.graft.scan.statusTtlMs", 0L)
    statusTtl
  }
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, graft.format.GraftIO.FileMeta)]()

  def metaOf(path: String): graft.format.GraftIO.FileMeta = {
    if (ttlMs <= 0) return graft.format.GraftIO.status(path)
    val now = System.nanoTime() / 1000000L
    val hit = metaCache.get(path)
    if (hit != null && now - hit._1 <= ttlMs) hit._2
    else {
      val m = graft.format.GraftIO.status(path)
      // bound the path universe: a long-lived executor streaming over
      // millions of files must not accumulate entries forever — by the time
      // the map is this big every entry is almost surely TTL-stale anyway
      if (metaCache.size() >= 65536) metaCache.clear()
      metaCache.put(path, (now, m))
      m
    }
  }

  def getOrLoad(key: Key)(load: => Array[Byte]): Array[Byte] = {
    lru.synchronized {
      val hit = lru.get(key)
      if (hit != null) { hits.incrementAndGet(); return hit }
    }
    misses.incrementAndGet()
    val bytes = load // outside the lock: concurrent duplicate loads beat a stalled cache
    insert(key, bytes)
    bytes
  }

  /** Cache probe WITHOUT loading — the IO-coalescing read path splits its
    * stream set into cached / to-fetch before issuing merged range reads. */
  def peek(key: Key): Array[Byte] = lru.synchronized {
    val hit = lru.get(key)
    if (hit != null) hits.incrementAndGet()
    hit
  }

  /** Insert bytes fetched externally (a slice of a coalesced range read). */
  def put(key: Key, bytes: Array[Byte]): Unit = {
    misses.incrementAndGet()
    insert(key, bytes)
  }

  private def insert(key: Key, bytes: Array[Byte]): Unit =
    if (bytes.length <= cap / 8) lru.synchronized {
      val prev = lru.put(key, bytes)
      totalBytes += bytes.length - (if (prev != null) prev.length.toLong else 0L)
      val it = lru.entrySet().iterator()
      while (totalBytes > cap && it.hasNext) {
        val eldest = it.next()
        totalBytes -= eldest.getValue.length
        it.remove()
      }
    }

  /** Test/ops hook: drop everything and reread settings from the session. */
  def clear(): Unit = lru.synchronized {
    lru.clear(); totalBytes = 0L; capacity = -1L
    metaCache.clear(); statusTtl = -1L
  }

  /** Current resident bytes (observability). */
  def residentBytes: Long = lru.synchronized(totalBytes)
}
