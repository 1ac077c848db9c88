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
  /** Memory-evicted ranges served back from the local disk tier. */
  val diskHits = new java.util.concurrent.atomic.AtomicLong()

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

  // ---- disk tier (reference: velox_cache_and_nimble_datapath.rst —
  // AsyncDataCache spills cold entries to local SSD so a remote-storage
  // re-read becomes a local read). Memory-evicted blocks spill to
  // `spark.graft.scan.blockCacheDiskDir` (default: a per-JVM tmpdir,
  // best-effort wiped on exit) under their own LRU byte budget
  // `spark.graft.scan.blockCacheDiskBytes` (default 0 = tier off). Keys are
  // the same (file, mtime, length, stripe, stream) tuples, so an
  // overwritten source file can never serve stale spilled bytes. ----
  @volatile private var diskCapacity: Long = -1L
  private def diskCap: Long = {
    if (diskCapacity < 0) diskCapacity = confLong("spark.graft.scan.blockCacheDiskBytes", 0L)
    diskCapacity
  }
  @volatile private var diskDirPath: String = null
  @volatile private var wipeHookInstalled = false
  private def diskDir: java.io.File = {
    if (diskDirPath == null) {
      val conf = try org.apache.spark.sql.SparkSession.active.conf
        .get("spark.graft.scan.blockCacheDiskDir", "") catch { case _: Throwable => "" }
      val d = if (conf.nonEmpty) new java.io.File(conf)
        else {
          val dd = new java.io.File(System.getProperty("java.io.tmpdir"),
            s"graft-blockcache-${java.lang.ProcessHandle.current().pid()}")
          // stale pid-named siblings from dead JVMs (a crash skips any exit
          // cleanup) are swept once per tier init — tmpdir must not
          // accumulate spilled blocks across runs
          sweepStaleDirs(dd.getParentFile)
          // File.deleteOnExit cannot remove a non-empty directory; a
          // shutdown hook wipes the whole tree recursively instead (and
          // unlike per-file deleteOnExit it doesn't grow a retained set
          // under heavy eviction churn)
          if (!wipeHookInstalled) synchronized {
            if (!wipeHookInstalled) {
              wipeHookInstalled = true
              try Runtime.getRuntime.addShutdownHook(new Thread(() =>
                deleteRecursively(dd), "graft-blockcache-wipe"))
              catch { case _: IllegalStateException => () } // already shutting down
            }
          }
          dd
        }
      d.mkdirs()
      diskDirPath = d.getPath
    }
    new java.io.File(diskDirPath)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    try {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
      f.delete()
    } catch { case _: Exception => () }
    ()
  }

  /** Remove `graft-blockcache-<pid>` directories whose owning JVM is gone. */
  private def sweepStaleDirs(parent: java.io.File): Unit = try {
    val own = java.lang.ProcessHandle.current().pid()
    for (f <- Option(parent.listFiles()).getOrElse(Array.empty[java.io.File])
         if f.isDirectory && f.getName.startsWith("graft-blockcache-")) {
      val pid = f.getName.stripPrefix("graft-blockcache-").toLongOption
      val alive = pid.exists(p => p == own ||
        java.lang.ProcessHandle.of(p).map[Boolean](_.isAlive).orElse(false))
      if (!alive) deleteRecursively(f)
    }
  } catch { case _: Exception => () }
  private var diskBytes = 0L
  private var diskSeq = 0L
  private val disk = new java.util.LinkedHashMap[Key, (java.io.File, Int)](256, 0.75f, true)

  // ---- async spill writer (AsyncDataCache runs a background writer;
  // reference: docs/develop/velox_cache_and_nimble_datapath.rst): evicting
  // readers ENQUEUE the spill and return immediately — the file write runs
  // on one daemon thread, and a full queue DROPS the spill (backpressure
  // degrades the cache tier, never stalls the reader's decode path). ----
  /** Spills dropped because the writer queue was full (observability). */
  val spillsDropped = new java.util.concurrent.atomic.AtomicLong()
  /** Bumped by clear(): queued spills from the previous epoch are no-ops
    * (they would otherwise repopulate a wiped/reconfigured tier). */
  private val spillEpoch = new java.util.concurrent.atomic.AtomicLong()
  /** Name of the thread that performed the most recent spill write (spec
    * hook: proves no caller-thread IO). */
  @volatile private[graft] var lastSpillThread: String = null
  private lazy val spillExec: java.util.concurrent.ThreadPoolExecutor = {
    val tf = new java.util.concurrent.ThreadFactory {
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, "graft-blockcache-spill"); t.setDaemon(true); t
      }
    }
    new java.util.concurrent.ThreadPoolExecutor(1, 1, 30L,
      java.util.concurrent.TimeUnit.SECONDS,
      new java.util.concurrent.ArrayBlockingQueue[Runnable](256), tf)
  }
  private def enqueueSpill(key: Key, bytes: Array[Byte]): Unit = {
    if (diskCap <= 0 || bytes.length > diskCap / 8) return
    val epoch = spillEpoch.get()
    try spillExec.execute(() => if (spillEpoch.get() == epoch) {
      lastSpillThread = Thread.currentThread().getName
      spill(key, bytes)
    })
    catch {
      case _: java.util.concurrent.RejectedExecutionException =>
        spillsDropped.incrementAndGet()
    }
  }
  /** Barrier: returns once every spill enqueued before the call has run
    * (tests and orderly shutdown; production readers never need it). */
  def awaitSpills(): Unit =
    try spillExec.submit(new Runnable { def run(): Unit = () }).get()
    catch { case _: Exception => () }

  /** Spill a memory-evicted block to the disk tier (file IO outside the
    * caller's lock; index insert + disk-LRU eviction under it). */
  private def spill(key: Key, bytes: Array[Byte]): Unit = {
    if (diskCap <= 0 || bytes.length > diskCap / 8) return
    val f = lru.synchronized {
      if (disk.containsKey(key)) return
      diskSeq += 1
      new java.io.File(diskDir, s"blk-$diskSeq.bin")
    }
    try java.nio.file.Files.write(f.toPath, bytes)
    catch { case _: Exception => return } // disk full/unwritable: tier degrades to off
    val evicted = new java.util.ArrayList[java.io.File]()
    lru.synchronized {
      val prev = disk.put(key, (f, bytes.length))
      if (prev != null) { diskBytes -= prev._2; evicted.add(prev._1) }
      diskBytes += bytes.length
      val it = disk.entrySet().iterator()
      while (diskBytes > diskCap && it.hasNext) {
        val eldest = it.next()
        diskBytes -= eldest.getValue._2
        evicted.add(eldest.getValue._1)
        it.remove()
      }
    }
    val ei = evicted.iterator()
    while (ei.hasNext) { val del = ei.next(); try del.delete() catch { case _: Exception => () } }
  }

  /** Disk-tier probe: on hit, read the spilled bytes back and promote them
    * into the memory LRU. Null on miss or any read failure. */
  private def diskLookup(key: Key): Array[Byte] = {
    if (diskCap <= 0) return null
    val entry = lru.synchronized(disk.get(key))
    if (entry == null) return null
    val bytes =
      try java.nio.file.Files.readAllBytes(entry._1.toPath)
      catch { case _: Exception => null } // concurrently evicted: a miss
    if (bytes == null || bytes.length != entry._2) return null
    diskHits.incrementAndGet()
    insert(key, bytes)
    bytes
  }

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
    val spilled = diskLookup(key)
    if (spilled != null) { hits.incrementAndGet(); return spilled }
    misses.incrementAndGet()
    val bytes = load // outside the lock: concurrent duplicate loads beat a stalled cache
    insert(key, bytes)
    bytes
  }

  /** Cache probe WITHOUT loading — the IO-coalescing read path splits its
    * stream set into cached / to-fetch before issuing merged range reads.
    * Probes the disk tier too: a spilled block is still a local read, far
    * cheaper than joining a remote coalesced fetch. */
  def peek(key: Key): Array[Byte] = {
    lru.synchronized {
      val hit = lru.get(key)
      if (hit != null) { hits.incrementAndGet(); return hit }
    }
    val spilled = diskLookup(key)
    if (spilled != null) hits.incrementAndGet()
    spilled
  }

  /** Insert bytes fetched externally (a slice of a coalesced range read). */
  def put(key: Key, bytes: Array[Byte]): Unit = {
    misses.incrementAndGet()
    insert(key, bytes)
  }

  private def insert(key: Key, bytes: Array[Byte]): Unit =
    if (bytes.length <= cap / 8) {
      val spills = new java.util.ArrayList[(Key, Array[Byte])]()
      lru.synchronized {
        val prev = lru.put(key, bytes)
        totalBytes += bytes.length - (if (prev != null) prev.length.toLong else 0L)
        val it = lru.entrySet().iterator()
        while (totalBytes > cap && it.hasNext) {
          val eldest = it.next()
          totalBytes -= eldest.getValue.length
          spills.add((eldest.getKey, eldest.getValue))
          it.remove()
        }
      }
      // memory evictions cascade to the disk tier (async: the spill's file
      // write runs on the background writer, never the evicting reader)
      val si = spills.iterator()
      while (si.hasNext) { val (k, b) = si.next(); enqueueSpill(k, b) }
    } else enqueueSpill(key, bytes) // too big for RAM != uncacheable: SSD-only entry

  /** Test/ops hook: drop everything and reread settings from the session. */
  def clear(): Unit = {
    spillEpoch.incrementAndGet() // queued spills from the old config become no-ops
    awaitSpills() // in-flight write finishes (or no-ops) before the wipe below
    val files = new java.util.ArrayList[java.io.File]()
    lru.synchronized {
      lru.clear(); totalBytes = 0L; capacity = -1L
      metaCache.clear(); statusTtl = -1L
      val it = disk.values().iterator()
      while (it.hasNext) files.add(it.next()._1)
      disk.clear(); diskBytes = 0L; diskCapacity = -1L; diskDirPath = null
    }
    val fi = files.iterator()
    while (fi.hasNext) { try fi.next().delete() catch { case _: Exception => () } }
  }

  /** Current spilled bytes in the disk tier (observability). */
  def diskResidentBytes: Long = lru.synchronized(diskBytes)

  /** Current resident bytes (observability). */
  def residentBytes: Long = lru.synchronized(totalBytes)
}
