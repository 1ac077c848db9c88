package graft.format

/** Fixed 256-register HyperLogLog for per-column distinct-count estimates
  * (footer v10 `ndv` block → CBO `distinctCount`).
  *
  * 256 one-byte registers (b=8) give a ~6.5% standard error in 256 bytes
  * per column per file — small enough to live in every footer, mergeable
  * across stripes and files by byte-wise register max, which is what lets
  * the table-level estimate stay sound under any file layout. Input is the
  * writer's existing 64-bit value hashes (reference for the role of column
  * NDV in an engine's stats: dwio/nimble/velox/stats/ColumnStatsUtils.h —
  * the reference collects column stats at write; distinct counts are the
  * piece Spark's CBO needs for join reordering that min/max can't give). */
object Hll {
  final val Registers = 256

  def empty(): Array[Byte] = new Array[Byte](Registers)

  /** Allocation-free 64-bit mixer (splitmix64 finalizer) for long-backed
    * values. PART OF THE v10 WIRE CONTRACT: sketches merge across files by
    * register max, which is only sound when every writer hashed identically
    * — never change this function for files already written. */
  def mixLong(v: Long): Long = {
    var z = v + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Fold one 64-bit value hash into the registers. */
  def add(regs: Array[Byte], hash: Long): Unit = {
    val idx = (hash >>> 56).toInt // top 8 bits pick the register
    // rank = leading-zero run of the remaining 56 bits + 1 (capped 57)
    val rest = hash << 8
    val rank = (if (rest == 0L) 57 else java.lang.Long.numberOfLeadingZeros(rest) + 1).toByte
    if (rank > regs(idx)) regs(idx) = rank
  }

  /** Byte-wise register max — exact distributed merge. */
  def merge(into: Array[Byte], other: Array[Byte]): Unit = {
    var i = 0
    while (i < Registers) {
      if (other(i) > into(i)) into(i) = other(i)
      i += 1
    }
  }

  /** Standard HLL estimate with the small-range (linear counting) and
    * zero-register corrections; good to ~6.5% at this register count. */
  def estimate(regs: Array[Byte]): Long = {
    val m = Registers.toDouble
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < Registers) {
      sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m) // bias constant for m >= 128
    val e = alpha * m * m / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m / zeros) // linear counting
      else e
    math.max(0L, math.round(corrected))
  }
}
