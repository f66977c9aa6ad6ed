package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A Bloom filter whose bit math is expressed twice over the SAME integer
  * operations — once in plain JVM code (spec cross-checks), once as
  * Catalyst columns (the distributed build and the per-row codegen'd
  * membership test) — so build and test agree bit-for-bit without any
  * driver-side hashing of row data.
  *
  * Element identity is a 60-bit [[TextFunctions.h60]] hash split into two
  * 30-bit halves (h2 forced odd); probe `i` sets bit `(h1 + i·h2) mod m`
  * — classic double hashing (Kirsch–Mitzenmacher), so ONE md5 per row
  * serves all `k` probes. All arithmetic stays far below 2^63 and all
  * operands nonnegative: no overflow or sign divergence anywhere. `m` is
  * a whole number of 64-bit words, so word index = pos >> 6 and bit
  * index = pos & 63 — shifts/ANDs only, no division.
  *
  * Used as a broadcastable pre-filter where the membership set is too
  * large to ship as an exact hash table but its bitset is small: the scan
  * side tests k bits per row against an array literal and only surviving
  * candidates proceed to exact verification — false positives cost a
  * re-check, never a wrong result.
  */
object PortableBloom {

  private val Mask30 = (1L << 30) - 1

  /** Probe-bit positions of element-hash `h` — JVM twin of
    * [[positionsCol]], for spec cross-checks.
    */
  def positions(h: Long, m: Int, k: Int): Seq[Long] = {
    val h1 = h & Mask30
    val h2 = ((h >> 30) & Mask30) | 1L
    (0 until k).map(i => (h1 + i.toLong * h2) % m)
  }

  /** Probe-bit positions as a Catalyst array column — the distributed
    * build explodes this per member and bit-ORs word masks, so the filter
    * is assembled with one tiny aggregation (m/64 longs to the driver),
    * never by collecting members.
    */
  def positionsCol(h: Column, m: Int, k: Int): Column = {
    val h1 = h.bitwiseAND(lit(Mask30))
    val h2 = call_function("shiftright", h, lit(30)).bitwiseAND(lit(Mask30))
      .bitwiseOR(lit(1L))
    array((0 until k).map(i => (h1 + lit(i.toLong) * h2) % lit(m.toLong)): _*)
  }

  /** Filter sizing: `bitsPerItem`·n bits rounded up to whole 64-bit words
    * (≥ 1024 bits so degenerate inputs still get a real filter; capped at
    * 2^30 bits = 128 MiB, the practical broadcast-literal ceiling).
    */
  def sizeBits(nItems: Long, bitsPerItem: Int): Int = {
    val wanted = math.max(1024L, nItems * bitsPerItem)
    val words = (wanted + 63) / 64
    math.min(words * 64, 1L << 30).toInt
  }

  /** Assemble the word array from `(word_index, or_mask)` build output. */
  def assemble(m: Int, words: Iterator[(Int, Long)]): Array[Long] = {
    val bits = new Array[Long](m / 64)
    words.foreach { case (w, mask) => bits(w) = mask }
    bits
  }

  /** Membership test as a Catalyst column: AND of `k` single-bit probes of
    * the word-array literal. `h` must come from the same h60 family the
    * build hashed. Dynamic shifts go through `call_function` (the typed
    * `shiftright`/`shiftleft` helpers only take literal shift amounts).
    */
  def mightContain(bits: Array[Long], m: Int, k: Int, h: Column): Column = {
    val arr = typedlit(bits.toSeq)
    val h1 = h.bitwiseAND(lit(Mask30))
    val h2 = call_function("shiftright", h, lit(30)).bitwiseAND(lit(Mask30))
      .bitwiseOR(lit(1L))
    (0 until k).map { i =>
      val pos = (h1 + lit(i.toLong) * h2) % lit(m.toLong)
      val word = element_at(arr,
        call_function("shiftright", pos, lit(6)).cast("int") + 1)
      call_function("shiftright", word, pos.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
