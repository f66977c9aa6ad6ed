package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Document deduplication — the training-data-pipeline operators
  * (BASELINE.json north star), each designed for 100 TB:
  *
  *   - exact / fingerprint dedup: one hash-shuffle, no pairwise work;
  *   - MinHash-LSH: per-row signatures (no explode until the tiny band
  *     table), candidates only where a band collides, then exact-Jaccard
  *     verification of candidates only — the classic near-linear path;
  *   - n-gram Jaccard ground truth: inverted shingle index equi-join, for
  *     oracle-checkable truth at test scale (inherently O(pairs) — the LSH
  *     variant is the scale path);
  *   - SimHash: per-row 60-bit signature; pigeonhole bit-chunk blocking
  *     (equi-join on signature chunks) makes pair enumeration near-linear
  *     while staying exactly equal to the all-pairs result.
  *
  * All hashing is the engine-portable h60 (md5-derived) so the DuckDB
  * oracle can replay the identical pipeline bit-for-bit.
  */
object Dedup {

  /** Exact duplicate groups keyed by md5 of the raw text. One shuffle
    * (window over the hash); canonical id = min doc_id of the group.
    */
  def exact(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    docs
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select("doc_id", "fp", "canonical_id", "group_size")
  }

  /** Bag-of-words fingerprint dedup: md5 over the sorted distinct token
    * set — catches reorderings that exact dedup misses.
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    docs
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(tokens(col("text")))))).as("fp"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select("doc_id", "fp", "canonical_id", "group_size")
  }

  /** Per-doc distinct shingle sets (docs with <3 tokens drop out). */
  private def shingleSets(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), shingleSet(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)

  private def jaccardOf(cand: DataFrame, sets: DataFrame): DataFrame = {
    val a = sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    cand
      .join(a, "doc_a")
      .join(b, "doc_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Ground-truth near-duplicate pairs by word-3-gram Jaccard ≥ threshold.
    * Pairs come from an inverted shingle index (equi-join on shingle) —
    * never a cross join — and |A∩B| falls out of the pair group count.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sets = shingleSets(docs)
    val inv = sets.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val pairs = inv
      .as("a")
      .join(inv.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val sizes = sets.select(col("doc_id"), size(col("sh")).as("n"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** MinHash-LSH near-dup detection: k seeded min-hashes per doc (computed
    * per-row), banded into `bands` signatures; docs colliding in any band
    * are candidates; candidates are verified with exact Jaccard ≥ threshold
    * so the output contains no false positives.
    *
    * Default 24 hashes × 8 bands of 3 ⇒ ~50% collision probability at
    * j≈0.5 — high recall at the 0.6 verification threshold.
    */
  def minHashLsh(
      docs: DataFrame,
      numHashes: Int = 24,
      bands: Int = 8,
      threshold: Double = 0.6): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val r = numHashes / bands
    val sets = shingleSets(docs)
    val banded = sets
      .withColumn("mh", minHashSignature(col("sh"), numHashes))
      .select(col("doc_id"), explode(bandSignatures(col("mh"), bands, r)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val cand = banded
      .as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    jaccardOf(cand, sets).filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 60-bit signatures, pairs with Hamming
    * distance ≤ maxDist. Signature computation is per-row and linear;
    * pair enumeration uses pigeonhole bit-chunk blocking: the signature is
    * split into maxDist+1 contiguous chunks — any pair within maxDist
    * differs in at most maxDist chunks, so it matches EXACTLY on at least
    * one chunk. Candidates come from an equi-join on (chunkIdx, chunkValue)
    * and are verified with the true Hamming distance, so the output is
    * identical to the all-pairs scan with no cartesian product in the plan.
    */
  def simHashPairs(docs: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < 60, "maxDist must be in [0, 60)")
    val sims = docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("simhash", simHashSql("toks"))
      .select(col("doc_id"), col("simhash"))
    // chunk boundaries: maxDist+1 chunks covering all 60 bits (first
    // `60 % n` chunks get one extra bit)
    val n = maxDist + 1
    val widths = Seq.tabulate(n)(c => 60 / n + (if (c < 60 % n) 1 else 0))
    val starts = widths.scanLeft(0)(_ + _)
    val chunkStructs = (0 until n).map { c =>
      val mask = (1L << widths(c)) - 1
      struct(
        lit(c).as("c"),
        shiftright(col("simhash"), starts(c)).bitwiseAND(lit(mask)).as("v"))
    }
    val chunks = sims
      .select(col("doc_id"), col("simhash"), explode(array(chunkStructs: _*)).as("ch"))
      .select(col("doc_id"), col("simhash"), col("ch.c").as("c"), col("ch.v").as("v"))
    chunks
      .as("a")
      .join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
