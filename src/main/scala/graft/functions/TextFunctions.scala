package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/hash column builders for the training-data-pipeline
  * operators (dedup, text analysis).
  *
  * Everything here is a composition of built-in Catalyst expressions —
  * no UDFs — so the hot paths stay inside codegen and the identical
  * computation is reproducible in ANSI SQL for the DuckDB oracle:
  *
  *   h60(s)   ==  cast('0x' || substr(md5(s), 1, 15) AS BIGINT)
  *   tokens   ==  list_filter(string_split(lower(text), ' '), t -> t <> '')
  *   shingles ==  list_transform(range(1, len(t)-1), i -> t[i]||' '||t[i+1]||' '||t[i+2])
  */
object TextFunctions {

  /** Stable 60-bit hash: first 15 hex digits of md5, as a positive long.
    * Engine-portable (DuckDB: `cast('0x'||substr(md5(s),1,15) as bigint)`),
    * unlike Spark's xxhash64/murmur whose seeds/variants differ per engine.
    */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** JVM-side h60 — the identical constant-space hash for deriving
    * coefficients that get INLINED as literals into both the Catalyst plan
    * and the oracle SQL (no per-row hashing for them anywhere).
    */
  def h60Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Modulus for the MinHash affine hash family — a prime just above 2^32,
    * so (a·h + b) with a,b < 2^31 and h < 2^32 never overflows a signed
    * 64-bit integer (DuckDB raises on BIGINT overflow; Spark wraps — the
    * bound keeps both engines in exact agreement).
    */
  val MinHashP = 4294967311L

  /** Deterministic affine coefficients (a odd, both < 2^31) for the k
    * MinHash functions h_i(x) = (a_i·x + b_i) mod P over 32-bit base
    * hashes. One md5 per SHINGLE total (the base hash); the k functions
    * are pure arithmetic — vs k md5s per shingle, the classic trick that
    * makes MinHash linear in practice.
    */
  def minHashCoeffs(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      ((h60Jvm(s"a|$i") % (1L << 31)) | 1L, h60Jvm(s"b|$i") % (1L << 31))
    }

  /** Whitespace tokens of the lowercased text, empties dropped. Plain
    * split-on-space (no regex) so every engine agrees byte-for-byte.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Word 3-gram shingles over a token array (1-based element_at, matching
    * the oracle's 1-based list indexing). Documents with fewer than 3
    * tokens yield an empty array.
    */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** Distinct shingle set for similarity/dedup comparisons. */
  def shingleSet(text: Column): Column = array_distinct(shingles3(tokens(text)))

  /** 32-bit base hashes of a shingle set — md5 evaluated ONCE per shingle;
    * every MinHash function reuses these.
    */
  def baseHashes(shingleSet: Column): Column =
    transform(shingleSet, s => h60(s).bitwiseAND(lit(0xFFFFFFFFL)))

  /** MinHash signature over precomputed base hashes: for each of `k`
    * affine hash functions, the minimum of (a_i·h + b_i) mod P. A native
    * codegen'd expression (flat Java loop inside whole-stage codegen) —
    * per-row, no explode, no shuffle, linear in documents. Callers must
    * filter out empty hash arrays first (shingleSets does).
    */
  def minHashSignature(baseHashes: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.MinHashSig(
        org.apache.spark.sql.graft.ColumnBridge.expression(baseHashes), k))

  /** LSH band signatures: split the k-length signature into bands of
    * `rowsPerBand` and hash each band; docs sharing any (band, signature)
    * become candidate pairs.
    */
  def bandSignatures(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(
        b.as("band"),
        md5(concat_ws(",",
          (0 until rowsPerBand).map(r =>
            element_at(signature, b * rowsPerBand + r + 1).cast("string")): _*))
          .as("sig")))

  /** SimHash over precomputed token hashes: bit b of the result is set
    * when the majority of token hashes have bit b set (ties → 0). 60 bits.
    * `hsCol` must name an array<bigint> column in scope (h60 of each
    * distinct token, hashed ONCE). A native codegen'd expression: the
    * 60 × |tokens| bit-fold runs as a flat Java loop, vs one boxed lambda
    * call per element under the equivalent `aggregate` HOF.
    */
  def simHashSql(hsCol: String): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.SimHash60(
        org.apache.spark.sql.graft.ColumnBridge.expression(col(hsCol))))

  /** h60 of each distinct token — the simhash input, one md5 per token. */
  def tokenHashes(toks: Column): Column =
    transform(array_distinct(toks), t => h60(t))

  /** Exact Jaccard similarity of two (distinct-element) arrays, as the
    * deterministic double inter/(|a|+|b|-inter). The intersection is
    * computed once (it dominates candidate-verification cost).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter).cast("double")
  }

  /** Per-class code-point histogram of a string (native codegen, one
    * pass): out[k] = count of code points ≡ k (mod classes). The
    * document-side half of the edit-distance content filter — see
    * [[graft.functions.expressions.CharClassHistogram]] for the bound.
    */
  def charClassHist(text: Column, classes: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.CharClassHistogram(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), classes))

  /** Occurrence-tagged positional q-grams in one per-row pass (native
    * codegen) — array<struct<gram, occ>>, value-identical to the
    * posexplode + per-doc row_number window it replaces, minus that
    * window's corpus×length-row shuffle. See
    * [[graft.functions.expressions.TaggedQGrams]].
    */
  def taggedQGrams(text: Column, q: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.TaggedQGrams(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), q))

  /** Exact L1 distance between two int arrays (native codegen): the
    * pair-side half of the content filter — L1 of two class histograms
    * lower-bounds 2·editDistance.
    */
  def l1Int(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.L1IntDistance(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}
