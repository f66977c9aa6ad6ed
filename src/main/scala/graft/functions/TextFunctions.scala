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

  /** Seeded variant — the family of hash functions for MinHash. */
  def h60Seeded(seed: Column, c: Column): Column =
    h60(concat(seed.cast("string"), lit("|"), c))

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

  /** MinHash signature: for each of `k` seeded hash functions, the minimum
    * h60 over the shingle set. Computed per-row with higher-order
    * functions — no explode, no shuffle; scales linearly in documents.
    */
  def minHashSignature(shingleSet: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(shingleSet, s => h60Seeded(i, s))))

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

  /** SimHash over distinct-token h60 hashes: bit b of the result is set
    * when the majority of token hashes have bit b set (ties → 0). 60 bits.
    *
    * Built as a SQL expression string because variable shift amounts are
    * only exposed through the SQL `shiftright`/`shiftleft` functions (the
    * Scala DSL pins the shift to a literal Int). `toksCol` must name an
    * array<string> column in scope.
    */
  def simHashSql(toksCol: String): Column = expr(
    s"""aggregate(
       |  sequence(0, 59), CAST(0 AS BIGINT),
       |  (acc, b) -> acc + IF(
       |    aggregate(
       |      transform(array_distinct($toksCol),
       |                t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)),
       |      CAST(0 AS BIGINT),
       |      (a2, h) -> a2 + (shiftright(h, b) & 1) * 2 - 1) > 0,
       |    shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))""".stripMargin)

  /** Exact Jaccard similarity of two (distinct-element) arrays, as the
    * deterministic double inter/(|a|+|b|-inter).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast("double")
  }
}
