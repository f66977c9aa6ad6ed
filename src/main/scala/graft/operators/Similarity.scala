package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Cosine math is done in double with a strict left-fold order
  * (`aggregate` over `zip_with`), which makes scores bit-identical across
  * engines — the DuckDB oracle reproduces them exactly with
  * `list_reduce(list_transform(...))`. No UDFs: everything is Catalyst
  * higher-order functions on the array column.
  *
  * Scale design: norms are precomputed once per row; the brute-force path
  * broadcasts the (small) query side so the corpus never shuffles; the IVF
  * path adds a coarse-partition equi-join key so each query only scans its
  * cell — the standard recall/cost trade at 100 TB, where brute force is
  * O(queries × corpus) and IVF is O(queries × corpus / cells).
  */
object Similarity {

  /** Left-fold double dot product of two float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Corpus annotated with its precomputed norm. */
  private def withNorm(embeddings: DataFrame): DataFrame =
    embeddings.withColumn("nrm", norm(col("embedding")))

  /** Brute-force cosine top-k: for each query vector (vec_id ∈ querySet),
    * the k nearest corpus vectors by cosine, ties broken by vec_id.
    * The query side is broadcast; ranking is a per-query window (k small).
    */
  def bruteForceTopK(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val corpus = withNorm(embeddings)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("emb_n"), col("nrm").as("nrm_n"))
    val queries = withNorm(embeddings)
      .filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("emb_q"), col("nrm").as("nrm_q"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    corpus
      .join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("emb_q"), col("emb_n")) / (col("nrm_q") * col("nrm_n")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** IVF-style top-k: identical contract but each query only scans its
    * coarse cell (here the `label` column plays the quantizer assignment —
    * in a real deployment the cell id comes from a centroid model). The
    * cell equi-join key turns the cross product into a hash join.
    */
  def ivfTopK(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val corpus = withNorm(embeddings)
      .select(col("vec_id").as("neighbor_id"), col("label").as("cell"),
        col("embedding").as("emb_n"), col("nrm").as("nrm_n"))
    val queries = withNorm(embeddings)
      .filter(queryPred)
      .select(col("vec_id").as("query_id"), col("label").as("cell"),
        col("embedding").as("emb_q"), col("nrm").as("nrm_q"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    corpus
      .join(broadcast(queries), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("emb_q"), col("emb_n")) / (col("nrm_q") * col("nrm_n")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cell", "neighbor_id", "rank", "cosine")
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs with
    * cosine ≥ threshold. All-pairs at test scale; at 100 TB this blocks on
    * an LSH/IVF cell first, like [[ivfTopK]].
    */
  def nearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = withNorm(embeddings)
      .select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val b = withNorm(embeddings)
      .select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine", dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }
}
