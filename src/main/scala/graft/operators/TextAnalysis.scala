package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators over the documents table: token statistics,
  * quality scoring, heuristic language ID, and content fingerprinting.
  * All per-row (narrow) transformations — they scale linearly and never
  * shuffle; every formula is reproducible in ANSI SQL for the oracle.
  */
object TextAnalysis {

  /** Stopword lists for the heuristic language scorer. Deliberately tiny
    * and fixed: the operator contract is the scoring rule, not the lists.
    */
  val StopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val StopwordsEs = Seq("el", "la", "de", "que", "y", "en", "un", "es")
  val StopwordsDe = Seq("der", "die", "das", "und", "ist", "von", "ein", "zu")
  val StopwordsFr = Seq("le", "la", "de", "et", "est", "un", "une", "dans")

  /** Token counting: total and distinct whitespace tokens per document. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_unique"))

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean token
    * length, and a composite score. Ratios are double divisions of integer
    * counts — deterministic across engines.
    */
  def qualityScores(docs: DataFrame): DataFrame = {
    // tokens materialize once in their own projection — the ratios
    // reference the array ~5 times, and an inlined tokenizer would re-split
    // the text per reference (CollapseProject keeps multi-referenced
    // non-cheap expressions un-merged)
    val toks = col("toks")
    val nTok = size(toks).cast("double")
    val stopHits = size(filter(toks, t => t.isin(StopwordsEn: _*))).cast("double")
    val punct = (length(col("text")) - length(translate(col("text"), ".,!?;:", ""))).cast("double")
    docs
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        when(length(col("text")) > 0, punct / length(col("text")).cast("double"))
          .otherwise(lit(0.0)).as("punct_ratio"),
        when(nTok > 0, stopHits / nTok).otherwise(lit(0.0)).as("stopword_ratio"),
        when(nTok > 0,
          aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTok)
          .otherwise(lit(0.0)).as("mean_token_len"))
  }

  /** Heuristic language ID: count stopword hits per language over the
    * token bag (with multiplicity); the guess is the max-hit language with
    * a fixed priority order (en > es > de > fr) breaking ties, 'und'
    * (undetermined) when no list hits at all.
    */
  def languageId(docs: DataFrame): DataFrame = {
    // one tokenization per row, shared by the four language scorers
    def hits(words: Seq[String]) =
      size(filter(col("toks"), t => t.isin(words: _*))).cast("long")
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        hits(StopwordsEn).as("en_hits"),
        hits(StopwordsEs).as("es_hits"),
        hits(StopwordsDe).as("de_hits"),
        hits(StopwordsFr).as("fr_hits"))
      .withColumn(
        "guessed_lang",
        when(col("en_hits") + col("es_hits") + col("de_hits") + col("fr_hits") === 0, lit("und"))
          .when(col("en_hits") >= greatest(col("es_hits"), col("de_hits"), col("fr_hits")), lit("en"))
          .when(col("es_hits") >= greatest(col("de_hits"), col("fr_hits")), lit("es"))
          .when(col("de_hits") >= col("fr_hits"), lit("de"))
          .otherwise(lit("fr")))
  }

  /** Vocabulary extraction: the `topK` most frequent tokens with total
    * occurrences and document frequency — the corpus-stats input for
    * tokenizer training and stop-list induction. One explode + one
    * aggregation shuffle on the token; the top-k is a distributed
    * `TakeOrdered`, never a full global sort.
    */
  def vocabulary(docs: DataFrame, topK: Int): DataFrame =
    docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(topK)

  /** Content fingerprints: h60 of the full normalized text (exact-content
    * identity) and md5 of the sorted distinct-token bag (order-insensitive
    * identity) — the lookup keys for dedup joins.
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      h60(concat_ws(" ", tokens(col("text")))).as("content_h60"),
      md5(concat_ws(" ", array_sort(array_distinct(tokens(col("text")))))).as("bag_fp"))
}
