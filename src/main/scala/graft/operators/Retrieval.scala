package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stored-index retrieval surface for the live listener — the serving
  * layer's HTTP face over the round's persisted indexes: BM25 postings
  * stores ([[TextAnalysis.saveBm25Index]]) and IVF assigned stores
  * ([[Similarity.saveIvfAssigned]]), routed by collection name exactly
  * like [[ApiFacade]] routes `:mongo_collection`.
  *
  * Status conventions follow the facade (the reference's gin handlers):
  * 200 + data on success, 400 `bad request` on an unbindable body or
  * out-of-range parameters, and 404 for a collection with no built store
  * (an unbuilt index is a routing miss, not a caller error). Responses
  * are k-bounded by construction — the serve operators return top-k
  * pages, never corpus-sized frames — so the listener's bounded-collect
  * rendering contract holds.
  *
  * The ANN route inherits [[Similarity.ivfTopKAssigned]]'s enforced
  * small-probe contract: an oversized probe batch (over the store's
  * `maxBroadcastProbes`) silently falls back to the valved sweep join
  * with identical results — a client cannot OOM the serve by sending a
  * huge id list.
  */
final case class RetrievalService(
    bm25: Map[String, (DataFrame, DataFrame)] = Map.empty,
    ann: Map[String, RetrievalService.AnnStore] = Map.empty) {
  import ApiFacade.{ApiResponse, OkMessage, OnBadRequestMessage}
  import RetrievalService.OnNoStoreMessage

  /** `POST /search/:coll {"terms": […], "k": n}` — BM25 top-k from the
    * stored postings (term buckets prune the partition scan; nothing
    * re-tokenizes). Missing/empty terms or a non-positive k bind-fail.
    */
  def search(
      coll: String,
      terms: Option[Seq[String]],
      k: Option[Int]): ApiResponse =
    bm25.get(coll) match {
      case None => ApiResponse(404, OnNoStoreMessage, None)
      case Some((postings, doclen)) => (terms, k) match {
        case (Some(ts), Some(kv)) if ts.nonEmpty && kv > 0 =>
          ApiResponse(200, OkMessage,
            Some(TextAnalysis.bm25TopKFromIndex(postings, doclen, ts, kv)))
        case _ => ApiResponse(400, OnBadRequestMessage, None)
      }
    }

  /** `POST /ann/:coll {"query_ids": […], "k": n, "nprobe": m}` — IVF
    * top-k from the stored assignment for the corpus vectors named by
    * `query_ids` (the self-serve probe shape; ids absent from the corpus
    * contribute no rows). nprobe outside [1, numCells] bind-fails rather
    * than crashing the serve, and so does an id list past the store's
    * `maxQueryIds` — the HTTP-boundary twin of the broadcast-probe valve
    * (the valve caps the JOIN, but a multi-million-id body would still
    * materialize a giant driver-side `IN` expression; cap it at bind).
    */
  def annSearch(
      coll: String,
      queryIds: Option[Seq[Long]],
      k: Option[Int],
      nprobe: Option[Int]): ApiResponse =
    ann.get(coll) match {
      case None => ApiResponse(404, OnNoStoreMessage, None)
      case Some(st) => (queryIds, k, nprobe) match {
        case (Some(ids), Some(kv), Some(np))
            if ids.nonEmpty && ids.length <= st.maxQueryIds &&
              kv > 0 && np >= 1 && np <= st.cents.length =>
          ApiResponse(200, OkMessage,
            Some(Similarity.ivfTopKAssigned(
              st.assigned, col("vec_id").isin(ids: _*), kv, st.cents, np,
              maxBroadcastProbes = st.maxBroadcastProbes)))
        case _ => ApiResponse(400, OnBadRequestMessage, None)
      }
    }
}

object RetrievalService {

  val OnNoStoreMessage = "no such collection"

  /** One served ANN collection: the loaded assigned store, the quantizer
    * it was stamped with (a [[Similarity.loadIvfAssigned]] load already
    * verified the pair), the serve-time probe cap, and the bind-time
    * ceiling on a request's query-id list (see [[RetrievalService.annSearch]]).
    */
  final case class AnnStore(
      assigned: DataFrame,
      cents: Array[Array[Double]],
      maxBroadcastProbes: Int = 4096,
      maxQueryIds: Int = 4096)
}
