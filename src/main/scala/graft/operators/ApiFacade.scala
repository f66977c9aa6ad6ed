package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

/** HTTP-parity facade over [[QueryService]] — the routing/validation layer
  * of the reference's Indexer API (indexer-api/lib/server.go:139-163,
  * handler.go) re-expressed as a request-case-class → DataFrame dispatcher.
  * No socket: everything an HTTP layer would decide — param parsing,
  * defaulting, key whitelisting, and the 200/206/400/500 status mapping —
  * happens here; serving it is a transport detail this sandbox can't host.
  *
  * Endpoint ↔ request mapping (server.go:139-163):
  *   - GET  /exact/:coll/:id                  → [[GetUniqueRequest]]
  *   - POST /all/:coll   {ids:[…]}            → [[GetAllRequest]]
  *   - GET  /range/:coll/:id?from&to&limit&offset → [[GetRangeRequest]]
  *   - POST /query/:coll {filters:[…]}?limit&offset → [[GetQueriedRequest]]
  *
  * Status fidelity (handler.go): GetUnique maps repo errors to 400
  * (handler.go:40-47); GetAll and GetAllInInterval map body/param errors to
  * 400 and repo errors to 500 (handler.go:63-69,92-99,103-110); GetQueried
  * maps every failure — bind, invalid keys, bad timestamps, repo — to 400
  * (handler.go:130-171). Pagination defaults are limit=20 / offset=0 with
  * Atoi semantics: a non-numeric or non-positive limit and a non-numeric or
  * negative offset silently fall back (util.go:39-66).
  */
object ApiFacade {

  /** Raw query params arrive as strings, exactly like URL params; None =
    * absent. A body of None models a malformed/unbindable JSON body.
    */
  final case class GetUniqueRequest(collection: String, id: String)
  final case class GetAllRequest(collection: String, ids: Option[Seq[String]])
  final case class GetRangeRequest(
      collection: String,
      brokerId: String,
      from: Option[String] = None,
      to: Option[String] = None,
      limit: Option[String] = None,
      offset: Option[String] = None)
  final case class GetQueriedRequest(
      collection: String,
      filters: Option[Seq[Map[String, FilterValue]]],
      limit: Option[String] = None,
      offset: Option[String] = None)

  /** What the HTTP layer would serialize: the status code, the message the
    * reference's gin handlers attach, and the lazy result frame (None on
    * error responses, like the error-body-only responses).
    */
  final case class ApiResponse(status: Int, message: String, data: Option[DataFrame])

  val OnBadRequestMessage = "bad request"
  val OnFailureMessage = "request failed"
  val OkMessage = "ok"

  /** Reference response projections (util.go:146-188), restricted to the
    * columns this index materializes.
    */
  val UniqueAttrs: Seq[String] = graft.model.IndexModel.Columns
  val IntervalAttrs: Seq[String] = Seq(
    "broker_id", "broker_msg_id", "business_source_key", "business_object_key",
    "unique_id", "ordering_key", "additional_metadata",
    "location_key", "location_position", "publish_time")

  private val DefaultLimit = 20
  private val DefaultOffset = 0

  /** RFC3339 wire format, identical to the reference's dateFormat
    * `2006-01-02T15:04:05.99999999Z` (util.go:77).
    */
  private def parseWire(s: String): Timestamp =
    Timestamp.from(java.time.Instant.parse(s))
}

/** One facade per served index; `collections` routes the `:mongo_collection`
  * path segment (the reference resolves it to a Mongo collection handle).
  */
final case class ApiFacade(
    collections: Map[String, QueryService],
    now: () => Timestamp = () => new Timestamp(System.currentTimeMillis())) {
  import ApiFacade._

  def getUnique(req: GetUniqueRequest): ApiResponse =
    collections.get(req.collection) match {
      // GetUnique maps ALL failures to 400 (handler.go:40-47), including
      // not-found — Mongo's FindOne surfaces ErrNoDocuments (mongo.go:
      // 90-119). A point lookup is inherently an action, so this endpoint
      // executes eagerly (one pushed-down point predicate) to keep that
      // contract; the other endpoints stay lazy.
      case None => bad()
      case Some(service) =>
        val hit = service.get(req.id, UniqueAttrs)
        if (hit.isEmpty) bad() else ok(hit)
    }

  def getAll(req: GetAllRequest): ApiResponse =
    req.ids match {
      case None => bad() // unbindable body (handler.go:63-69)
      case Some(ids) =>
        collections.get(req.collection) match {
          case None          => fail() // repo-level error → 500 (handler.go:73-79)
          case Some(service) => ok(service.getAll(ids, IntervalAttrs))
        }
    }

  def getRange(req: GetRangeRequest): ApiResponse = {
    val (limit, offset) = pagination(req.limit, req.offset)
    // interval params: absent from → beginning of time, absent to → now;
    // malformed values and future upper bounds are 400s (util.go:80-121)
    val bounds =
      try {
        val from = req.from.map(parseWire).getOrElse(new Timestamp(0L))
        val to = req.to.map(parseWire).getOrElse(now())
        require(!to.after(now()), "upper bound in the future")
        Some((from, to))
      } catch { case _: Exception => None }
    bounds match {
      case None => bad()
      case Some((from, to)) =>
        collections.get(req.collection) match {
          case None => fail() // repo-level error → 500 (handler.go:103-110)
          case Some(service) =>
            ok(service.getAllInInterval(from, to, req.brokerId, limit, offset,
              IntervalAttrs, now))
        }
    }
  }

  def getQueried(req: GetQueriedRequest): ApiResponse =
    // every failure — bind, whitelist, timestamp coercion, repo — is a 400
    // on this endpoint (handler.go:130-171); QueryService.compile throws on
    // non-whitelisted keys (T12) and malformed timestamp literals (T11)
    req.filters match {
      case None => bad()
      case Some(filters) =>
        val (limit, offset) = pagination(req.limit, req.offset)
        collections.get(req.collection) match {
          case None => bad()
          case Some(service) =>
            try ok(service.getQueried(filters, limit, offset, IntervalAttrs))
            catch { case _: IllegalArgumentException => bad() }
        }
    }

  /** The resubmitter's response-status rule (resubmitter-api/lib/
    * resubmitter/handler.go:115-139): clean run → 200, nothing published →
    * 400, anything in between → 206 partial content.
    */
  def resubmitStatus(
      indexerErrors: Long, pipelineErrors: Long, published: Long): (Int, String) =
    if (indexerErrors == 0 && pipelineErrors == 0) (200, "resubmission successful")
    else if (published == 0) (400, "resubmission failed due to bad request")
    else (206, "partial resubmission")

  private def pagination(limit: Option[String], offset: Option[String]): (Int, Int) = (
    limit.flatMap(_.toIntOption).filter(_ > 0).getOrElse(DefaultLimit),
    offset.flatMap(_.toIntOption).filter(_ >= 0).getOrElse(DefaultOffset))

  private def ok(df: DataFrame) = ApiResponse(200, OkMessage, Some(df))
  private def bad() = ApiResponse(400, OnBadRequestMessage, None)
  private def fail() = ApiResponse(500, OnFailureMessage, None)
}
