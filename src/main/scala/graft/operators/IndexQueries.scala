package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.model.IndexModel

/** A single filter value in a generic index query: either an equality
  * (`{attr: value}`) or an operator comparison (`{attr: {op: value}}`) —
  * the two shapes the reference accepts
  * (indexer-api/lib/repo/mongo.go:212-239, repo.go:55-61).
  */
sealed trait FilterValue
final case class Eq(value: String) extends FilterValue
/** op ∈ gte | gt | lte | lt | ne (Mongo's $gte/$gt/$lte/$lt/$ne). */
final case class Cmp(op: String, value: String) extends FilterValue

/** The query surface of the metadata index — the Spark-native equivalent of
  * the reference's Indexer API repo layer (indexer-api/lib/repo/mongo.go).
  *
  * Every method returns a *lazy* DataFrame whose filters and projections
  * Catalyst pushes into the parquet scan (the reference hand-rolls the same
  * via Mongo projections + filters; here it's free — SURVEY §4).
  *
  * Pagination: the reference issues Mongo Find without sort, so its pages
  * are nondeterministic (SURVEY §7.4 item 4). This engine imposes
  * `unique_id` order. The implementation is scale-safe: ORDER BY + LIMIT
  * (offset+limit) compiles to a distributed top-k (TakeOrderedAndProject),
  * and only the ≤(offset+limit)-row result gets a windowed row_number —
  * never a global sort of the full index.
  */
object QueryService {
  /** A4: process-wide count memo shared by all service instances, like the
    * reference's LRU in front of Mongo CountDocuments (cache.go:47-119).
    */
  val countCache = new CountCache(100)
}

final case class QueryService(index: DataFrame) {

  /** Point lookup by unique_id — S7 (mongo.go:90-119). */
  def get(id: String, attrs: Seq[String] = Nil): DataFrame =
    project(index.filter(col("unique_id") === lit(id)), attrs)

  /** Multi-ID lookup — S8 (mongo.go:121-152). For literal lists Catalyst
    * turns `isin` into an In predicate pushed to the scan; very large ID
    * sets should use [[getAllJoin]] instead.
    */
  def getAll(ids: Seq[String], attrs: Seq[String] = Nil): DataFrame =
    project(index.filter(col("unique_id").isin(ids: _*)), attrs)

  /** Large-ID-set variant of S8: a left-semi join, shuffle-free when the ID
    * side is broadcastable (J4, SURVEY §2.4).
    */
  def getAllJoin(ids: DataFrame, attrs: Seq[String] = Nil): DataFrame =
    project(index.join(broadcast(ids), Seq("unique_id"), "left_semi"), attrs)

  /** Interval scan — S9 (mongo.go:156-191): `[from, to)` on publish_time
    * plus broker_id equality, with projection and deterministic pagination.
    * Rejects upper bounds in the future like the API layer does
    * (indexer-api/lib/util.go:110-113).
    */
  def getAllInInterval(
      from: Timestamp,
      to: Timestamp,
      brokerId: String,
      limit: Int = 20,
      offset: Int = 0,
      attrs: Seq[String] = Nil,
      now: () => Timestamp = () => new Timestamp(System.currentTimeMillis())): DataFrame = {
    require(!to.after(now()), s"interval upper bound $to is in the future")
    project(page(intervalFilter(from, to, brokerId), limit, offset), attrs)
  }

  /** The resubmitter's drain of S9: the reference pages the interval with
    * an offset loop until TotalCount is exhausted
    * (resubmitter-api/lib/resubmitter/resubmitter_job.go:155-199), so the
    * WHOLE matching slice is the result — the Spark form is the unpaged
    * pushed-down filter, one scan, no top-k, no batching artifacts.
    */
  def allInInterval(
      from: Timestamp,
      to: Timestamp,
      brokerId: String,
      now: () => Timestamp = () => new Timestamp(System.currentTimeMillis())): DataFrame = {
    require(!to.after(now()), s"interval upper bound $to is in the future")
    intervalFilter(from, to, brokerId)
  }

  /** Drain of S10 for the resubmitter's query mode (resubmitter_job.go:
    * 207-260): the full matching set, unpaged.
    */
  def allQueried(filters: Seq[Map[String, FilterValue]]): DataFrame =
    index.filter(compile(filters))

  /** Interval count — A1 (mongo.go:194-209). */
  def countInInterval(from: Timestamp, to: Timestamp, brokerId: String): DataFrame =
    intervalFilter(from, to, brokerId).agg(count(lit(1)).as("cnt"))

  /** A4: memoized interval count through the process-wide [[CountCache]]
    * (key layout mirrors indexer-api/lib/repo/cache.go "to_from_broker").
    */
  def countInIntervalCached(from: Timestamp, to: Timestamp, brokerId: String): Long =
    QueryService.countCache.getOrCompute(s"${to}_${from}_$brokerId") {
      countInInterval(from, to, brokerId).head().getLong(0)
    }

  /** Generic OR-of-conjunctions query — S10 (mongo.go:212-239): each map is
    * ANDed internally, maps are ORed together, exactly Mongo's
    * `{$or: [...]}`. Applies the key whitelist (T12, util.go:122-220) and
    * timestamp literal coercion (T11, util.go:222-285).
    */
  def getQueried(
      filters: Seq[Map[String, FilterValue]],
      limit: Int = 20,
      offset: Int = 0,
      attrs: Seq[String] = Nil): DataFrame =
    project(page(index.filter(compile(filters)), limit, offset), attrs)

  /** Count over the generic query — A2 (mongo.go:242-249). */
  def countQueried(filters: Seq[Map[String, FilterValue]]): DataFrame =
    index.filter(compile(filters)).agg(count(lit(1)).as("cnt"))

  // ---------------------------------------------------------------- internals

  private def intervalFilter(from: Timestamp, to: Timestamp, brokerId: String): DataFrame =
    index.filter(
      col("publish_time") >= lit(from) && col("publish_time") < lit(to) &&
        col("broker_id") === lit(brokerId))

  private def project(df: DataFrame, attrs: Seq[String]): DataFrame =
    if (attrs.isEmpty) df else df.select(attrs.map(resolve): _*)

  /** Deterministic limit/offset — A3. Top-k first (distributed), then a
    * row_number window over at most offset+limit rows. Runs BEFORE the
    * attribute projection so pagination order never depends on the caller
    * including `unique_id` in attrs.
    */
  private def page(df: DataFrame, limit: Int, offset: Int): DataFrame = {
    require(limit >= 0 && offset >= 0, "limit/offset must be non-negative")
    val topK = df.orderBy(col("unique_id")).limit(offset + limit)
    if (offset == 0) topK
    else
      topK
        .withColumn("__rn", row_number().over(Window.orderBy(col("unique_id"))))
        .filter(col("__rn") > offset)
        .drop("__rn")
  }

  /** Compile the reference's filter maps into one Catalyst predicate. */
  def compile(filters: Seq[Map[String, FilterValue]]): Column = {
    require(filters.nonEmpty, "at least one filter map required")
    filters.map(compileOne).reduce(_ || _)
  }

  private def compileOne(m: Map[String, FilterValue]): Column = {
    require(m.nonEmpty, "empty filter map")
    m.map { case (key, fv) => predicate(key, fv) }.reduce(_ && _)
  }

  private def predicate(key: String, fv: FilterValue): Column = {
    val c = resolve(key)
    fv match {
      case Eq(v) => c === literal(key, v)
      case Cmp(op, v) =>
        val l = literal(key, v)
        op match {
          case "gte" => c >= l
          case "gt"  => c > l
          case "lte" => c <= l
          case "lt"  => c < l
          case "ne"  => c =!= l
          case other => throw new IllegalArgumentException(s"unsupported operator: $other")
        }
    }
  }

  /** Key whitelist (T12): a key must be a known index attribute or an
    * `additional_metadata.<subkey>` map access. Subkeys materialized as
    * plain columns (IndexModel.MaterializedMetaKeys) are rewritten to the
    * column so the predicate pushes down to the parquet scan — a map probe
    * never can.
    */
  private def resolve(key: String): Column =
    if (IndexModel.QueryableAttributes.contains(key)) col(key)
    else if (key.startsWith("additional_metadata.")) {
      val sub = key.stripPrefix("additional_metadata.")
      IndexModel.MaterializedMetaKeys.get(sub) match {
        case Some(column) => col(column)
        case None         => element_at(col("additional_metadata"), sub)
      }
    } else throw new IllegalArgumentException(s"attribute not queryable: $key")

  /** Timestamp coercion (T11): string literals on the three timestamp
    * attributes are parsed as timestamps; everything else compares as-is.
    */
  private def literal(key: String, v: String): Column =
    if (IndexModel.TimestampAttributes.contains(key)) lit(Timestamp.valueOf(v))
    else lit(v)
}
