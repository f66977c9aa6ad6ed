package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a matching ANSI-SQL oracle in
  * [[oracleSql]] (DuckDB dialect-compatible) computing the identical
  * result over the same parquet tables. Determinism rules:
  *   - doubles are aggregated as DECIMAL(12,2) (exact, order-independent)
  *     and cast back to double;
  *   - all outputs ORDER BY a unique key;
  *   - integer-typed outputs are cast so Spark/DuckDB parquet types agree.
  */
object SparkEntry {
  import graft.model.IndexModel

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.pricingSummary(Tables(spark, "/root/testdata/sf0.001"))

  private def idx(s: SparkSession, dir: String): DataFrame =
    IndexModel.fromEvents(Tables(s, dir).events)

  private def qs(s: SparkSession, dir: String): QueryService =
    QueryService(idx(s, dir))

  private val T1 = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
  private val T2 = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
  private val intervalProj =
    Seq("unique_id", "publish_time", "location_key", "location_position")

  private val orFilters: Seq[Map[String, FilterValue]] = Seq(
    Map("business_source_key" -> Eq("bsk1"),
      "publish_time" -> Cmp("gte", "2024-01-10 00:00:00")),
    Map("ordering_key" -> Eq(""), "additional_metadata.k" -> Cmp("gte", "50")))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- analytics / bench headliners --------------------------------------
    "q1_pricing_summary" -> ((s, dir) => Analytics.pricingSummary(Tables(s, dir))),
    "q3_shipping_priority" -> ((s, dir) => Analytics.shippingPriority(Tables(s, dir))),
    "q5_local_supplier_volume" -> ((s, dir) => Analytics.localSupplierVolume(Tables(s, dir))),
    "q_top_customers_per_nation" -> ((s, dir) => Analytics.topCustomersPerNation(Tables(s, dir))),
    // -- index model + query surface (SURVEY §2.1 S7-S10, §2.3 T4/T5, §2.5 A1-A3)
    "q_idx_build" -> ((s, dir) =>
      IndexModel.fromEventsFlat(Tables(s, dir).events).orderBy(col("unique_id"))),
    "q_idx_point_lookup" -> { (s, dir) =>
      val service = qs(s, dir)
      val id = service.index.agg(min(col("unique_id"))).head().getString(0)
      service.get(id, intervalProj)
    },
    "q_idx_multi_id" -> { (s, dir) =>
      val service = qs(s, dir)
      val ids = service.index.groupBy(col("broker_id"))
        .agg(min(col("unique_id")).as("id")).collect().map(_.getString(1)).toSeq
      service.getAll(ids, Seq("unique_id", "broker_id", "location_key"))
        .orderBy(col("unique_id"))
    },
    "q_idx_interval" -> ((s, dir) =>
      qs(s, dir).getAllInInterval(T1, T2, "t-click", limit = 20, offset = 40,
        attrs = intervalProj)),
    "q_idx_count_interval" -> ((s, dir) => qs(s, dir).countInInterval(T1, T2, "t-click")),
    "q_idx_query_or" -> ((s, dir) =>
      qs(s, dir).getQueried(orFilters, limit = 50, offset = 0,
        attrs = Seq("unique_id", "business_source_key", "ordering_key", "meta_k"))),
    "q_idx_count_query" -> ((s, dir) => qs(s, dir).countQueried(orFilters)),
    // -- persist-side projections (SURVEY §2.3 T1/T2/T9/T14, §2.2 K5, §2.5 A8)
    "q_persist_partition" -> { (s, dir) =>
      val ev = Tables(s, dir).events
      val mask = Persist.parseMask("year/month/day/hour/{et}")
      val withCols = Persist.withPartitionColumns(
        ev, mask, col("ts"),
        Map("et" -> when(col("event_type") === "view", lit(null).cast("string"))
          .otherwise(col("event_type"))))
      withCols
        .withColumn("path", Persist.partitionPath("gs://graft/events", mask))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("path"))
    },
    "q_version_batching" -> { (s, dir) =>
      val ev = Tables(s, dir).events
      val versioned = Persist.withVersionColumns(ev, Map(
        "v_color" -> when(col("event_id") % 4 === 0, lit("blue"))
          .when(col("event_id") % 4 === 1, lit("red"))
          .when(col("event_id") % 4 === 3, lit("yellow")),
        "v_spin" -> when(col("user_id") % 2 === 0, lit("left")).otherwise(lit("right"))))
      versioned.groupBy(col("v_color"), col("v_spin"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("v_color"), col("v_spin"))
    },
    "q_dead_letter" -> { (s, dir) =>
      val index = idx(s, dir)
      Persist.deadLetter(
        index.filter(col("business_source_key").isNull),
        col("unique_id"),
        "validation_error",
        concat(lit("missing required field business_source_key for "), col("broker_msg_id")),
        "indexer"
      ).orderBy(col("unique_id"))
    },
    "q_error_dedup" -> { (s, dir) =>
      val failures = idx(s, dir).filter(col("business_source_key").isNull)
      Replay.errorCounts(
        failures,
        concat(lit("missing field on broker "), col("broker_id")))
        .orderBy(col("message"))
    },
    "q_size_calc" -> { (s, dir) =>
      val ev = Tables(s, dir).events
      ev.withColumn("broker_id", concat(lit("t-"), col("event_type")))
        .withColumn("size", Persist.messageSize(
          col("props").cast("binary"),
          map(lit("k"), get_json_object(col("props"), "$.k"),
            lit("et"), col("event_type"))))
        .groupBy(col("broker_id"))
        .agg(sum(col("size")).as("total_bytes"), count(lit(1)).as("n"))
        .orderBy(col("broker_id"))
    },
    "q_good_bad_split" -> { (s, dir) =>
      val index = idx(s, dir)
      val failedIds = index
        .filter(col("broker_msg_id").cast("long") % 7 === 0)
        .select("unique_id")
      val (good, bad) = Persist.goodBadSplit(index, failedIds, "unique_id")
      val g = good.groupBy(col("broker_id")).agg(count(lit(1)).as("n_good"))
      val b = bad.groupBy(col("broker_id")).agg(count(lit(1)).as("n_bad"))
      g.join(b, Seq("broker_id"), "full_outer")
        .select(col("broker_id"),
          coalesce(col("n_good"), lit(0L)).as("n_good"),
          coalesce(col("n_bad"), lit(0L)).as("n_bad"))
        .orderBy(col("broker_id"))
    },
    // -- replay pipeline (SURVEY §2.4 J1/J2, §2.3 T13, §2.6 W6)
    "q_fetch_jobs" -> ((s, dir) =>
      Replay.fetchJobs(idx(s, dir)).orderBy(col("location_key"))),
    "q_positional_join" -> { (s, dir) =>
      val t = Tables(s, dir)
      val records = IndexModel.recordsFromEvents(t.events)
      val slice = QueryService(idx(s, dir)).index.filter(
        col("publish_time") >= lit(T1) && col("publish_time") < lit(T2) &&
          col("broker_id") === "t-purchase")
      Replay.positionalJoin(records, slice, broadcastIndex = true)
        .select("unique_id", "location_key", "location_position", "payload")
        .orderBy(col("unique_id"))
    },
    "q_ordering_groups" -> ((s, dir) =>
      Replay.orderingGroups(idx(s, dir)).orderBy(col("ordering_key"))),
    "q_repackage_metadata" -> { (s, dir) =>
      Replay.repackagedMetadata(idx(s, dir))
        .select(col("unique_id"),
          concat_ws(",",
            transform(array_sort(map_entries(col("attributes"))),
              e => concat(e.getField("key"), lit("="), e.getField("value"))))
            .as("attrs_flat"))
        .orderBy(col("unique_id"))
    }
  )

  /** DuckDB CTE building the identical index table from `events` — keep in
    * lockstep with [[graft.model.IndexModel.fromEvents]].
    */
  private val IndexCte =
    """WITH idx AS (
      |  SELECT
      |    't-' || event_type AS broker_id,
      |    CAST(event_id AS VARCHAR) AS broker_msg_id,
      |    't-' || event_type || '_' || CAST(event_id AS VARCHAR) AS unique_id,
      |    CASE WHEN user_id % 5 = 0 THEN NULL
      |         ELSE 'bsk' || CAST(user_id % 5 AS VARCHAR) END AS business_source_key,
      |    'bok' || CAST(event_id % 10 AS VARCHAR) AS business_object_key,
      |    CASE WHEN user_id % 5 = 0 THEN NULL
      |         ELSE 'bsk' || CAST(user_id % 5 AS VARCHAR) || '_bok' || CAST(event_id % 10 AS VARCHAR)
      |         END AS index_source_key,
      |    CASE WHEN user_id % 3 = 0 THEN ''
      |         ELSE 'u' || CAST(user_id AS VARCHAR) END AS ordering_key,
      |    json_extract_string(props, '$.k') AS meta_k,
      |    'gs://graft/events/blob-' || CAST(event_id // 100 AS VARCHAR) AS location_key,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_id // 100 ORDER BY event_id) AS BIGINT)
      |      AS location_position,
      |    ts AS publish_time,
      |    ts + INTERVAL 1 SECOND AS ingestion_time,
      |    FALSE AS confirmation_flag
      |  FROM events
      |)""".stripMargin

  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_persist_partition" ->
      """SELECT 'gs://graft/events/' || strftime(ts, '%Y') || '/' || strftime(ts, '%m')
        |       || '/' || strftime(ts, '%d') || '/' || strftime(ts, '%H') || '/'
        |       || CASE WHEN event_type = 'view' THEN 'unknown' ELSE event_type END AS path,
        |       COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_version_batching" ->
      """SELECT CASE WHEN event_id % 4 = 0 THEN 'blue'
        |            WHEN event_id % 4 = 1 THEN 'red'
        |            WHEN event_id % 4 = 3 THEN 'yellow'
        |            ELSE 'unknown' END AS v_color,
        |       CASE WHEN user_id % 2 = 0 THEN 'left' ELSE 'right' END AS v_spin,
        |       COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_dead_letter" ->
      s"""$IndexCte
         |SELECT unique_id,
         |       'validation_error' AS dead_letter_error_category,
         |       'missing required field business_source_key for ' || broker_msg_id
         |         AS dead_letter_error_reason,
         |       'indexer' AS dead_letter_error_source
         |FROM idx WHERE business_source_key IS NULL
         |ORDER BY unique_id""".stripMargin,
    "q_error_dedup" ->
      s"""$IndexCte
         |SELECT 'missing field on broker ' || broker_id AS message, COUNT(*) AS n
         |FROM idx WHERE business_source_key IS NULL
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_size_calc" ->
      """SELECT 't-' || event_type AS broker_id,
        |       CAST(SUM(octet_length(encode(props))
        |                + 1 + length(json_extract_string(props, '$.k'))
        |                + 2 + length(event_type)) AS BIGINT) AS total_bytes,
        |       COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_good_bad_split" ->
      s"""$IndexCte
         |SELECT broker_id,
         |       CAST(SUM(CASE WHEN CAST(broker_msg_id AS BIGINT) % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
         |       CAST(SUM(CASE WHEN CAST(broker_msg_id AS BIGINT) % 7 =  0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
         |FROM idx GROUP BY broker_id ORDER BY broker_id""".stripMargin,
    "q_fetch_jobs" ->
      s"""$IndexCte
         |SELECT location_key, COUNT(*) AS n_records,
         |       MIN(location_position) AS min_pos, MAX(location_position) AS max_pos
         |FROM idx GROUP BY location_key ORDER BY location_key""".stripMargin,
    "q_positional_join" ->
      s"""$IndexCte, records AS (
         |  SELECT 'gs://graft/events/blob-' || CAST(event_id // 100 AS VARCHAR) AS location_key,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY event_id // 100 ORDER BY event_id) AS BIGINT)
         |           AS location_position,
         |         props AS payload
         |  FROM events)
         |SELECT unique_id, location_key, location_position, payload
         |FROM records JOIN idx USING (location_key, location_position)
         |WHERE publish_time >= TIMESTAMP '2024-01-05 00:00:00'
         |  AND publish_time <  TIMESTAMP '2024-01-15 00:00:00'
         |  AND broker_id = 't-purchase'
         |ORDER BY unique_id""".stripMargin,
    "q_ordering_groups" ->
      s"""$IndexCte
         |SELECT ordering_key, COUNT(*) AS n,
         |       string_agg(unique_id, ',' ORDER BY location_key, location_position, unique_id)
         |         AS publish_order
         |FROM idx GROUP BY ordering_key ORDER BY ordering_key""".stripMargin,
    "q_repackage_metadata" ->
      s"""$IndexCte
         |SELECT unique_id,
         |       'business_object_key=' || business_object_key
         |       || CASE WHEN business_source_key IS NULL THEN ''
         |               ELSE ',business_source_key=' || business_source_key END
         |       || CASE WHEN meta_k IS NULL THEN '' ELSE ',k=' || meta_k END
         |       || CASE WHEN ordering_key = '' THEN ''
         |               ELSE ',ordering_key=' || ordering_key END AS attrs_flat
         |FROM idx ORDER BY unique_id""".stripMargin,
    "q_idx_build" ->
      s"""$IndexCte
         |SELECT * FROM idx ORDER BY unique_id""".stripMargin,
    "q_idx_point_lookup" ->
      s"""$IndexCte
         |SELECT unique_id, publish_time, location_key, location_position
         |FROM idx WHERE unique_id = (SELECT min(unique_id) FROM idx)""".stripMargin,
    "q_idx_multi_id" ->
      s"""$IndexCte
         |SELECT unique_id, broker_id, location_key FROM idx
         |WHERE unique_id IN (SELECT min(unique_id) FROM idx GROUP BY broker_id)
         |ORDER BY unique_id""".stripMargin,
    "q_idx_interval" ->
      s"""$IndexCte
         |SELECT unique_id, publish_time, location_key, location_position
         |FROM idx
         |WHERE publish_time >= TIMESTAMP '2024-01-05 00:00:00'
         |  AND publish_time <  TIMESTAMP '2024-01-15 00:00:00'
         |  AND broker_id = 't-click'
         |ORDER BY unique_id LIMIT 20 OFFSET 40""".stripMargin,
    "q_idx_count_interval" ->
      s"""$IndexCte
         |SELECT COUNT(*) AS cnt FROM idx
         |WHERE publish_time >= TIMESTAMP '2024-01-05 00:00:00'
         |  AND publish_time <  TIMESTAMP '2024-01-15 00:00:00'
         |  AND broker_id = 't-click'""".stripMargin,
    "q_idx_query_or" ->
      s"""$IndexCte
         |SELECT unique_id, business_source_key, ordering_key, meta_k FROM idx
         |WHERE (business_source_key = 'bsk1'
         |       AND publish_time >= TIMESTAMP '2024-01-10 00:00:00')
         |   OR (ordering_key = '' AND meta_k >= '50')
         |ORDER BY unique_id LIMIT 50""".stripMargin,
    "q_idx_count_query" ->
      s"""$IndexCte
         |SELECT COUNT(*) AS cnt FROM idx
         |WHERE (business_source_key = 'bsk1'
         |       AND publish_time >= TIMESTAMP '2024-01-10 00:00:00')
         |   OR (ordering_key = '' AND meta_k >= '50')""".stripMargin,
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM($discPrice) AS DOUBLE) AS sum_disc_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,
    "q5_local_supplier_volume" ->
      s"""SELECT n_name, CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_top_customers_per_nation" ->
      """SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey, c_acctbal,
        |       CAST(rnk AS BIGINT) AS rnk
        |FROM (
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |         ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |                            ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |  FROM customer)
        |WHERE rnk <= 3
        |ORDER BY c_nationkey, rnk""".stripMargin
  )
}
