package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Query-surface tests: filter compilation (whitelist, operators,
  * timestamp coercion — indexer-api/lib/util.go:122-285), deterministic
  * pagination (A3), interval guard, and the large-ID-set semi-join (J4).
  */
class QueryServiceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val index = {
    val rows = (1 to 30).map { i =>
      (f"id_$i%03d", s"b${i % 3}", ts(f"2024-01-${i % 28 + 1}%02d 00:00:00"),
        ts(f"2024-01-${i % 28 + 1}%02d 00:00:01"),
        if (i % 4 == 0) "" else s"u$i", s"${i * 7 % 100}",
        Map("k" -> s"${i * 7 % 100}"), s"blob-${i / 10}", (i % 10 + 1).toLong)
    }
    rows.toDF("unique_id", "broker_id", "publish_time", "ingestion_time",
      "ordering_key", "meta_k", "additional_metadata", "location_key",
      "location_position")
  }

  private lazy val svc = QueryService(index)

  test("get returns exactly the point row with projection") {
    val out = svc.get("id_007", Seq("unique_id", "broker_id")).collect()
    assert(out.length === 1 && out.head.toSeq === Seq("id_007", "b1"))
  }

  test("getAll and getAllJoin agree on the same ID set (J4)") {
    val ids = Seq("id_001", "id_010", "id_020")
    val viaIn = svc.getAll(ids, Seq("unique_id")).collect().map(_.getString(0)).sorted
    val viaJoin = svc.getAllJoin(ids.toDF("unique_id"), Seq("unique_id"))
      .collect().map(_.getString(0)).sorted
    assert(viaIn === ids.toArray && viaJoin === ids.toArray)
  }

  test("pagination is deterministic by unique_id and offset skips exactly") {
    val all = svc.getQueried(Seq(Map("broker_id" -> Cmp("ne", "zzz"))),
      limit = 30, offset = 0, attrs = Seq("unique_id"))
      .collect().map(_.getString(0))
    val page = svc.getQueried(Seq(Map("broker_id" -> Cmp("ne", "zzz"))),
      limit = 5, offset = 7, attrs = Seq("unique_id"))
      .collect().map(_.getString(0))
    assert(all.toSeq === all.sorted.toSeq)
    assert(page.toSeq === all.slice(7, 12).toSeq)
  }

  test("pagination works when the projection omits unique_id") {
    val out = svc.getQueried(Seq(Map("broker_id" -> Eq("b1"))),
      limit = 3, offset = 2, attrs = Seq("broker_id"))
    assert(out.columns.toSeq === Seq("broker_id"))
    assert(out.collect().length === 3)
  }

  test("interval scan enforces [from,to) on publish_time and broker equality") {
    val out = svc.getAllInInterval(
      ts("2024-01-05 00:00:00"), ts("2024-01-10 00:00:00"), "b1",
      limit = 100, offset = 0, attrs = Seq("unique_id", "publish_time"))
      .collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val t = r.getTimestamp(1)
      !t.before(ts("2024-01-05 00:00:00")) && t.before(ts("2024-01-10 00:00:00"))
    })
  }

  test("interval upper bound in the future is rejected like the API layer") {
    intercept[IllegalArgumentException] {
      svc.getAllInInterval(ts("2024-01-01 00:00:00"), ts("2999-01-01 00:00:00"), "b1")
    }
  }

  test("filter keys outside the whitelist are rejected (T12)") {
    intercept[IllegalArgumentException] {
      svc.compile(Seq(Map("no_such_attr" -> Eq("x"))))
    }
  }

  test("unsupported comparison operators are rejected") {
    intercept[IllegalArgumentException] {
      index.filter(svc.compile(Seq(Map("broker_id" -> Cmp("regex", "x"))))).collect()
    }
  }

  test("additional_metadata.k rewrites to the materialized meta_k column (T11/T12)") {
    val viaMap = svc.getQueried(
      Seq(Map("additional_metadata.k" -> Cmp("gte", "50"))),
      limit = 100, attrs = Seq("unique_id")).collect().map(_.getString(0)).sorted
    val viaCol = index.filter(col("meta_k") >= "50")
      .select("unique_id").collect().map(_.getString(0)).sorted
    assert(viaMap === viaCol && viaMap.nonEmpty)
  }

  test("plan audit: interval + meta_k predicates push down to the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idxstore").toString
    index.write.partitionBy("broker_id").parquet(s"$dir/index")
    val stored = QueryService(spark.read.parquet(s"$dir/index"))
    val q = stored.getAllInInterval(
      ts("2024-01-05 00:00:00"), ts("2024-01-10 00:00:00"), "b1",
      limit = 100, offset = 0, attrs = Seq("unique_id", "publish_time"))
    val plan = q.queryExecution.executedPlan.toString
    // data filter reaches the file source; partition column prunes dirs
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThanOrEqual(publish_time"), plan)
    assert(plan.contains("PartitionFilters:") && plan.contains("broker_id"), plan)
    // the materialized-meta rewrite makes a former map probe pushable too
    val metaPlan = stored.getQueried(
      Seq(Map("additional_metadata.k" -> Cmp("gte", "50"))),
      limit = 10, attrs = Seq("unique_id"))
      .queryExecution.executedPlan.toString
    assert(metaPlan.contains("GreaterThanOrEqual(meta_k,50)"), metaPlan)
    // projection pruning: only referenced columns leave the scan
    assert("ReadSchema: [^\\n]*unique_id".r.findFirstIn(plan).isDefined, plan)
    assert(!"ReadSchema: [^\\n]*location_key".r.findFirstIn(plan).isDefined, plan)
  }

  test("engine-level MetaKeyRewrite pushes a raw map probe into the scan") {
    // no QueryService: a raw DataFrame predicate on the map column, the
    // query a user who never read the materialization convention writes
    val dir = java.nio.file.Files.createTempDirectory("graft-extrule").toString
    index.write.parquet(s"$dir/index")
    val raw = spark.read.parquet(s"$dir/index")
      .filter(element_at(col("additional_metadata"), "k") >= "50")
      .select("unique_id")
    val optimized = raw.queryExecution.optimizedPlan.toString
    assert(optimized.contains("meta_k"), optimized)
    val plan = raw.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(meta_k,50)"), plan)
    // semantics unchanged vs the unrewritable form (map probe post-scan)
    val expected = index.filter(col("meta_k") >= "50")
      .select("unique_id").collect().map(_.getString(0)).sorted
    assert(raw.collect().map(_.getString(0)).sorted === expected)
    // no meta_<key> sibling in scope → the rule must leave the probe alone
    val unrewritable = spark.read.parquet(s"$dir/index")
      .drop("meta_k")
      .filter(element_at(col("additional_metadata"), "k") >= "50")
      .select("unique_id")
    assert(unrewritable.collect().map(_.getString(0)).sorted === expected)
  }

  test("countInIntervalCached memoizes through the process-wide cache (A4)") {
    val n1 = svc.countInIntervalCached(
      ts("2024-01-05 00:00:00"), ts("2024-01-10 00:00:00"), "b1")
    assert(QueryService.countCache.contains(
      "2024-01-10 00:00:00.0_2024-01-05 00:00:00.0_b1"))
    val n2 = svc.countInIntervalCached(
      ts("2024-01-05 00:00:00"), ts("2024-01-10 00:00:00"), "b1")
    assert(n1 === n2)
  }

  test("timestamp string literals coerce on timestamp attributes (T11)") {
    val n = svc.countQueried(Seq(Map(
      "publish_time" -> Cmp("gte", "2024-01-10 00:00:00"),
      "publish_time" -> Cmp("gte", "2024-01-10 00:00:00")))).head().getLong(0)
    val expect = index.filter(col("publish_time") >= lit(ts("2024-01-10 00:00:00"))).count()
    assert(n === expect)
  }
}
