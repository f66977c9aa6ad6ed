package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout tests: the bit interleave against a JVM reference, and
  * the actual locality win — a 2-D rectangle query touches far fewer
  * Z-order buckets than row-order buckets of the same granularity.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton encode: bit i of x → 2i, bit i of y → 2i+1. */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zorderKey matches the bit-by-bit Morton reference") {
    assert(mortonRef(3, 5) === 39L) // x bits 0,2 → 5; y bits 0,2 → 34
    val pairs = (0 until 200).map { i =>
      (graft.functions.TextFunctions.h60Jvm(s"zx|$i") & 0xFFFF,
        graft.functions.TextFunctions.h60Jvm(s"zy|$i") & 0xFFFF)
    }
    val got = pairs.toDF("x", "y")
      .select(Layout.zorderKey(col("x"), col("y"))).as[Long].collect()
    assert(got.toSeq === pairs.map { case (x, y) => mortonRef(x, y) })
  }

  test("range bounds are ordered sample quantiles that balance a real write") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val n = 8
    val bounds = Layout.rangeBounds(li, col("l_orderkey"), n, sampleFrac = 0.3)
      .orderBy("split_no").as[(Long, Long)].collect()
    assert(bounds.length === n - 1)
    assert(bounds.map(_._2).toSeq === bounds.map(_._2).sorted.toSeq)
    // partition the FULL table by the planned bounds: split sizes land
    // within 2.5× of the ideal share (sample-quantile planning tolerance)
    val bs = bounds.map(_._2)
    val total = li.count().toDouble
    val sizes = (0 until n).map { i =>
      val lo = if (i == 0) Long.MinValue else bs(i - 1)
      val hi = if (i == n - 1) Long.MaxValue else bs(i)
      li.filter(col("l_orderkey") > lo && col("l_orderkey") <= hi).count()
    }
    assert(sizes.sum === total.toLong) // splits tile the table exactly
    val ideal = total / n
    assert(sizes.forall(s => s <= ideal * 2.5),
      s"unbalanced splits: ${sizes.mkString(",")} vs ideal $ideal")
    // determinism: planning twice yields identical bounds
    val again = Layout.rangeBounds(li, col("l_orderkey"), n, sampleFrac = 0.3)
      .orderBy("split_no").as[(Long, Long)].collect()
    assert(bounds.toSeq === again.toSeq)
    // any orderable key type: string keys plan too, bounds in the key's type
    val sBounds = Layout.rangeBounds(
      li.select(concat(lit("k"), lpad(col("l_orderkey").cast("string"), 8, "0")).as("sk")),
      col("sk"), 4, sampleFrac = 0.3)
      .orderBy("split_no").as[(Long, String)].collect()
    assert(sBounds.length === 3)
    assert(sBounds.map(_._2).toSeq === sBounds.map(_._2).sorted.toSeq)
  }

  test("rangeBounds never plans a global one-task Window (distributed prefix-sum rank)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .repartition(16) // many input partitions: the shape that would expose a global sort task
    // audit the UN-checkpointed twin: the public form truncates lineage
    // (localCheckpoint), which would make this assertion vacuous
    val unpinned = Layout.rangeBounds(li, col("l_orderkey"), 4,
      sampleFrac = 0.5, salt = "bounds", checkpoint = false)
    val plan = unpinned.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val got = unpinned.orderBy("split_no").as[(Long, Long)].collect()
    assert(got.length === 3)
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.toSeq)
    // the public checkpointed form computes the identical bounds
    val again = Layout.rangeBounds(li, col("l_orderkey"), 4, sampleFrac = 0.5)
      .orderBy("split_no").as[(Long, Long)].collect()
    assert(got.toSeq === again.toSeq)
  }

  test("zorder buckets prune a 2-D rectangle far better than row order") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    // rectangle over both dimensions (sf0.001: partkey ≤ ~200, suppkey ≤ ~10)
    val hit = col("l_partkey").between(1, 50) && col("l_suppkey").between(1, 5)
    // same bucket count (64) under both layouts; row order ≈ insertion order
    val zBucket = call_function("shiftright",
      Layout.zorderKey(col("l_partkey"), col("l_suppkey")), lit(8))
    val rowBucket = pmod(col("l_orderkey"), lit(64))
    val zTouched = li.filter(hit).select(zBucket.as("b")).distinct().count()
    val rowTouched = li.filter(hit).select(rowBucket.as("b")).distinct().count()
    assert(zTouched > 0)
    // row order scatters matches across ~all 64 buckets; Z-order confines
    // them to the rectangle's Z-ranges
    assert(zTouched * 2 <= rowTouched,
      s"zorder touched $zTouched buckets vs row-order $rowTouched")
    // bucket stats stay tight in BOTH dims: every bucket's x-range is a
    // sliver of the global domain (a 1-D sort would leave y unconstrained)
    val stats = Layout.zorderStats(li, col("l_partkey"), col("l_suppkey"), 8)
    val dom = li.agg(max("l_partkey"), max("l_suppkey")).head()
    val (xDom, yDom) = (dom.getLong(0), dom.getLong(1))
    val loose = stats
      .filter(col("n_rows") > 1)
      .filter((col("x_max") - col("x_min")) * 2 > xDom &&
        (col("y_max") - col("y_min")) * 2 > yDom)
      .count()
    assert(loose === 0, "a bucket spans more than half of BOTH dimensions")
  }

  test("assignShards gives every row the h60 shard and a contiguous 0-based position") {
    import graft.functions.TextFunctions.h60Jvm
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Layout.assignShards(docs, col("doc_id"), 8, "t1")
      .select("doc_id", "shard_no", "shard_pos")
      .as[(Long, Long, Long)].collect()
    assert(out.length === docs.count())
    out.foreach { case (id, shard, _) =>
      assert(shard === h60Jvm(s"$id|shard|t1") % 8)
    }
    // positions within a shard are exactly 0..n-1 in hash order
    out.groupBy(_._2).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._3)
      assert(byPos.map(_._3).toSeq === rows.indices.map(_.toLong))
      val hashes = byPos.map(r => h60Jvm(s"${r._1}|shard|t1"))
      assert(hashes.toSeq === hashes.sorted.toSeq)
    }
    intercept[IllegalArgumentException] {
      Layout.assignShards(docs.withColumn("shard_no", lit(1)), col("doc_id"), 8, "t1")
    }
  }

  test("shardBloomIndex replays from PortableBloom.positions; prune never misses a member") {
    import graft.functions.TextFunctions.h60Jvm
    import graft.functions.PortableBloom
    val m = 1024
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val assigned = Layout.assignShards(docs, col("doc_id"), 4, "bl")
    val bloom = Layout.shardBloomIndex(assigned, col("doc_id"), m)
    // the word table IS the JVM-computed bloom of each shard's members
    val members = assigned.select("doc_id", "shard_no")
      .as[(Long, Long)].collect().groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val expected = members.flatMap { case (shard, ids) =>
      val words = scala.collection.mutable.Map.empty[Long, Long]
      ids.foreach { id =>
        PortableBloom.positions(h60Jvm(id.toString), m, 6).distinct.foreach { pos =>
          words(pos >> 5) = words.getOrElse(pos >> 5, 0L) | (1L << (pos & 31))
        }
      }
      words.map { case (w, v) => (shard, w) -> v }
    }
    val got = bloom.as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === expected)
    // every member probe includes its true shard; absent keys prune shards
    val probes = docs.select(col("doc_id"))
      .unionByName(docs.select((col("doc_id") + 1000000000L).as("doc_id")))
    val cand = Layout.pruneShards(bloom, probes, col("doc_id"), m)
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    members.foreach { case (shard, ids) =>
      ids.foreach(id => assert(cand.getOrElse(id.toString, Set.empty).contains(shard),
        s"member $id missed its shard $shard"))
    }
    // absent keys: candidates are the documented false-positive tail, not
    // a full fan-out — on average well under half the shards
    val absent = docs.select((col("doc_id") + 1000000000L).cast("string"))
      .as[String].collect()
    val fanout = absent.map(k => cand.getOrElse(k, Set.empty).size.toDouble)
    assert(fanout.sum / fanout.length < 2.0,
      s"mean absent-key fan-out ${fanout.sum / fanout.length} of 4 shards")
  }

  test("shardManifest row replays from the members (count, mass, mod-prime fp)") {
    import graft.functions.TextFunctions.h60Jvm
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val assigned = Layout.assignShards(docs, col("doc_id"), 4, "t2")
    val manifest = Layout.shardManifest(assigned, col("doc_id"), col("n_chars"))
      .select("shard_no", "n_docs", "n_tokens", "fp_sum")
      .as[(Long, Long, Long, Long)].collect()
    val members = assigned.select("doc_id", "shard_no", "n_chars")
      .as[(Long, Long, Long)].collect().groupBy(_._2)
    assert(manifest.map(_._1).sorted.toSeq === members.keys.toSeq.sorted)
    manifest.foreach { case (shard, nDocs, mass, fp) =>
      val m = members(shard)
      assert(nDocs === m.length)
      assert(mass === m.map(_._3).sum)
      val expected = m.map(r => h60Jvm(r._1.toString) % 1000003L).sum
      assert(fp === expected)
    }
  }
}
