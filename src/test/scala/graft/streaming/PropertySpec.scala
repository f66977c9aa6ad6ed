package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** Randomized (seeded) property checks of the pure cores the operators
  * rest on: the incremental session fold against a naive specification
  * under arbitrary split points, and the h60 portable hash's
  * JVM/Catalyst agreement (every DuckDB oracle comparison in the suite
  * rests on that equality).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("session fold matches the naive gap-split spec on 200 random inputs") {
    val rnd = new scala.util.Random(3L)
    for (_ <- 1 to 200) {
      val gap = rnd.nextLong(49L) + 1
      val sorted = Seq.fill(rnd.nextInt(40))(rnd.nextLong(500L)).sorted
      // naive spec: walk sorted times, split where the gap is reached
      val naive = sorted.foldLeft(List.empty[List[Long]]) {
        case (acc, t) =>
          acc match {
            case cur :: rest if t - cur.last < gap => (cur :+ t) :: rest
            case _ => List(t) :: acc
          }
      }.reverse.map(run => (run.head, run.last + gap, run.length.toLong))
      val (closed, open) = Sessions.fold(1L, None, sorted.iterator, gap)
      val folded = (closed ++ open.map(Sessions.close(1L, _, gap)))
        .map(s => (micros(s.session_start), micros(s.session_end), s.n_events))
      assert(folded === naive, s"gap=$gap times=$sorted")
    }
  }

  test("session fold is incremental: any split point gives the same sessions") {
    val rnd = new scala.util.Random(5L)
    for (_ <- 1 to 200) {
      val gap = rnd.nextLong(49L) + 1
      val sorted = Seq.fill(rnd.nextInt(40))(rnd.nextLong(500L)).sorted
      val k = if (sorted.isEmpty) 0 else rnd.nextInt(sorted.length + 1)
      val (a, b) = sorted.splitAt(k)
      val (c1, o1) = Sessions.fold(1L, None, a.iterator, gap)
      val (c2, o2) = Sessions.fold(1L, o1, b.iterator, gap)
      val (cAll, oAll) = Sessions.fold(1L, None, sorted.iterator, gap)
      assert(c1 ++ c2 === cAll, s"gap=$gap k=$k times=$sorted")
      assert(o2 === oAll)
    }
  }

  test("cross-batch disorder: late events regress, bridge, or precede the open session") {
    def micros2(t: java.sql.Timestamp) = micros(t)
    // batch 1 leaves open session [100, 110] (gap 20)
    val (c0, o0) = Sessions.fold(1L, None, Iterator(100L, 110L), 20L)
    assert(c0.isEmpty && o0 === Some(Sessions.OpenSession(100L, 110L, 2)))
    // (a) a late event within gap BEFORE start regresses the start
    val (c1, o1) = Sessions.fold(1L, o0, Iterator(90L), 20L)
    assert(c1.isEmpty && o1 === Some(Sessions.OpenSession(90L, 110L, 3)))
    // (b) two late bursts: one separate (closed), one bridging into open
    val (c2, o2) = Sessions.fold(1L, o0, Iterator(10L, 15L, 95L), 20L)
    assert(c2.map(s => (micros2(s.session_start), micros2(s.session_end), s.n_events))
      === List((10L, 35L, 2L)))
    assert(o2 === Some(Sessions.OpenSession(95L, 110L, 3)))
    // (c) a late interval bridging two new bursts and the open session
    val (c3, o3) = Sessions.fold(1L, Some(Sessions.OpenSession(100L, 110L, 2)),
      Iterator(50L, 65L, 82L), 20L)
    assert(c3.isEmpty && o3 === Some(Sessions.OpenSession(50L, 110L, 5)))
  }

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000

  test("h60 column expression equals the JVM-side hash on random ASCII strings") {
    val rnd = new scala.util.Random(7L)
    val strings = Seq.fill(200)(
      rnd.alphanumeric.take(rnd.nextInt(40) + 1).mkString) :+ "" :+ "a b  c"
    val fromSpark = strings.toDF("s")
      .select(col("s"), TextFunctions.h60(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strings.foreach { s =>
      assert(fromSpark(s) === TextFunctions.h60Jvm(s), s"h60 mismatch for '$s'")
    }
  }

  test("range join equals the naive scan across random interval sets and widths") {
    import graft.operators.RangeJoin
    val rnd = new scala.util.Random(11L)
    val probes = Seq.fill(300)(rnd.nextLong(1000L)).toDF("v")
    val ivs = Seq.fill(60) {
      val s = rnd.nextLong(1000L)
      (s, s + 1 + rnd.nextLong(200L), rnd.nextInt(1000000))
    }.toDF("s", "e", "tag")
    val naive = probes.crossJoin(ivs)
      .filter(col("v") >= col("s") && col("v") < col("e"))
      .select("v", "tag").as[(Long, Int)].collect().sorted.toSeq
    for (width <- Seq(1L, 7L, 64L, 1024L)) {
      val got = RangeJoin.byBucket(probes, "v", ivs, "s", "e", width)
        .select("v", "tag").as[(Long, Int)].collect().sorted.toSeq
      assert(got === naive, s"bucketWidth=$width")
    }
    assert(naive.nonEmpty)
  }

  test("waterFill closed form equals greedy unit-by-unit max-min filling on random inputs") {
    import graft.operators.Curate
    val rnd = new scala.util.Random(11L)
    for (trial <- 1 to 15) {
      val n = rnd.nextInt(11) + 2
      val caps = (0 until n).map(i => (f"k$i%02d", rnd.nextLong(60L)))
      val budget = rnd.nextLong(caps.map(_._2).sum + 50L)
      // greedy max-min spec: one token at a time to the unfilled key with
      // the smallest (alloc, cap, key) — the DEFINITION of max-min
      // fairness (the allocation MULTISET is tie-break-independent),
      // sequenced under the operator's documented spill convention
      // (remainder to the smallest-capacity unfilled keys first);
      // independent of the closed form under test
      val alloc = scala.collection.mutable.Map(caps.map(c => c._1 -> 0L): _*)
      val capM = caps.toMap
      var left = budget
      var pool = caps.collect { case (k, c) if c > 0 => k }.toSet
      while (left > 0 && pool.nonEmpty) {
        val k = pool.minBy(k => (alloc(k), capM(k), k))
        alloc(k) += 1; left -= 1
        if (alloc(k) == capM(k)) pool -= k
      }
      val got = Curate.waterFill(caps.toDF("key", "cap"), budget)
        .select("key", "alloc").as[(String, Long)].collect().toMap
      assert(got === alloc.toMap, s"trial $trial caps=$caps budget=$budget")
    }
  }

  test("ED-Join candidate generation is complete on random ≤d-edit mutations") {
    // The prefix principle (Xiao VLDB'08) claims ED ≤ d pairs always share
    // a token inside both (d·q+1)-sized rarest-first prefixes — checked
    // END-TO-END through editDistancePairs: its verify stage is exact, so
    // any true pair missing from the output can only mean candidate
    // generation (prefix size, df order, occ tagging, or length bucketing)
    // dropped it. Each trial draws a fresh corpus, hence a fresh global df
    // order; the tiny alphabet forces repeated grams (occ paths) and heavy
    // df collisions; insert/delete mutations walk pairs across length
    // buckets. Shrinking the prefix to d·q or breaking the shared total
    // order makes this red (hand-verified while writing it).
    import graft.operators.Dedup
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val rnd = new scala.util.Random(1414L)
    val d = 3; val q = 3; val minLen = (d + 1) * q // 12
    val alphabet = "abcdefgh"
    def randStr(n: Int) =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (1 to edits).foreach { _ =>
        val pos = rnd.nextInt(cur.length)
        val ch = alphabet(rnd.nextInt(alphabet.length)).toString
        cur = rnd.nextInt(3) match {
          case 0 => cur.substring(0, pos) + ch + cur.substring(pos + 1)
          case 1 => cur.substring(0, pos) + ch + cur.substring(pos)
          case 2 if cur.length > minLen =>
            cur.substring(0, pos) + cur.substring(pos + 1)
          case _ => cur.substring(0, pos) + ch + cur.substring(pos + 1)
        }
      }
      cur
    }
    for (trial <- 1 to 5) {
      val bases = (0 until 24).map(i =>
        (i.toLong, randStr(minLen + rnd.nextInt(28))))
      val mutants = bases.map { case (id, s) =>
        (1000L + id, mutate(s, 1 + rnd.nextInt(d))) }
      val all = (bases ++ mutants).filter(_._2.length >= minLen)
      val out = Dedup.editDistancePairs(all.toDF("doc_id", "text"), d, q)
        .as[(Long, Long, Long)].collect().toSet
      val truth = (for {
        (a, sa) <- all; (b, sb) <- all if a < b
        dist = lev(sa, sb) if dist <= d
      } yield (a, b, dist.toLong)).toSet
      assert(out === truth,
        s"trial $trial: missing=${(truth -- out).take(3)} extra=${(out -- truth).take(3)}")
      assert(truth.nonEmpty) // every trial plants real ≤d pairs
    }
  }
}
