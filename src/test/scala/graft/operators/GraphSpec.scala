package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Link-graph operator tests: PageRank against a driver-side replay of the
  * integer recurrence, the regular-graph fixed point, and deep-iteration
  * plan health (the Iterate.checkpointed contract).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = Graph.RankScale

  /** Driver-side replay of the exact integer recurrence. */
  private def refRanks(
      edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = nodes.size.toLong
    val base = (15L * Scale) / (100L * n)
    var r = nodes.map(_ -> Scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .groupBy(_._2)
        .map { case (dst, es) =>
          dst -> es.map { case (src, _) => r(src) / outdeg(src) }.sum
        }
      r = nodes.map(v => v -> (base + 85L * contrib.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  test("pagerank matches the driver-side integer recurrence on a star graph") {
    val edges = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c")
    val sym = edges ++ edges.map(_.swap)
    val out = Graph.pagerank(
        Graph.symmetrize(edges.toDF("src", "dst")), iters = 3)
      .select("node", "rank_pp12").as[(String, Long)].collect().toMap
    assert(out === refRanks(sym.distinct, 3))
    // the hub holds the highest authority
    assert(out("a") === out.values.max)
  }

  test("pagerank is stationary at uniform on a regular graph") {
    // a 4-cycle (symmetrized): every node has degree 2 → uniform is the
    // exact fixed point of the integer recurrence too
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
    val out = Graph.pagerank(
        Graph.symmetrize(edges.toDF("src", "dst")), iters = 4)
      .select("node", "rank_pp12").as[(String, Long)].collect().toMap
    val u = Scale / 4
    val base = (15L * Scale) / (100L * 4)
    val expected = base + 85L * u / 100L
    assert(out.values.toSet === Set(expected))
  }

  test("dangling mass decays with a one-directional edge list (drop-dangling variant)") {
    // b has no out-edges: its rank never flows anywhere; a receives only
    // the teleport base after round 1
    val out = Graph.pagerank(Seq("a" -> "b").toDF("src", "dst"), iters = 2)
      .select("node", "rank_pp12").as[(String, Long)].collect().toMap
    val base = (15L * Scale) / (100L * 2)
    assert(out("a") === base)
    assert(out === refRanks(Seq("a" -> "b"), 2))
  }

  test("deep iteration keeps the plan flat (checkpointed rounds)") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a")
    val out = Graph.pagerank(Graph.symmetrize(edges.toDF("src", "dst")), iters = 12)
    // plan depth is O(1) regardless of rounds: the lineage was truncated
    assert(out.queryExecution.optimizedPlan.toString.linesIterator.size < 40)
    assert(out.count() === 3)
  }
}
