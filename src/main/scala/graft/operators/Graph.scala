package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph operators. A web-scale curation stack weights documents by
  * the authority of their origin (Common-Crawl-style domain ranking:
  * harmonic centrality / PageRank over the host graph feeds the quality
  * prior); this module provides that scoring as an iterative DataFrame
  * loop with the engine's exact-arithmetic replay discipline.
  */
object Graph {

  /** The fixed-point scale of [[pagerank]] ranks: parts-per-10^12. */
  val RankScale: Long = 1000000000000L

  /** Fixed-iteration PageRank over a directed edge list — every value a
    * BIGINT in parts-per-10^12, so each round is EXACT integer arithmetic
    * (floor divisions, integer sums) and the final table replays
    * bit-identically in any engine; no float enters the loop:
    *
    *   r0(v)   = SCALE DIV N
    *   r_i+1(v) = (15·SCALE) DIV (100·N)
    *            + (85 · Σ_{(u,v)∈E} r_i(u) DIV outdeg(u)) DIV 100
    *
    * (damping fixed at the standard 0.85, expressed as the 85/100
    * integer pair). Nodes and degrees derive from the edge list, so every
    * node has outdeg ≥ 1 when the caller supplies a symmetrized graph
    * (use [[symmetrize]]); dangling-node mass with a one-directional edge
    * list simply decays, the drop-dangling PageRank variant.
    *
    * Scale shape per round: one equi-join of the rank table onto the
    * edge list by src and one dst-keyed sum — the canonical power-
    * iteration shuffle pair, partitioned by node key (a hot page costs
    * its in-degree aggregation, partial-combined map-side). The loop
    * rides [[Iterate.checkpointed]], so plan depth stays bounded across
    * rounds (the iterative-loop convention) and at most two rank
    * generations hold storage. Output: (node, rank_pp12, rank) with
    * `rank` the double view rank_pp12 / 10^12 (a presentation column —
    * derived by one deterministic division from the exact value).
    */
  def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    // pinned for the loop's lifetime: every round re-scans the edge list,
    // and an un-persisted `edges` would re-run its upstream plan (joins,
    // symmetrize's union-distinct) once per round — the standard power-
    // iteration trade of storage for recomputation. Released in `finally`:
    // the returned frame reads only the final checkpointed rank table.
    // pre-partitioned by src so every round's rank join reuses this
    // partitioning from the cache (the rank side is the one that moves);
    // without it each round re-shuffles the full edge list
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
      val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
      // rank table joined with outdeg once up front: the join is on the
      // node key and the degree table is node-sized; nodes without
      // out-edges carry outdeg 0 and contribute nothing (dangling).
      // Checkpointed: every round re-reads this table, and without the pin
      // each round would redo the distinct-union + degree shuffles
      val degreed = nodes.join(deg, Seq("node"), "left")
        .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
        .localCheckpoint()
      // node count read off the ALREADY-materialized degreed table — a
      // separate nodes.count() would run the distinct-union + degree
      // shuffles a second time just to size the teleport term
      val n = degreed.count()
      require(n > 0, "edge list is empty")
      val base = (15L * RankScale) / (100L * n)
      // checkpoint CADENCE, not every round: plan depth stays bounded (≤ 4
      // join rounds between truncations — well inside analyzer comfort)
      // while consecutive rounds pipeline into one job instead of paying
      // an eager materialization barrier per round. The LAST round always
      // checkpoints: the returned frame must not depend on `e` once the
      // finally-block unpins it.
      val cadence = 4
      var ranks = degreed.withColumn("rank_pp12", lit(RankScale / n))
      var release: () => Unit = () => ()
      var sinceCp = 0
      for (i <- 1 to iters) {
        val contribs = e
          .join(ranks.filter(col("outdeg") > 0), e("src") === ranks("node"))
          .select(col("dst").as("node"),
            expr("rank_pp12 DIV outdeg").as("contrib"))
          .groupBy(col("node")).agg(sum(col("contrib")).as("s"))
        val next = degreed
          .join(contribs, Seq("node"), "left")
          .select(col("node"), col("outdeg"),
            (lit(base) + expr("(85 * coalesce(s, 0L)) DIV 100")).as("rank_pp12"))
        sinceCp += 1
        if (sinceCp >= cadence || i == iters) {
          val (cp, rel) = Iterate.checkpointed(next)
          release(); ranks = cp; release = rel; sinceCp = 0
        } else ranks = next
      }
      ranks.select(col("node"), col("rank_pp12"),
        (col("rank_pp12").cast("double") / lit(RankScale.toDouble)).as("rank"))
    } finally e.unpersist(blocking = false)
  }

  /** Undirected view of an edge list: both directions, distinct. */
  def symmetrize(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }
}
