package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.TextFunctions._

/** Document deduplication — the training-data-pipeline operators
  * (BASELINE.json north star), each designed for 100 TB:
  *
  *   - exact / fingerprint dedup: one hash-shuffle, no pairwise work;
  *   - MinHash-LSH: per-row signatures (no explode until the tiny band
  *     table), candidates only where a band collides, then exact-Jaccard
  *     verification of candidates only — the classic near-linear path;
  *   - n-gram Jaccard ground truth: AllPairs prefix-filtered inverted
  *     index (equi-join, never a cross join), exact output;
  *   - SimHash: per-row 60-bit signature; pigeonhole bit-chunk blocking
  *     (equi-join on signature chunks) makes pair enumeration near-linear
  *     while staying exactly equal to the all-pairs result.
  *
  * Every pair miner takes a `canonicalize` flag: signatures/scores depend
  * only on the shingle set (or signature), so docs with identical keys can
  * be collapsed to one representative before the pairwise work and
  * expanded afterwards — identical output, and the candidate join no
  * longer inflates by Σ group² on duplicate-heavy corpora (web crawls).
  * Leave it off (default) when keys are mostly unique: the extra
  * group/expand shuffles only pay for themselves when duplicate groups are
  * material.
  *
  * All hashing is the engine-portable h60 (md5-derived) so the DuckDB
  * oracle can replay the identical pipeline bit-for-bit.
  */
object Dedup {

  /** Exact duplicate groups keyed by md5 of the raw text. One shuffle
    * (window over the hash); canonical id = min doc_id of the group.
    */
  def exact(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    docs
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select("doc_id", "fp", "canonical_id", "group_size")
  }

  /** Bag-of-words fingerprint dedup: md5 over the sorted distinct token
    * set — catches reorderings that exact dedup misses.
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    docs
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(tokens(col("text")))))).as("fp"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select("doc_id", "fp", "canonical_id", "group_size")
  }

  /** Per-doc distinct shingle sets (docs with <3 tokens drop out).
    * Cached: the set feeds band/candidate generation AND both sides of
    * pair verification — without materialization Catalyst's project
    * collapsing would recompute the shingling per consumer (at 100 TB the
    * equivalent is persisting the signature table, the standard LSH shape).
    */
  private def shingleSets(docs: DataFrame): DataFrame =
    docs
      // tokens materialize in their OWN projection: shingles3's lambda
      // references the token array ~3·|shingles| times per row, and an
      // inlined tokenizer expression would re-split the text on every
      // reference (measured 144 tokenizations/row — a ~10× slowdown on the
      // whole dedup family). Multi-referenced non-cheap expressions are
      // exactly what CollapseProject refuses to merge, so the split stays
      // a single per-row evaluation.
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      // the <3-token drop runs on the TOKEN count (equivalent: shingles3
      // yields n−2 ≥ 1 shingles iff n ≥ 3) and BEFORE the shingle
      // projection — a `size(sh) > 0` filter on top would be pushed below
      // the project by Catalyst with the whole shingle expression
      // substituted in, evaluating the shingling twice per row
      .filter(size(col("toks")) >= 3)
      // sorted ONCE per document: candidate verification intersects with an
      // allocation-free merge scan instead of a per-pair hash set
      .select(col("doc_id"),
        array_sort(array_distinct(shingles3(col("toks")))).as("sh"))
      .cache()

  private def jaccardOf(cand: DataFrame, sets: DataFrame): DataFrame =
    jaccardOf(cand, sets, sets)

  private def jaccardOf(
      cand: DataFrame, setsA: DataFrame, setsB: DataFrame): DataFrame = {
    val a = setsA.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = setsB.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val inter = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.expressions.SortedIntersectCount(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("sh_a")),
        org.apache.spark.sql.graft.ColumnBridge.expression(col("sh_b"))))
    cand
      .join(a, "doc_a")
      .join(b, "doc_b")
      .withColumn("jaccard",
        inter.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - inter).cast("double"))
      .select("doc_a", "doc_b", "jaccard")
  }

  // ------------------------------------------------- canonicalization layer

  /** All a<b pairs within one sorted id array, as structs. */
  private def intraPairs(ms: Column): Column =
    flatten(transform(ms, (a, i) =>
      transform(slice(ms, i + 2, size(ms)),
        b => struct(a.as("doc_a"), b.as("doc_b")))))

  /** One group per distinct key (set fingerprint or signature):
    * representative id (min), sorted member list, carried columns.
    */
  private def canonicalGroups(keyed: DataFrame, key: String, carry: Seq[String]): DataFrame =
    keyed
      .groupBy(col(key))
      .agg(
        min(col("doc_id")).as("rep_id"),
        array_sort(collect_list(col("doc_id"))).as("members")
          +: carry.map(c => first(col(c)).as(c)): _*)
      .cache()

  /** Expand representative-level pairs to all member pairs, carrying the
    * score columns (group members share the representative's score by
    * construction); groups are disjoint so least/greatest orders the ids.
    */
  private def expandPairs(
      repPairs: DataFrame, groups: DataFrame, scores: Seq[String]): DataFrame = {
    val mA = groups.select(col("rep_id").as("doc_a"), col("members").as("ms_a"))
    val mB = groups.select(col("rep_id").as("doc_b"), col("members").as("ms_b"))
    repPairs
      .join(mA, "doc_a")
      .join(mB, "doc_b")
      .select(explode(flatten(transform(col("ms_a"), x =>
        transform(col("ms_b"), y =>
          struct(least(x, y).as("doc_a"), greatest(x, y).as("doc_b")))))).as("p")
        +: scores.map(col): _*)
      .select(col("p.doc_a") +: col("p.doc_b") +: scores.map(col): _*)
  }

  /** Mine pairs per representative of each distinct `key` (duplicate-heavy
    * corpora), expanding back to members; `identical` is the score a
    * same-key pair gets, `score` the mined score column. Output is
    * identical to running the miner directly (the score depends only on
    * the key).
    */
  private def canonicalMined(
      keyed: DataFrame,
      key: String,
      carry: Seq[String],
      identical: Column,
      score: String)(mine: DataFrame => DataFrame): DataFrame = {
    // the miner consumes the carried columns, or the key itself when the
    // key IS the mined value (simhash)
    val mineCols = if (carry.isEmpty) Seq(key) else carry
    val groups = canonicalGroups(keyed, key, carry)
    val intra = groups
      .filter(size(col("members")) > 1)
      .select(explode(intraPairs(col("members"))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), identical.as(score))
    val reps = groups.select(col("rep_id").as("doc_id") +: mineCols.map(col): _*)
    expandPairs(mine(reps), groups, Seq(score)).unionByName(intra)
  }

  // ------------------------------------------------------------ pair miners

  /** Ground-truth near-duplicate pairs by word-3-gram Jaccard ≥ threshold.
    * Pairs come from an inverted shingle index (equi-join on shingle) —
    * never a cross join.
    *
    * `maxShingleDf` caps document frequency in the CANDIDATE index: a
    * shingle appearing in more than that many documents (a "stop shingle")
    * is dropped before the pair join, bounding the worst posting-list
    * blowup (hot-key skew) at the cost of missing pairs whose overlap is
    * exclusively hot shingles — at meaningful thresholds such pairs share
    * many shingles, so rare ones almost surely remain. None = exact.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      threshold: Double,
      maxShingleDf: Option[Int] = None,
      canonicalize: Boolean = false): DataFrame = {
    val sets = shingleSets(docs)

    // Hot-shingle set for the DF cap, computed over the FULL corpus (all
    // documents) regardless of canonicalization — under `canonicalize` the
    // candidate index holds one representative per distinct shingle set,
    // and a per-representative DF would undercount, capping fewer shingles
    // than direct mining does. With the corpus-level DF the candidate
    // discovery is identical either way; the one remaining difference is
    // intra-group pairs (identical sets), which the canonical path always
    // emits at jaccard 1.0 even when every shingle of the group is hot —
    // a strict recall improvement over direct capped mining, documented
    // here rather than reproduced.
    def hotShingles(cap: Int): DataFrame =
      sets.select(explode(col("sh")).as("shingle"))
        .groupBy(col("shingle"))
        .agg(count(lit(1)).as("df")).filter(col("df") > cap)
        .select("shingle")

    // Length (set-size) filter on the candidate join — J(A,B) ≥ t forces
    // t·max(|A|,|B|) ≤ |A∩B| ≤ min(|A|,|B|), so wildly different-sized
    // docs can be rejected from the shingle collision itself, before the
    // distinct and the verification join ever see the pair. The epsilon
    // keeps the boundary (t·max exactly integral) on the inclusive side —
    // extra candidates are fine, dropped true pairs are not.
    def sizeCompatible: Column =
      least(col("a.sz"), col("b.sz")).cast("double") >=
        lit(threshold) * greatest(col("a.sz"), col("b.sz")).cast("double") - lit(1e-9)

    def cappedPairs(input: DataFrame, hot: DataFrame): DataFrame = {
      val inv0 = input.select(
        col("doc_id"), size(col("sh")).as("sz"), explode(col("sh")).as("shingle"))
      // capped index: pair discovery misses hot shingles, so |A∩B| must
      // come from the FULL sets — a DF cap affects which pairs are
      // considered, never their scores
      // pinned: both sides of the collision self-join read this index, and
      // a self-join gets zero ReusedExchange — unpinned, the explode and
      // anti-join would run once per side
      val inv = Pins.pin(inv0.join(broadcast(hot), Seq("shingle"), "left_anti"))
      val cand = inv
        .as("a")
        .join(inv.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
            sizeCompatible)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      jaccardOf(cand, input).filter(col("jaccard") >= threshold)
    }

    // exact path with PREFIX FILTERING (Bayardo et al. "Scaling Up All
    // Pairs Similarity Search", WWW'07): in a global total order, a pair
    // with J ≥ t MUST collide within each doc's first |A| − ⌈t·|A|⌉ + 1
    // shingles — if A∩B avoided that prefix, the ≥⌈t·|A|⌉ shared shingles
    // would have to fit in the remaining ⌈t·|A|⌉ − 1 slots. The order is
    // ascending document frequency (ties by shingle) so prefixes hold the
    // RAREST shingles — the self-join's Σ df² term collapses because hot
    // shingles never enter the index. Verification against FULL sets keeps
    // the result exactly equal to the naive scan for any total order.
    def prefixPairs(input: DataFrame): DataFrame = {
      val inv = input.select(col("doc_id"), explode(col("sh")).as("shingle"))
      val dfs = inv.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      val byDoc = Window.partitionBy(col("doc_id"))
      val rn = row_number().over(byDoc.orderBy(col("df"), col("shingle")))
      // |A| rides the same per-doc window shuffle as the rank — no extra
      // join against a set-size table
      val sz = count(lit(1)).over(byDoc)
      // pinned: both sides of the prefix self-join read this index, and a
      // self-join gets zero ReusedExchange — unpinned, the df join and the
      // two per-doc windows (rank + size) would run once per side
      val pre = Pins.pin(inv
        .join(dfs, "shingle")
        .withColumn("rn", rn)
        .withColumn("sz", sz)
        // epsilon guard: when t·|A| is mathematically an integer k the
        // double product can land just above k (0.07·100 → 7.0000000000000007)
        // and ceil would overshoot to k+1, shortening the prefix below the
        // Bayardo bound and silently dropping boundary pairs. Nudging down
        // by 1e-9 can only LENGTHEN the prefix (more candidates, never
        // fewer), so exactness is preserved.
        .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
        .select("doc_id", "shingle", "sz", "rn"))
      // PPJoin positional filter (Xiao et al., WWW'08): at a collision on
      // the same shingle at ranks (i, j) of the common global order, the
      // shared shingles before it number ≤ min(i−1, j−1) and after it
      // ≤ min(|A|−i, |B|−j), so overlap ≤ min(i,j) + min(|A|−i, |B|−j).
      // J ≥ t needs overlap ≥ α = ⌈t·(|A|+|B|)/(1+t)⌉; the bound holds at
      // EVERY collision, so every collision of a true pair passes —
      // dropping failing collisions prunes only false candidates (exact).
      val alpha = ceil(
        lit(threshold) / (1.0 + threshold) * (col("a.sz") + col("b.sz")) - lit(1e-9))
      val positional =
        least(col("a.rn"), col("b.rn")) +
          least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn")) >= alpha
      val cand = pre
        .as("a")
        .join(pre.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
            sizeCompatible && positional)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      jaccardOf(cand, input).filter(col("jaccard") >= threshold)
    }

    val mine: DataFrame => DataFrame = maxShingleDf match {
      case Some(cap) =>
        val hot = hotShingles(cap)
        cappedPairs(_, hot)
      case None => prefixPairs
    }
    if (!canonicalize) mine(sets)
    else canonicalMined(sets.withColumn("fp", md5(to_json(col("sh")))),
      key = "fp", carry = Seq("sh"), identical = lit(1.0), score = "jaccard")(mine)
  }

  /** MinHash-LSH near-dup detection: one md5 base hash per shingle, k
    * affine min-hashes derived arithmetically per-row, banded into `bands`
    * signatures; docs colliding in any band are candidates; candidates are
    * verified with exact Jaccard ≥ threshold so the output contains no
    * false positives.
    *
    * Default 24 hashes × 6 bands of 4 ⇒ near-total recall above j≈0.8
    * (miss probability (1-j⁴)⁶ < 1e-6 at j=0.98) while background pairs
    * (j≲0.2) collide with probability < 1%, which keeps the candidate set
    * near-linear. Signatures depend only on the shingle set, so
    * `canonicalize` collapses identical sets before banding — identical
    * output (same signatures ⇒ same collisions) with the candidate join
    * bound to distinct sets.
    */
  def minHashLsh(
      docs: DataFrame,
      numHashes: Int = 24,
      bands: Int = 6,
      threshold: Double = 0.6,
      canonicalize: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val r = numHashes / bands

    def bandPairs(input: DataFrame): DataFrame = {
      // cache the banded table: the signature expression must evaluate
      // once per document, not once per band per join side
      val banded = input
        .withColumn("mh", minHashSignature(baseHashes(col("sh")), numHashes))
        .select(col("doc_id"), size(col("sh")).as("sz"),
          explode(bandSignatures(col("mh"), bands, r)).as("bs"))
        .select(col("doc_id"), col("sz"),
          col("bs.band").as("band"), col("bs.sig").as("sig"))
        .cache()
      val cand = banded
        .as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id") &&
            // J ≥ t forces t·max(|A|,|B|) ≤ min(|A|,|B|): size-incompatible
            // band collisions can never verify, so dropping them here is
            // exact and keeps the collision join output near-linear
            least(col("a.sz"), col("b.sz")).cast("double") >=
              lit(threshold) * greatest(col("a.sz"), col("b.sz")).cast("double") - lit(1e-9))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      jaccardOf(cand, input).filter(col("jaccard") >= threshold)
    }

    val sets = shingleSets(docs)
    if (!canonicalize) bandPairs(sets)
    else canonicalMined(sets.withColumn("fp", md5(to_json(col("sh")))),
      key = "fp", carry = Seq("sh"), identical = lit(1.0), score = "jaccard")(bandPairs)
  }

  /** Canonical selection by SCORE: keep the BEST member of each duplicate
    * cluster — highest `score`, ties to the smallest `doc_id` — instead
    * of [[clusters]]' min-id convention. The choice a curation stack
    * actually wants: among near-duplicate crawls of a page, keep the
    * longest / highest-quality capture, not the one with the smallest id.
    * Inputs: a (doc_id, cluster_id) assignment and a (doc_id, score)
    * table (score must be engine-deterministic for oracle replays; ids
    * must be unique so the order is total). Output: every clustered doc
    * with its cluster, score, and a `kept` flag.
    *
    * The per-cluster argmax rides [[Diagnostics.saltedTopKPerKey]] with
    * k = 1 — two-stage salted ranks, so a boilerplate mega-cluster
    * (thousands of identical pages) never funnels through one window
    * task.
    */
  def canonicalByScore(clusterAssign: DataFrame, scores: DataFrame): DataFrame = {
    val withScore = clusterAssign.join(scores, "doc_id")
    val winners = Diagnostics.saltedTopKPerKey(withScore,
      col("cluster_id"), col("score"), col("doc_id"), k = 1)
      .select(col("key").as("cluster_id"), col("tiebreak").as("cn_winner"))
    withScore.join(winners, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("score"),
        (col("doc_id") === col("cn_winner")).as("kept"))
  }

  /** Bipartite near-dedup vs an already-kept REFERENCE corpus — the
    * incremental-crawl step: a new batch is deduplicated AGAINST the
    * corpus you already kept (not just within itself), so re-crawled and
    * lightly-edited pages never re-enter. Same MinHash-LSH machinery as
    * [[minHashLsh]] but the band join is train×reference (no self-join,
    * no `<` tie-break), with the exact size-compatibility cut and exact
    * Jaccard verification before any drop — a doc leaves ONLY for a
    * verified J ≥ threshold reference twin. Returns the surviving docs
    * with their original columns.
    *
    * Scale shape: both sides are touched once for signatures (per-row
    * codegen, no shuffle), candidates come from one (band, sig) hash
    * join, and the final step is an id anti-join — never pairwise in
    * either corpus alone. Symmetric with the self-join miner: the pairs
    * verified here are EXACTLY [[minHashLsh]]'s cross-corpus pairs on the
    * union (the TextOpsSpec equivalence).
    */
  def dedupAgainst(
      docs: DataFrame,
      reference: DataFrame,
      numHashes: Int = 24,
      bands: Int = 6,
      threshold: Double = 0.6): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val r = numHashes / bands
    // localCheckpoint, not cache: each prep table is read twice (band join
    // + exact verification) but the frames are fresh per invocation, so a
    // CacheManager pin would leak one minhash table PAIR per call for the
    // session lifetime (the streaming-crawl shape calls this per batch);
    // checkpoint blocks release via the context cleaner once unreachable
    def prep(input: DataFrame): DataFrame = Pins.pin(shingleSets(input)
      .withColumn("mh", minHashSignature(baseHashes(col("sh")), numHashes)))
    def banded(sets: DataFrame, idAs: String, szAs: String) = sets
      .select(col("doc_id").as(idAs), size(col("sh")).as(szAs),
        explode(bandSignatures(col("mh"), bands, r)).as("bs"))
      .select(col(idAs), col(szAs), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val d = prep(docs)
    val ref = prep(reference)
    val cand = banded(d, "doc_a", "sz_a")
      .join(banded(ref, "doc_b", "sz_b"), Seq("band", "sig"))
      // the minHashLsh size cut, exact for the same reason (J ≥ t forces
      // t·max(|A|,|B|) ≤ min(|A|,|B|))
      .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
        lit(threshold) * greatest(col("sz_a"), col("sz_b")).cast("double") - lit(1e-9))
      .select("doc_a", "doc_b")
      .distinct()
    val hit = jaccardOf(cand, d, ref)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a").as("doc_id"))
      .distinct()
    docs.join(hit, Seq("doc_id"), "left_anti")
  }

  /** Duplicate CLUSTERS from near-dup pairs — the step between pair
    * mining and canonical selection: connected components over the pair
    * graph, so transitively-linked duplicates (A≈B≈C with A,C never
    * compared) collapse into one group keyed by the minimum member id.
    *
    * Iterative min-label propagation: each round every edge offers both
    * endpoints the smaller of their labels, and each node keeps the
    * minimum; converges in O(component diameter) rounds (LSH/near-dup
    * components are near-cliques — typically 1-2). Each round is one
    * edge-label join + one (node)-key min aggregation — all equi-joins
    * on ids, no driver-side graph, deterministic (min is
    * order-independent). Output: (doc_id, cluster_id = min id of the
    * component), one row per node that appears in a pair.
    */
  def clusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // the checkpoint both materializes the (possibly expensive — the LSH
    // mining tree for q_dedup_clusters) pair plan ONCE and truncates it to
    // a LogicalRDD, so each round's join re-analyzes a two-leaf plan, not
    // the whole upstream miner
    val (edges, releaseEdges) =
      Iterate.checkpointed(pairs.select(col("doc_a"), col("doc_b")))
    var (labels, releaseLabels) = Iterate.checkpointed(edges
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
      .withColumn("cluster_id", col("doc_id")))
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val la = labels.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca"))
      val lb = labels.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb"))
      val msgs = edges.join(la, "doc_a").join(lb, "doc_b")
        .select(explode(array(
          struct(col("doc_a").as("doc_id"), least(col("ca"), col("cb")).as("cluster_id")),
          struct(col("doc_b").as("doc_id"), least(col("ca"), col("cb")).as("cluster_id"))))
          .as("x"))
        .select(col("x.doc_id"), col("x.cluster_id"))
      // each node's previous label rides the SAME aggregation as the update
      // (every doc_id has exactly one labels row, so max(prev) recovers it;
      // message rows null-fill), folding the label update and the
      // convergence check into one job per round instead of two. The round
      // result is CHECKPOINTED, not cached: a cache keeps the full k-deep
      // join tree alive and round k re-analyzes k rounds of history
      // (quadratic in rounds — the iterative-loop convention);
      // the checkpoint truncates to a LogicalRDD so plan depth is O(1)
      // per round. Storage: previous generation released once the next is
      // materialized, so at most two label generations are ever persisted.
      val (next, releaseNext) = Iterate.checkpointed(labels
        .select(col("doc_id"), col("cluster_id"), col("cluster_id").as("prev"))
        .unionByName(msgs, allowMissingColumns = true)
        .groupBy(col("doc_id"))
        .agg(min(col("cluster_id")).as("cluster_id"), max(col("prev")).as("prev")))
      val changed = next.filter(col("cluster_id") =!= col("prev")).count()
      releaseLabels()
      labels = next.select("doc_id", "cluster_id")
      releaseLabels = releaseNext
      converged = changed == 0
      it += 1
    }
    releaseEdges()
    // Exhausting the round budget without a zero-change confirmation round
    // means the labels are PARTIALLY propagated — silently returning them
    // would poison every consumer that relies on exact components (the
    // incremental merge path, the DuckDB closure oracle, canonical
    // selection). Fail loudly; the caller raises maxIters (diameter bound).
    if (!converged)
      throw new IllegalStateException(
        s"clusters did not converge in $maxIters rounds — component diameter " +
          "exceeds the round budget; raise maxIters")
    // the LAST generation stays persisted — the returned plan reads from it
    labels
  }

  /** Incremental cluster maintenance — merge a micro-batch of newly mined
    * near-dup pairs into an existing label store instead of re-clustering
    * the whole history (the streaming twin of [[clusters]], same
    * maintenance pattern as the per-batch sketch merges in
    * [[Sketches.mergeHll]]).
    *
    * Existing labels are replayed as STAR edges (doc_id — cluster_id):
    * each old component collapses to depth 1 around its root, so its
    * connectivity is preserved while propagation inside it converges in
    * one round; only chains created by the NEW pairs (bridges between old
    * components) need more. Correctness: cluster_id is the min member of
    * the old component and itself a member node, so min-label propagation
    * over (stars ∪ new pairs) yields exactly the min node id of each
    * merged component — the same labels a batch [[clusters]] over the
    * full pair history would produce, which is what the streaming spec
    * asserts. Cost per batch: O(affected-component diameter) rounds over
    * |store| + |batch| edges — no growing pair history is kept anywhere.
    */
  def mergeClusters(
      labels: DataFrame, newPairs: DataFrame, maxIters: Int = 20): DataFrame =
    clusters(
      labels.select(col("doc_id").as("doc_a"), col("cluster_id").as("doc_b"))
        .unionByName(newPairs.select(col("doc_a"), col("doc_b"))),
      maxIters)

  /** Paragraph-level exact dedup — the C4/RefinedWeb granularity missing
    * from whole-document dedup: repeated boilerplate (headers, license
    * blocks, navigation text) recurs across documents that are NOT
    * near-duplicates as wholes, so it survives doc-level matching. This
    * splits each document into paragraphs, keeps exactly the FIRST
    * occurrence of each distinct paragraph corpus-wide (first = smallest
    * (doc_id, para_no) — deterministic), and rewrites each document from
    * its surviving paragraphs.
    *
    * The corpus carries no newline/sentence markers, so boundaries are
    * CONTENT-DEFINED (the rsync/LBFS chunking trick): a new paragraph
    * starts after any token whose h60 ≡ 0 (mod avgTokens) — expected
    * paragraph length avgTokens, and boundaries depend only on local
    * content, so the same boilerplate block splits identically wherever
    * it appears (exactly the property positional/fixed-size chunking
    * lacks). With real newline-delimited text, substitute the newline
    * split for the hash split; everything downstream is unchanged.
    *
    * Scale shape: one per-doc window (a document's own tokens — never a
    * hot key), one (doc_id, para_no) aggregation, one hash shuffle on the
    * paragraph fingerprint for the keep-first window, one doc_id rebuild
    * aggregation. No pairwise work anywhere — exact dedup cost, at
    * paragraph granularity.
    */
  def paragraphDedup(docs: DataFrame, avgTokens: Int = 16): DataFrame = {
    val paras = paragraphsOf(docs, avgTokens)
    // keep-first: row 1 of the fingerprint group in (doc_id, para_no)
    // order — a total order, so replays are deterministic cross-engine
    val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"), col("para_no"))
    paras
      .withColumn("keep", row_number().over(wFp) === 1)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("keep"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("keep"), struct(col("para_no"), col("ptext"))))),
          e => e.getField("ptext"))).as("text_dedup"))
  }

  /** The shared content-defined paragraph builder behind [[paragraphDedup]]
    * and [[boilerplateParagraphs]]: one (doc_id, para_no, ptext, fp) row
    * per paragraph, boundaries after any token with h60 ≡ 0 (mod
    * avgTokens). One per-doc window + one (doc_id, para_no) aggregation.
    */
  private def paragraphsOf(docs: DataFrame, avgTokens: Int): DataFrame = {
    require(avgTokens > 0, "avgTokens must be positive")
    val tok = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("i", "tok")))
    // paragraph index = boundaries strictly BEFORE this token (the marker
    // token closes its own paragraph; the next token opens a new one)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tok
      .withColumn("b",
        when(pmod(h60(col("tok")), lit(avgTokens.toLong)) === 0, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("para_no", coalesce(sum(col("b")).over(byDoc), lit(0L)))
      .groupBy(col("doc_id"), col("para_no"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("i"), col("tok")))),
          e => e.getField("tok"))).as("ptext"))
      .withColumn("fp", md5(col("ptext")))
  }

  /** Boilerplate-paragraph removal — the RefinedWeb/C4 line-removal rule
    * at paragraph granularity: a paragraph appearing in MORE than `maxDf`
    * distinct documents is boilerplate (headers, license blocks, cookie
    * banners) and is removed from EVERY document — including the first,
    * which distinguishes this from [[paragraphDedup]]'s keep-first rule
    * (dedup keeps one copy of everything; boilerplate removal keeps no
    * copy of the over-frequent). Each document is rewritten from its
    * surviving paragraphs; `n_removed` counts its boilerplate slots.
    *
    * Scale shape: the same [[paragraphsOf]] build, one fp-keyed
    * COUNT(DISTINCT doc_id) aggregation (two-stage partial distinct — a
    * white-hot boilerplate fingerprint costs its per-partition dedup, not
    * a single-task funnel), one fp equi-join back, one doc rebuild. No
    * pairwise work; boilerplate detection at exact-dedup cost.
    */
  def boilerplateParagraphs(
      docs: DataFrame, avgTokens: Int = 16, maxDf: Int = 2): DataFrame =
    boilerplateWithDf(docs, paragraphDf(docs, avgTokens), avgTokens, maxDf)

  /** Paragraph document-frequency table of `docs` — (fp, para_df), one
    * row per distinct paragraph fingerprint. The mergeable state of the
    * boilerplate detector: a crawl maintains this store per micro-batch
    * with [[mergeParagraphDf]] instead of recounting the corpus.
    */
  def paragraphDf(docs: DataFrame, avgTokens: Int = 16): DataFrame =
    paragraphsOf(docs, avgTokens)
      .groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("para_df"))

  /** Merge two paragraph-df tables by fingerprint sum. EXACT when every
    * document contributed to exactly one side (the crawl contract — each
    * doc arrives in one micro-batch); re-delivered docs would double-count
    * their paragraphs, so dedup ids upstream first.
    */
  def mergeParagraphDf(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("fp"))
      .agg(sum(col("para_df")).as("para_df"))

  /** [[boilerplateParagraphs]] against a PRE-COMPUTED df store: drops
    * paragraphs whose store df exceeds `maxDf`. Equal to the one-shot
    * form when the store was accumulated over exactly `docs`; with a
    * crawl store it applies corpus-wide boilerplate knowledge to any
    * slice (e.g. re-clean only the newest batch). Paragraphs absent from
    * the store count df 0 (kept).
    */
  def boilerplateWithDf(
      docs: DataFrame,
      dfStore: DataFrame,
      avgTokens: Int = 16,
      maxDf: Int = 2): DataFrame = {
    require(maxDf >= 1, "maxDf must be at least 1")
    val paras = paragraphsOf(docs, avgTokens)
    paras
      .join(dfStore.select(col("fp"), col("para_df")), Seq("fp"), "left")
      .withColumn("keep", coalesce(col("para_df"), lit(0L)) <= maxDf)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("keep"), lit(0L)).otherwise(lit(1L))).as("n_removed"),
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("keep"), struct(col("para_no"), col("ptext"))))),
          e => e.getField("ptext"))).as("text_clean"))
  }

  /** Exact-substring span dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better", arXiv:2107.06499 — the ExactSubstr
    * pass): remove every repeated run of ≥ k tokens corpus-wide, keeping
    * only its FIRST occurrence. This is the granularity between
    * [[paragraphDedup]] (fixed chunks) and doc-level dedup: a license
    * block pasted mid-paragraph repeats as a SPAN, aligned to no boundary.
    *
    * Mechanism — the scalable stand-in for the paper's suffix array,
    * which is inherently sequential: every k-token sliding window is
    * fingerprinted; a window is a duplicate iff an earlier occurrence of
    * its fingerprint exists (earlier = smaller (doc_id, start) — a total
    * order, so replays are deterministic); a token is removed iff some
    * duplicate window covers it. A repeated run of length L ≥ k yields
    * L−k+1 duplicate windows whose union covers exactly the run, so
    * repeated spans vanish wholly (their first occurrence keeps all its
    * windows) — the paper's semantics, modulo the k−1 boundary tokens of
    * partially-overlapping repeats.
    *
    * Scale shape: window fingerprints are a per-row explode (no shuffle);
    * keep-first is one hash shuffle on the fingerprint; covered positions
    * are a bounded k-fan-out explode; the rebuild is one (doc_id, pos)
    * join + one doc_id aggregation. Never pairwise, never a suffix array.
    */
  def substringDedup(docs: DataFrame, k: Int = 8): DataFrame = {
    require(k > 0, "k must be positive")
    val toksDf = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    val wins = toksDf
      .filter(size(col("toks")) >= k) // guard: descending-sequence trap
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("toks")) - k), i =>
          struct(i.as("start"),
            md5(concat_ws(" ", slice(col("toks"), i + 1, lit(k)))).as("fp"))))
          .as("w"))
      .select(col("doc_id"), col("w.start"), col("w.fp"))
    val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"), col("start"))
    val dupPos = wins
      .withColumn("rn", row_number().over(wFp))
      .filter(col("rn") > 1)
      .select(col("doc_id"),
        explode(sequence(col("start"), col("start") + k - 1)).as("pos"))
      .distinct()
      .withColumn("cut", lit(true))
    toksDf
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .join(dupPos, Seq("doc_id", "pos"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("cut"), lit(1L)).otherwise(lit(0L))).as("n_removed"),
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("cut").isNull, struct(col("pos"), col("tok"))))),
          e => e.getField("tok"))).as("text_dedup"))
  }

  /** MOSS-style local-overlap pairs (Schleimer et al., the winnowing
    * paper's §5 use case): document pairs sharing ≥ `minShared` winnowing
    * fingerprints, with a containment ratio against the smaller side's
    * fingerprint count. Because any shared substring of length ≥ k + w − 1
    * yields a shared fingerprint, this catches PARTIAL copies — a
    * paragraph lifted into an otherwise-unrelated page — that whole-doc
    * MinHash/SimHash similarity dilutes below threshold; the complement
    * of [[substringDedup]], which rewrites exact spans rather than
    * reporting which pairs overlap.
    *
    * Scale shape: the fingerprint table is [[TextAnalysis.winnowFingerprints]]
    * (zero-shuffle per-row loop); fingerprints in more than `maxDf` docs
    * are boilerplate (headers, license blocks) and are dropped BEFORE pair
    * enumeration — the MOSS noise rule and the skew valve in one: each
    * surviving fingerprint contributes ≤ maxDf² pairs, so the fp equi-join
    * is bounded linear in the fingerprint table, never quadratic in a hot
    * key. Enumeration is an equi-join on `fp` — no cartesian product.
    */
  def winnowOverlapPairs(
      docs: DataFrame,
      minShared: Long = 3L,
      maxDf: Long = 16L,
      k: Int = 5,
      w: Int = 4): DataFrame = {
    require(minShared > 0 && maxDf > 0, "minShared/maxDf must be positive")
    val fps = TextAnalysis.winnowFingerprints(docs, k, w).cache()
    val sizes = fps.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    val keptFp = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("fp")
    // pinned: both sides of the fp self-join read the filtered table —
    // unpinned, the df join reruns per side (self-joins get no
    // ReusedExchange)
    val kept = Pins.pin(fps.join(keptFp, "fp"))
    val pairs = kept.select(col("fp"), col("doc_id").as("doc_a"))
      .join(kept.select(col("fp"), col("doc_id").as("doc_b")), "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_fp").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_fp").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("n_a"), col("n_b"),
        (col("n_shared").cast("double") /
          least(col("n_a"), col("n_b")).cast("double")).as("containment"))
  }

  /** Copied-SPAN localization — the alignment step MOSS runs after
    * [[winnowOverlapPairs]] flags a pair (Schleimer et al. §5: matching
    * fingerprints are plotted by position; a run of matches along one
    * DIAGONAL pos_a − pos_b = const IS a contiguous copied region,
    * because a verbatim span shifts every shared fingerprint by the same
    * offset). For each candidate pair this reports the best diagonal:
    * its alignment offset, how many shared fingerprints sit on it, and
    * the char extent [lo_a, hi_a] (+k−1 covers the final k-gram) of the
    * aligned region on the a side — the evidence a reviewer opens the
    * two documents at, instead of a bare count. Best diagonal =
    * (most matches, then smaller offset) — deterministic; pairs whose
    * best diagonal has fewer than `minMatches` aligned fingerprints are
    * noise (isolated shared k-grams) and are dropped.
    *
    * Scale shape: the positional fingerprint table is zero-shuffle
    * ([[TextAnalysis.winnowFingerprintsPos]]); the `maxDf` boilerplate
    * rule doubles as the skew valve exactly as in
    * [[winnowOverlapPairs]] (≤ maxDf² pairs per surviving fingerprint);
    * the diagonal aggregation keys on (doc_a, doc_b, diag) and the
    * best-diagonal window on the pair — both bounded by a pair's shared
    * fingerprints, never corpus-sized.
    */
  def winnowSpanPairs(
      docs: DataFrame,
      minMatches: Long = 3L,
      maxDf: Long = 16L,
      k: Int = 5,
      w: Int = 4): DataFrame = {
    require(minMatches > 0 && maxDf > 0, "minMatches/maxDf must be positive")
    import org.apache.spark.sql.expressions.Window
    val fps = Pins.pin(TextAnalysis.winnowFingerprintsPos(docs, k, w))
    val keptFp = fps.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") <= maxDf)
      .select("fp")
    // pinned: both sides of the fp self-join read the filtered table
    val kept = Pins.pin(fps.join(keptFp, "fp"))
    kept.select(col("fp"), col("doc_id").as("doc_a"), col("pos").as("pos_a"))
      .join(kept.select(col("fp"), col("doc_id").as("doc_b"), col("pos").as("pos_b")), "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"),
        (col("pos_a") - col("pos_b")).as("diag"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("pos_a")).as("lo_a"), max(col("pos_a")).as("hi_a"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_a"), col("doc_b"))
          .orderBy(col("n_matches").desc, col("diag"))))
      .filter(col("rn") === 1 && col("n_matches") >= minMatches)
      .select(col("doc_a"), col("doc_b"), col("diag"), col("n_matches"),
        col("lo_a"), col("hi_a"),
        (col("hi_a") - col("lo_a") + k).as("span_chars"))
  }

  /** Exact shingle-containment pairs — the ASYMMETRIC near-dup measure
    * (Broder 1997's containment vs resemblance): containment(A→B) =
    * |A∩B| / |A| stays high when a small document sits wholesale inside
    * a larger one (quotes, aggregator pages, versioned expansions),
    * exactly the pairs Jaccard misses because the big document's size
    * dilutes the union. The complement of [[ngramJaccardPairs]]
    * (symmetric resemblance) and [[substringDedup]] (contiguous spans —
    * containment also catches scattered inclusion).
    *
    * Distinctive-overlap semantics: shingles in more than `maxDf`
    * documents are boilerplate (headers, license blocks) and are
    * excluded from BOTH the intersection and the set sizes — shared
    * boilerplate must not manufacture containment (the MOSS noise rule),
    * and the df cap is simultaneously the skew valve: each surviving
    * shingle contributes ≤ maxDf² pairs, so the equi-join is bounded
    * linear in the posting table, never quadratic in a hot shingle.
    * Documents whose every shingle is boilerplate drop out.
    *
    * All checked values are exact integers: inter, n_a, n_b, and the
    * ppm ratios via DECIMAL div (the q_dsir pattern) — rankings and
    * threshold decisions replay bit-for-bit cross-engine. A pair
    * surfaces when max(cont_a, cont_b) ≥ tauPpm.
    */
  def containmentPairs(
      docs: DataFrame,
      tauPpm: Long = 500000L,
      maxDf: Long = 64L): DataFrame = {
    require(tauPpm >= 1 && tauPpm <= 1000000L, "tauPpm in [1, 1e6]")
    require(maxDf >= 1, "maxDf must be positive")
    val d38 = "decimal(38,0)"
    val posting = shingleSets(docs)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    // sh is per-doc distinct, so count(*) per shingle IS the document df
    val keptShingles = posting.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("s")
    // pinned: the size table and both join sides read the kept postings —
    // a self-join gets zero ReusedExchange, so unpinned the explode +
    // df-filter join would run three times
    val kept = Pins.pin(posting.join(keptShingles, Seq("s")))
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    def ppm(inter: Column, n: Column): Column =
      call_function("div", lit(1000000L).cast(d38) * inter.cast(d38), n.cast(d38))
    kept.select(col("s"), col("doc_id").as("doc_a"))
      .join(kept.select(col("s"), col("doc_id").as("doc_b")), Seq("s"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("n_a"), col("n_b"),
        ppm(col("inter"), col("n_a")).as("cont_a_ppm"),
        ppm(col("inter"), col("n_b")).as("cont_b_ppm"))
      .filter(greatest(col("cont_a_ppm"), col("cont_b_ppm")) >= tauPpm)
  }

  /** Pairwise SOURCE-overlap matrix: exact shingle Jaccard between every
    * pair of corpus sources — the corpus-composition readout that tells a
    * curation run which feeds are near-copies of each other (two crawls
    * of the same site, a dataset republished under a new name) before
    * any document-level mining spends compute on them. Document-level
    * twins: [[ngramJaccardPairs]] (resemblance) / [[containmentPairs]]
    * (asymmetric); this is the same statistic lifted to the source level,
    * where the matrix is small enough to eyeball.
    *
    * Scale shape: one distinct-shuffle builds the (source, shingle-hash)
    * posting table — the source-level shingle SET, h60-hashed so the join
    * keys are 8 bytes, not shingle text. The self-join enumerates
    * ≤ C(s, 2) pairs per shingle where s ≤ |sources| — sources are a
    * DIMENSION (a pipeline has hundreds, not millions), so unlike the
    * document-level miners no df valve is needed: worst case every
    * shingle appears in all S sources and the join emits |shingles|·C(S,2)
    * rows, all collapsed map-side by the (src_a, src_b) partial count
    * into the ≤ S² output matrix. All values exact integers; Jaccard as
    * ppm via the DECIMAL div pattern (q_dsir rule) so thresholds replay
    * cross-engine.
    */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    // pinned: the size table and both self-join sides read the postings —
    // unpinned, the tokenize+shingle explode would run three times
    val post = Pins.pin(sourceShinglePostings(docs))
    // eager pin of the S²-bounded matrix, then release the posting pin
    val out = Pins.pin(sourceOverlapFromPostings(post))
    Pins.release(post)
    out
  }

  /** The distinct (source, shingle-h60) posting table behind
    * [[sourceOverlap]] — and its STREAMING STATE: postings of disjoint
    * document batches merge by union + distinct (set union — commutative,
    * idempotent, any batch order/replay works, the retentionState rule),
    * so a crawl can accrete this table per micro-batch and serve
    * [[sourceOverlapFromPostings]] at any point, identical to one-shot
    * indexing of every document seen.
    */
  def sourceShinglePostings(docs: DataFrame): DataFrame = docs
    // tokens in their OWN projection (the shingleSets HOF-inlining rule)
    .select(col("source"), tokens(col("text")).as("toks"))
    .filter(size(col("toks")) >= 3)
    .select(col("source"), explode(shingles3(col("toks"))).as("s"))
    .select(col("source"), h60(col("s")).as("h"))
    .distinct()

  /** [[sourceOverlap]]'s readout over a (deduplicated) posting state. */
  def sourceOverlapFromPostings(post: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val sizes = post.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val common = post.select(col("h"), col("source").as("src_a"))
      .join(post.select(col("h"), col("source").as("src_b")), Seq("h"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_common"))
    // sizes is |sources| rows — no forced hint, AQE broadcasts it
    common
      .join(sizes.select(col("source").as("src_a"), col("n").as("n_a")), Seq("src_a"))
      .join(sizes.select(col("source").as("src_b"), col("n").as("n_b")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_common"), col("n_a"), col("n_b"),
        call_function("div", lit(1000000L).cast(d38) * col("n_common").cast(d38),
          (col("n_a") + col("n_b") - col("n_common")).cast(d38)).as("jaccard_ppm"))
  }

  // -- k-min-values source sketches ----------------------------------------

  /** Per-source k-min-values (KMV) sketch over the shingle space — the
    * SKETCH twin of [[sourceOverlap]]: where the exact matrix keeps every
    * distinct (source, shingle-h60) posting, the KMV state keeps only the
    * k SMALLEST h60 values per source (Bar-Yossef et al., RANDOM'02;
    * Beyer et al., SIGMOD'07 — "distinct sampling"). At 100 TB the exact
    * posting table is corpus-sized; the sketch is k·|sources| rows
    * forever, and pairwise overlap estimates come from sketches alone.
    *
    * Streaming-mergeable the strong way: min-k of a distinct union is
    * commutative AND idempotent (the retentionState rule — unlike a
    * counter, replaying a batch cannot change a min), so any batch
    * order/replay yields the same state; see [[mergeKmv]].
    *
    * Scale shape: the posting distinct is the only corpus-sized shuffle;
    * the per-source k-smallest selection runs as the salted two-stage
    * rank ([[Diagnostics.twoStageTopK]] — sources are few, so a plain
    * per-source window would funnel each source through ONE task).
    */
  def sourceKmv(docs: DataFrame, k: Int): DataFrame =
    kmvCompact(sourceShinglePostings(docs), k)

  /** Keep the k smallest h per source of a distinct (source, h) table. */
  def kmvCompact(post: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    Diagnostics.twoStageTopK(
      post, col("source"), pmod(col("h"), lit(32L)), Seq(col("h").asc), k)
      .select(col("source"), col("h"))
  }

  /** Merge two KMV states: distinct union, re-compact to k per source.
    * Commutative + idempotent — any micro-batch order or replay works.
    */
  def mergeKmv(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    kmvCompact(a.unionByName(b).distinct(), k)

  /** Pairwise source-overlap ESTIMATES from a [[sourceKmv]] state: for
    * each source pair, take the k smallest values of the union of the
    * two sketches (itself a valid KMV sketch of the union of the two
    * shingle sets) and count how many of them appear in BOTH sketches —
    * an unbiased Jaccard estimator (Beyer et al., SIGMOD'07 §4):
    *
    *   Ĵ = |topk(A ∪ B) ∩ A ∩ B| / |topk(A ∪ B)|
    *
    * reported as exact-integer ppm so thresholds replay cross-engine.
    * Gate the sketch against the exact matrix ([[sourceOverlap]]) at
    * test scale, then run only the sketch at corpus scale.
    *
    * Scale shape: the source list is a DIMENSION (bounded collect, the
    * per-source-counts rule), so pair enumeration is a driver-built
    * ≤ C(S,2)-row literal table equi-joined twice against the sketch —
    * no cartesian, no non-equi join. Each union ranking partitions on
    * (src_a, src_b) with ≤ 2k rows per partition — bounded by the sketch
    * contract, never by corpus size.
    */
  def kmvOverlap(sketchIn: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val spark = sketchIn.sparkSession
    import spark.implicits._
    // pinned: the source collect and both pair-join sides read the sketch —
    // unpinned, the posting distinct + two-stage rank would run three times
    val sketch = Pins.pin(sketchIn)
    val srcs = sketch.select(col("source")).distinct()
      .as[String].collect().sorted.toSeq // bounded: sources are a dimension
    val pairs = (for { a <- srcs; b <- srcs if a < b } yield (a, b))
      .toDF("src_a", "src_b")
    val pa = pairs.join(sketch.withColumnRenamed("source", "src_a"), Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("h"),
        lit(1L).as("in_a"), lit(0L).as("in_b"))
    val pb = pairs.join(sketch.withColumnRenamed("source", "src_b"), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("h"),
        lit(0L).as("in_a"), lit(1L).as("in_b"))
    val u = pa.unionByName(pb)
      .groupBy(col("src_a"), col("src_b"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))
    val out = u.withColumn("r", row_number().over(w))
      .filter(col("r") <= k)
      .groupBy(col("src_a"), col("src_b"))
      .agg(
        count(lit(1)).as("k_used"),
        sum(col("in_a") * col("in_b")).as("n_shared"))
      // exact integer div: 10^6·k ≪ 2^63, no widening needed
      .select(col("src_a"), col("src_b"), col("k_used"), col("n_shared"),
        expr("(1000000L * n_shared) DIV k_used").as("jaccard_est_ppm"))
    // eager pin of the ≤ C(S,2)-row matrix, then release the sketch pin
    val pinned = Pins.pin(out)
    Pins.release(sketch)
    pinned
  }

  /** Per-source distinct-cardinality estimates from a [[sourceKmv]]
    * state — KMV's other readout (Bar-Yossef et al.'s original use):
    * with the k-th smallest of D uniform hashes in [0, 2^60) sitting
    * near k·2^60/D, the estimator D̂ = (k−1)·2^60 DIV h_k (unbiased,
    * σ ≈ D/√(k−2)) — here in exact integer arithmetic (DECIMAL product:
    * (k−1)·2^60 overflows BIGINT) so the ESTIMATE itself replays
    * cross-engine, unlike HLL's float register fold. An unsaturated
    * sketch (fewer than k distinct values) holds the whole set, so the
    * answer is k_used exactly, not an estimate. Pair with
    * [[kmvOverlap]]: one k·|sources|-row state serves both cardinality
    * and overlap where exact answers need the corpus posting table.
    */
  def kmvCardinality(sketch: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "k must be at least 2 for the estimator")
    val d38 = "decimal(38,0)"
    sketch.groupBy(col("source"))
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth"))
      .select(col("source"), col("k_used"), col("kth"),
        when(col("k_used") < k || col("kth") <= 0, col("k_used"))
          .otherwise(call_function("div",
            (col("k_used") - 1).cast(d38) * lit(1L << 60).cast(d38),
            col("kth").cast(d38)).cast("long"))
          .as("est_distinct"))
  }

  /** Dedup-savings datasheet: duplicate-cluster sizes bucketed by
    * floor(log2) (the logHistogram bit-width trick — `length(bin(sz))−1`
    * replays on both engines), with cluster count, member count, and the
    * redundant-document count Σ(size − 1) per bucket — the "X% of the
    * corpus is duplicate mass, mostly in pairs / mostly in one giant
    * template cluster" readout a release publishes and a mixture planner
    * reads before paying for canonical selection. Singletons never enter
    * (they appear in no pair). Scale shape: the cluster sizes table is
    * |clusters| rows (one keyed count over the CC labels), the bucket
    * rollup ≤ 64 rows.
    */
  def dedupSavings(pairs: DataFrame): DataFrame =
    clusters(pairs)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
      .select((length(call_function("bin", col("sz"))) - 1)
        .cast("long").as("bucket"), col("sz"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_clusters"),
        sum(col("sz")).as("n_docs"),
        sum(col("sz") - 1).as("n_redundant"))

  /** SimHash near-dup pairs: 60-bit signatures, pairs with Hamming
    * distance ≤ maxDist. Signature computation is per-row and linear;
    * pair enumeration uses pigeonhole bit-chunk blocking: the signature is
    * split into maxDist+1 contiguous chunks — any pair within maxDist
    * differs in at most maxDist chunks, so it matches EXACTLY on at least
    * one chunk. Candidates come from an equi-join on (chunkIdx, chunkValue)
    * and are verified with the true Hamming distance, so the output is
    * identical to the all-pairs scan with no cartesian product in the plan.
    * Hamming depends only on the signature, so `canonicalize` collapses
    * equal signatures (distance-0 groups) before the chunk join.
    */
  def simHashPairs(
      docs: DataFrame,
      maxDist: Int,
      canonicalize: Boolean = false): DataFrame = {
    require(maxDist >= 0 && maxDist < 60, "maxDist must be in [0, 60)")
    val sims = docs
      .withColumn("hs", tokenHashes(tokens(col("text"))))
      .withColumn("simhash", simHashSql("hs"))
      .select(col("doc_id"), col("simhash"))
      .cache()

    def chunkPairs(input: DataFrame): DataFrame = {
      // chunk boundaries: maxDist+1 chunks covering all 60 bits (first
      // `60 % n` chunks get one extra bit)
      val n = maxDist + 1
      val widths = Seq.tabulate(n)(c => 60 / n + (if (c < 60 % n) 1 else 0))
      val starts = widths.scanLeft(0)(_ + _)
      val chunkStructs = (0 until n).map { c =>
        val mask = (1L << widths(c)) - 1
        struct(
          lit(c).as("c"),
          shiftright(col("simhash"), starts(c)).bitwiseAND(lit(mask)).as("v"))
      }
      val chunks = input
        .select(col("doc_id"), col("simhash"), explode(array(chunkStructs: _*)).as("ch"))
        .select(col("doc_id"), col("simhash"), col("ch.c").as("c"), col("ch.v").as("v"))
      chunks
        .as("a")
        .join(chunks.as("b"),
          col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(
          col("a.doc_id").as("doc_a"),
          col("b.doc_id").as("doc_b"),
          expr("bit_count(a.simhash ^ b.simhash)").cast("long").as("hamming"))
        .distinct()
        .filter(col("hamming") <= maxDist)
    }

    if (!canonicalize) chunkPairs(sims)
    else canonicalMined(sims, key = "simhash", carry = Seq.empty,
      identical = lit(0L), score = "hamming")(chunkPairs)
  }

  /** Pair-set agreement — the "measure, don't guess" gate for dedup
    * tuning: how well one pair miner's output approximates another's
    * (banding parameters vs exact ground truth, SimHash radius vs
    * Jaccard threshold, cheap pass vs expensive pass). One row:
    * `n_pred`, `n_truth`, `n_tp` (pairs in both), and the derived
    * `precision` / `recall` (0 when the denominator is empty).
    *
    * Scale shape: one (doc_a, doc_b) equi-semi-join of the two pair
    * tables and three scalar counts — pair tables are the SMALL
    * derived artifacts (near-linear in corpus size by the miners'
    * construction), never the corpus.
    */
  def pairAgreement(pred: DataFrame, truth: DataFrame): DataFrame = {
    // distinct both projections: n_tp is a semi-join count (each predicted
    // pair at most once) and must agree with an oracle's inner-join count
    // even if a miner ever emits a duplicate (doc_a, doc_b) row
    val p = pred.select(col("doc_a"), col("doc_b")).distinct()
    val t = truth.select(col("doc_a"), col("doc_b")).distinct()
    val np = p.agg(count(lit(1)).as("n_pred"))
    val nt = t.agg(count(lit(1)).as("n_truth"))
    val tp = p.join(t, Seq("doc_a", "doc_b"), "left_semi")
      .agg(count(lit(1)).as("n_tp"))
    np.crossJoin(nt).crossJoin(tp)
      .select(col("n_pred"), col("n_truth"), col("n_tp"),
        when(col("n_pred") > 0,
          col("n_tp").cast("double") / col("n_pred").cast("double"))
          .otherwise(lit(0.0)).as("precision"),
        when(col("n_truth") > 0,
          col("n_tp").cast("double") / col("n_truth").cast("double"))
          .otherwise(lit(0.0)).as("recall"))
  }

  /** The executable form of the exact-ground-truth contract: the
    * all-pairs Jaccard miner ([[ngramJaccardPairs]]) grows superlinearly
    * with near-dup density, so its documented role is a TUNING READOUT ON
    * A SAMPLE — this operator IS that contract. Hash-sample the DOCUMENTS
    * (both miners must see the same restricted corpus so their pair
    * universes coincide; sampling the pair tables instead would measure
    * nothing), run `pred` and `truth` over the sample, and score
    * agreement. Doc-sampling at `frac` shrinks the pair space ~frac², so
    * even the exact miner's worst case is bounded by the caller's knob;
    * the h60 gate makes the readout reproducible run-to-run and
    * engine-to-engine.
    */
  def pairAgreementSampled(
      docs: DataFrame,
      frac: Double,
      salt: String,
      pred: DataFrame => DataFrame,
      truth: DataFrame => DataFrame): DataFrame = {
    val sampled = Curate.sampleByHash(docs, col("doc_id"), frac, salt)
    pairAgreement(pred(sampled), truth(sampled))
  }

  // ---- shared ED-Join kernel --------------------------------------------
  // The completeness-critical construction common to editDistancePairs /
  // editDistanceAgainst: one implementation so the prefix logic cannot
  // drift between the self-join and bipartite forms.

  /** Histogram classes for the content filter: 32 is measured as
    * discriminating as a full per-code-point histogram on this corpus
    * (302 of 267k sf0.1 candidates pass either way) at a quarter of the
    * signature bytes shuffled per candidate.
    */
  private val EdSigClasses = 32

  /** Occurrence-tagged positional q-grams (multiset → set encoding):
    * (doc_id, ed_len, gram, occ) where occ numbers repeats of the same
    * gram by position. The tagging is a per-row codegen pass
    * ([[graft.functions.TextFunctions.taggedQGrams]]) — the equivalent
    * posexplode + (doc, gram)-window form shuffles one row per gram just
    * to number repeats that never leave their document.
    */
  private def edTagged(docs: DataFrame, q: Int): DataFrame = docs
    .select(col("doc_id"), length(col("text")).as("ed_len"),
      explode(taggedQGrams(col("text"), q)).as("tg"))
    .select(col("doc_id"), col("ed_len"), col("tg.gram"), col("tg.occ"))

  /** Each doc's (d·q+1)-token prefix under the shared total order
    * (token df ASC, gram ASC, occ ASC). `dfs` is (gram, occ, ed_df);
    * tokens absent from it take df 0 — maximally rare — which is a no-op
    * for the self-join form (every token is in its own df table) and the
    * novel-gram fast path for the bipartite form.
    */
  private def edPrefix(grams: DataFrame, dfs: DataFrame, d: Int, q: Int): DataFrame =
    grams
      .join(dfs, Seq("gram", "occ"), "left")
      .withColumn("ed_df0", coalesce(col("ed_df"), lit(0L)))
      .withColumn("ed_r", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("ed_df0").asc, col("gram").asc, col("occ").asc)))
      .filter(col("ed_r") <= d * q + 1)
      .select(col("doc_id"), col("ed_len"), col("gram"), col("occ"))

  /** The |len_a − len_b| ≤ d necessary condition as a JOIN KEY: bucket
    * width d+1 makes qualifying pairs differ by ≤ 1 bucket, so the probe
    * side keeps its own bucket and the index side replicates into ±1
    * (×3 rows) — far pairs never enter the join stream instead of being
    * materialized then filtered (94% of raw prefix token matches fail
    * the length cut, measured at sf0.1).
    */
  private def edProbeBucket(prefix: DataFrame, d: Int): DataFrame =
    prefix.withColumn("ed_bk", expr(s"ed_len DIV ${d + 1}"))

  private def edIndexBuckets(prefix: DataFrame, d: Int): DataFrame =
    prefix.withColumn("ed_bk",
      explode(array(expr(s"ed_len DIV ${d + 1} - 1"), expr(s"ed_len DIV ${d + 1}"),
        expr(s"ed_len DIV ${d + 1} + 1"))))

  /** Candidate verification, cheapest test first:
    *
    *  1. content filter (ED-Join's mismatch-filter idea, Xiao et al.
    *     VLDB'08 §5, applied as the whole-string frequency-distance
    *     bound): class-histogram L1 ≤ 2d is NECESSARY for ED ≤ d — one
    *     edit perturbs the code-point frequency vector by at most 2 in
    *     L1, and folding into [[EdSigClasses]] classes only shrinks L1,
    *     so the filter can never drop a true pair. The candidate stream
    *     joins k-int signatures (computed once per doc, codegen
    *     [[graft.functions.expressions.CharClassHistogram]]), not texts:
    *     far pairs — 99.9% of candidates on this corpus — are killed
    *     while carrying 32 ints, and never shuffle a text at all.
    *  2. thresholded `levenshtein(a, b, d)` (banded O(d·len) DP, early
    *     exit, -1 when the distance exceeds d) for the survivors only —
    *     a built-in codegen'd expression whose kept values equal plain
    *     levenshtein, so the final output replays bit-for-bit in the
    *     DuckDB oracle regardless of candidate strategy.
    *
    * `cands` carries (aKey, bKey); aDocs/bDocs are (doc_id, text).
    */
  private def edVerify(
      cands: DataFrame, aKey: String, bKey: String,
      aDocs: DataFrame, bDocs: DataFrame, d: Int): DataFrame = {
    val sigA = aDocs.select(col("doc_id").as(aKey),
      charClassHist(col("text"), EdSigClasses).as("ed_sig_a"))
    val sigB = bDocs.select(col("doc_id").as(bKey),
      charClassHist(col("text"), EdSigClasses).as("ed_sig_b"))
    val near = cands
      .join(sigA, Seq(aKey))
      .join(sigB, Seq(bKey))
      .filter(l1Int(col("ed_sig_a"), col("ed_sig_b")) <= lit(2L * d))
      .select(col(aKey), col(bKey))
    near
      .join(aDocs.select(col("doc_id").as(aKey), col("text").as("ed_ta")), Seq(aKey))
      .join(bDocs.select(col("doc_id").as(bKey), col("text").as("ed_tb")), Seq(bKey))
      .withColumn("dist", levenshtein(col("ed_ta"), col("ed_tb"), d).cast("long"))
      .filter(col("dist") >= 0)
      .select(col(aKey), col(bKey), col("dist"))
  }

  /** Exact edit-distance near-dup pairs: every (doc_a < doc_b) with
    * Levenshtein(text_a, text_b) ≤ d — the short-text/near-identical
    * miner (title dedup, instruction-data variants) complementing the
    * set-similarity family, COMPLETE and EXACT over all docs of length
    * ≥ (d+1)·q. (Shorter strings can evade every q-gram bound — one edit
    * can rewrite their whole gram set — so they are out of contract;
    * [[editDistanceShortPairs]] is the all-pairs companion for that
    * length class.)
    *
    * Why complete (Gravano et al. VLDB'01 count filter + the ED-Join
    * prefix principle, Xiao et al. VLDB'08): one edit disturbs at most q
    * of a string's len−q+1 positional q-grams, so ED ≤ d implies the
    * MULTISET gram intersection is ≥ max(|Gₐ|,|G_b|) − d·q. Encoding the
    * multiset as occurrence-tagged tokens (gram, occ) turns that into a
    * set bound, and the prefix principle then says the pair must share a
    * token inside each side's (d·q+1)-sized prefix under ANY common total
    * order — ours is (global token df ASC, gram ASC, occ ASC):
    * rarest-first, which doubles as the skew valve, because a boilerplate
    * gram flooding the corpus lands in almost no doc's prefix and so
    * never builds a hot posting list. Candidates = prefix-posting
    * equi-join (never a cross join) whose KEY carries the necessary
    * |len_a − len_b| ≤ d cut as a length bucket ([[edProbeBucket]] /
    * [[edIndexBuckets]]): on a template-heavy corpus the prefix filter
    * alone leaves ~40% of all pairs and 94% of its raw token matches
    * fail the length cut (measured at sf0.1), so bucketing keeps them
    * out of the join stream instead of materializing-then-filtering.
    * Survivors run the two-stage verify of [[edVerify]]: the
    * content-based mismatch filter (class-histogram L1 ≤ 2d — a
    * necessary condition that kills 99.9% of candidates on this corpus
    * while carrying 32-int signatures instead of texts), then one
    * thresholded banded `levenshtein(a, b, d)` each. Exactness makes the
    * output invariant to the candidate strategy, so the DuckDB oracle
    * may (and does) generate candidates with the simpler in-join length
    * predicate and no content filter, yet replays the result
    * bit-for-bit.
    *
    * Scale shape: gram fan-out is the winnow/shingle explode class (one
    * per-row array, zero shuffle); occ-tagging and prefix ranks are
    * doc_id-partitioned windows; the posting join carries d·q+1 rows per
    * doc. N identical docs still cost N² — those pairs ARE the output.
    * Pins: the tagged-gram table feeds both the df aggregation and the
    * prefix rank (released once the prefix is materialized), and the
    * prefix table feeds both sides of the candidate self-join. The
    * eligible (doc_id, text) frame is deliberately NOT pinned: its
    * readers each want a column-pruned parquet re-scan, not a pin of the
    * corpus's text bytes.
    */
  def editDistancePairs(docs: DataFrame, d: Int, q: Int = 4): DataFrame = {
    require(d >= 0, "d must be non-negative")
    require(q >= 1, "q must be positive")
    val minLen = (d + 1) * q
    val eligible = docs.select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= minLen)
    // Pinned: the tagged-gram table feeds BOTH the token-df aggregation
    // and the prefix rank join — unpinned, the corpus-sized explode and
    // its occ window run twice (zero ReusedExchange for multi-referenced
    // derived tables, the measured house rule).
    val grams = Pins.pin(edTagged(eligible, q))
    val tokenDf = grams.groupBy(col("gram"), col("occ"))
      .agg(count(lit(1)).as("ed_df"))
    val prefix = Pins.pin(edPrefix(grams, tokenDf, d, q))
    Pins.release(grams) // prefix is materialized; the explode is done with
    val cands = edProbeBucket(prefix, d).as("a")
      .join(edIndexBuckets(prefix, d).as("b"),
        col("a.gram") === col("b.gram") && col("a.occ") === col("b.occ") &&
          col("a.ed_bk") === col("b.ed_bk") &&
          col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.ed_len") - col("b.ed_len")) <= d)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val out = edVerify(cands, "doc_a", "doc_b", eligible, eligible, d)
    val pinned = Pins.pin(out)
    Pins.release(prefix)
    pinned
  }

  /** Bipartite twin of [[editDistancePairs]] for an incremental crawl:
    * every (batch doc, kept doc) pair within Levenshtein ≤ d — the
    * edit-distance analog of [[dedupAgainst]]'s band join (survivors =
    * the batch anti-joined on the pair table). Same length contract and
    * completeness argument as the self-join form — BOTH sides ≥ (d+1)·q;
    * [[editDistanceShortAgainst]] is the exact bipartite complement for
    * pairs with a short side, and their union is the full bipartite pair
    * universe. Callers pass disjoint id spaces (crawl waves are). The common total order both sides rank
    * their prefixes under is (KEPT-side token df ASC, gram ASC, occ ASC):
    * the prefix principle needs only SOME shared total order, and the
    * kept corpus is the statistics-bearing side an accreting crawl
    * already holds — a new batch needs no corpus-wide df pass. Tokens
    * unseen in kept take df 0, maximally rare, so a batch doc's NOVEL
    * grams fill its prefix first — novel content produces few posting
    * collisions, exactly the cheap fast path a crawl wants.
    *
    * Pins: kept's tagged grams feed the df table and kept's own prefix
    * rank; the token-dimension df table feeds both prefix builds. Both
    * released once the pair table is materialized.
    */
  def editDistanceAgainst(
      batch: DataFrame, kept: DataFrame, d: Int, q: Int = 4): DataFrame = {
    require(d >= 0, "d must be non-negative")
    require(q >= 1, "q must be positive")
    val minLen = (d + 1) * q
    def eligible(df: DataFrame) = df.select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= minLen)
    val keptE = eligible(kept)
    val batchE = eligible(batch)
    val keptGrams = Pins.pin(edTagged(keptE, q))
    val keptDf = Pins.pin(keptGrams.groupBy(col("gram"), col("occ"))
      .agg(count(lit(1)).as("ed_df")))
    // length-bucketed posting join + two-stage verify, as in
    // [[editDistancePairs]]: the batch probes its own bucket, the kept
    // prefix replicates into ±1 buckets
    val cands = edProbeBucket(edPrefix(edTagged(batchE, q), keptDf, d, q), d).as("a")
      .join(edIndexBuckets(edPrefix(keptGrams, keptDf, d, q), d).as("b"),
        col("a.gram") === col("b.gram") && col("a.occ") === col("b.occ") &&
          col("a.ed_bk") === col("b.ed_bk") &&
          abs(col("a.ed_len") - col("b.ed_len")) <= d)
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("kept_id"))
      .distinct()
    val out = edVerify(cands, "doc_id", "kept_id", batchE, keptE, d)
    val pinned = Pins.pin(out)
    Pins.release(keptDf)
    Pins.release(keptGrams)
    pinned
  }

  /** All-pairs companion for the length class [[editDistancePairs]]
    * excludes: every (doc_a < doc_b) with Levenshtein ≤ d among docs of
    * length < (d+1)·q — strings short enough that one edit can rewrite
    * their whole q-gram set, so no gram-prefix bound applies. The class
    * is small by construction (the caller's q bounds it), so completeness
    * comes from length alone: ED ≤ d forces |len_a − len_b| ≤ d, and the
    * same bucket scheme as the main miner ([[edProbeBucket]] /
    * [[edIndexBuckets]], probe keeps its bucket, index replicates ±1)
    * turns the class all-pairs into a bucket equi-join — never a cross
    * join over the corpus, quadratic only within a length bucket of the
    * SHORT class. Verification is the shared [[edVerify]] two-stage
    * pass; output schema matches [[editDistancePairs]].
    *
    * NOT full-corpus coverage on its own union with the main miner: both
    * filters are two-sided, so a pair with one doc in
    * [(d+1)·q − d, (d+1)·q) and the other in [(d+1)·q, (d+1)·q + d) has
    * |len diff| ≤ d yet lands in neither class —
    * [[editDistanceBoundaryPairs]] mines exactly that straddle band.
    * Full-corpus coverage = the three-way union (pairs ∪ shortPairs ∪
    * boundaryPairs); the classes partition the pair universe (both long /
    * both short / one of each), so the union is also duplicate-free.
    */
  def editDistanceShortPairs(docs: DataFrame, d: Int, q: Int = 4): DataFrame = {
    require(d >= 0, "d must be non-negative")
    require(q >= 1, "q must be positive")
    val maxLen = (d + 1) * q
    val short = docs.select(col("doc_id"), col("text"))
      .filter(length(col("text")) < maxLen)
    val keyed = short.select(col("doc_id"), length(col("text")).as("ed_len"))
    val cands = edProbeBucket(keyed, d).as("a")
      .join(edIndexBuckets(keyed, d).as("b"),
        col("a.ed_bk") === col("b.ed_bk") &&
          col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.ed_len") - col("b.ed_len")) <= d)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    edVerify(cands, "doc_a", "doc_b", short, short, d)
  }

  /** The straddle-band miner completing the length partition: every
    * (doc_a < doc_b) with Levenshtein ≤ d where exactly ONE doc is short
    * (length < (d+1)·q) and the other long. [[editDistancePairs]] filters
    * BOTH sides to ≥ (d+1)·q and [[editDistanceShortPairs]] BOTH to
    * < (d+1)·q, so a cross-class pair is seen by neither — yet ED ≤ d
    * forces |len_a − len_b| ≤ d, which pins any qualifying cross-class
    * pair inside the width-d bands [(d+1)·q − d, (d+1)·q) ×
    * [(d+1)·q, (d+1)·q + d). Both bands are tiny by construction (width d
    * in a corpus-wide length distribution), so — as in the short class —
    * completeness comes from length alone: the same ±1 bucket scheme
    * ([[edProbeBucket]] / [[edIndexBuckets]]) turns the band bipartite
    * product into a bucket equi-join, then the shared [[edVerify]]
    * two-stage pass (L1 content filter, banded levenshtein) confirms.
    * Quadratic only within the two width-d bands, never across the
    * corpus. d = 0 degenerates correctly: both bands are empty (ED 0
    * needs equal lengths, so no cross-class pair exists).
    *
    * Output schema matches [[editDistancePairs]] with doc_a < doc_b
    * (normalized after the bipartite verify — a short doc's id may
    * exceed its long partner's). Three-way union (pairs ∪ shortPairs ∪
    * boundaryPairs) = full-corpus coverage, duplicate-free.
    */
  def editDistanceBoundaryPairs(docs: DataFrame, d: Int, q: Int = 4): DataFrame = {
    require(d >= 0, "d must be non-negative")
    require(q >= 1, "q must be positive")
    val minLen = (d + 1) * q
    val shortBand = docs.select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= minLen - d && length(col("text")) < minLen)
    val longBand = docs.select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= minLen && length(col("text")) < minLen + d)
    def keyed(df: DataFrame) =
      df.select(col("doc_id"), length(col("text")).as("ed_len"))
    val cands = edProbeBucket(keyed(shortBand), d).as("a")
      .join(edIndexBuckets(keyed(longBand), d).as("b"),
        col("a.ed_bk") === col("b.ed_bk") &&
          abs(col("a.ed_len") - col("b.ed_len")) <= d)
      .select(col("a.doc_id").as("short_id"), col("b.doc_id").as("long_id"))
      .distinct()
    edVerify(cands, "short_id", "long_id", shortBand, longBand, d)
      .select(least(col("short_id"), col("long_id")).as("doc_a"),
        greatest(col("short_id"), col("long_id")).as("doc_b"),
        col("dist"))
  }

  /** Bipartite crawl twin for the SHORT side of the length partition:
    * every (batch doc, kept doc) pair with Levenshtein ≤ d where at
    * least one side is short (length < (d+1)·q) — the exact complement
    * of [[editDistanceAgainst]]'s both-long contract, so
    * `editDistanceAgainst(b, k, d, q) ∪ editDistanceShortAgainst(b, k,
    * d, q)` is the FULL bipartite pair universe, duplicate-free (the
    * min-length predicate partitions it). An accreting crawl runs both
    * per wave; survivors = the batch anti-joined on the union.
    *
    * Completeness from length alone, as in [[editDistanceShortPairs]]:
    * if min(len_a, len_b) < (d+1)·q and ED ≤ d then BOTH sides have
    * length < (d+1)·q + d, so both live in caller-bounded short bands
    * and the ±1 bucket scheme enumerates every length-qualifying pair;
    * the in-join `min(len) < (d+1)·q` cut excludes exactly the pairs the
    * main bipartite miner already owns. No df statistics needed — the
    * kept corpus contributes only its short band, so a wave is cheap
    * regardless of corpus size. Shared [[edVerify]] two-stage pass;
    * output schema (doc_id, kept_id, dist) matches
    * [[editDistanceAgainst]] for a schema-compatible union.
    */
  def editDistanceShortAgainst(
      batch: DataFrame, kept: DataFrame, d: Int, q: Int = 4): DataFrame = {
    require(d >= 0, "d must be non-negative")
    require(q >= 1, "q must be positive")
    val minLen = (d + 1) * q
    def band(df: DataFrame) = df.select(col("doc_id"), col("text"))
      .filter(length(col("text")) < minLen + d)
    val batchB = band(batch)
    val keptB = band(kept)
    def keyed(df: DataFrame) =
      df.select(col("doc_id"), length(col("text")).as("ed_len"))
    val cands = edProbeBucket(keyed(batchB), d).as("a")
      .join(edIndexBuckets(keyed(keptB), d).as("b"),
        col("a.ed_bk") === col("b.ed_bk") &&
          abs(col("a.ed_len") - col("b.ed_len")) <= d &&
          (col("a.ed_len") < minLen || col("b.ed_len") < minLen))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("kept_id"))
      .distinct()
    edVerify(cands, "doc_id", "kept_id", batchB, keptB, d)
  }
}
