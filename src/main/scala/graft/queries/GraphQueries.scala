package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Graph analytics over the document-similarity graph (SURVEY §2 —
  * rides d2's near-dup pair artifact, like d7's connected components).
  */
object GraphQueries {

  /** g1: fixed-iteration deterministic PageRank (Page/Brin/Motwani/
    * Winograd 1999) over the d2 near-dup graph — centrality on the
    * duplication graph ranks the CANONICAL copies: a doc many
    * near-dups point at is the template/original, the right survivor
    * for d7's clusters and the first thing a curation pass should
    * eyeball. Degree rides along (the d7 cluster map gives
    * membership; this adds WITHIN-cluster structure).
    *
    * Same execution family as d7's label propagation: per iteration
    * two joins + one aggregation over the EDGE SUBGRAPH only (the
    * tiny pair artifact — the corpus never shuffles); 3 fixed
    * iterations, so the plan is static and needs no convergence
    * action. All arithmetic is ×1e6-integer with round-half-up
    * division ([[graft.functions.IntMath.halfUpDiv]]) — per-node
    * shares, the 0.85 damping product, and the 0.15/N base are all
    * exact, so ranks are bit-identical across engines and
    * partitionings (the s3 convention, applied to graph iteration).
    * Isolated docs keep the base rank (their mass leaks — the
    * standard simplified dangling-node treatment, mirrored exactly
    * in the oracle). */
  def g1PageRank(spark: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    import spark.implicits._
    val halfUp = graft.functions.IntMath.halfUpDiv _
    val pairs = graft.dedup.Dedup.d2Pairs(spark, dir, threshold = 0.7)
      .select($"doc_id1".as("a"), $"doc_id2".as("b"))
    // edge-sized, referenced once per iteration (inSum) plus deg's
    // build: memoized hash-partitioned on `a` so each round's share
    // join reuses one exchange instead of re-deriving the pair
    // artifact's union+shuffle (AQE defeats ReuseExchange — the
    // Dedup.scala:106 position)
    val edges = graft.operators.Indexes.memo(s"g1_edges:$dir") {
      pairs.unionAll(pairs.select($"b".as("a"), $"a".as("b"))).repartition($"a")
    }
    // node-sized, referenced once per iteration plus the final join —
    // memoized like base; lazy it is up to iters+1 edge-scale
    // aggregations where one suffices
    val deg = graft.operators.Indexes.memo(s"g1_deg:$dir") {
      edges.groupBy($"a").agg(count(lit(1)).as("deg"))
    }
    val docs = Tables.read(spark, dir, "documents").select($"doc_id")
    val nFrame = docs.agg(count(lit(1)).as("n"))
    // node-sized, referenced once per iteration plus the final join —
    // memoized so the per-round lineage doesn't re-scan the corpus
    val base = graft.operators.Indexes.memo(s"g1_base:$dir") {
      docs.crossJoin(broadcast(nFrame))
        .select($"doc_id",
          halfUp(lit(150000L), $"n").as("base_e6"),
          halfUp(lit(1000000L), $"n").as("r0"))
    }
    var r = base.select($"doc_id", $"r0".as("r_e6"))
    for (_ <- 1 to iters) {
      val share = r.join(deg, r("doc_id") === deg("a"))
        .select(r("doc_id").as("u"), halfUp($"r_e6", $"deg").as("share"))
      val inSum = edges.join(share, edges("a") === share("u"))
        .groupBy(edges("b")).agg(sum($"share").as("s"))
      r = base.join(inSum, base("doc_id") === inSum("b"), "left")
        .select(base("doc_id"),
          ($"base_e6" + halfUp(coalesce($"s", lit(0L)) * 85L, lit(100L))).as("r_e6"))
    }
    r.join(deg.select($"a".as("doc_id"), $"deg"), Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"deg", lit(0L)).as("degree"), $"r_e6".as("rank_e6"))
  }

  /** g1 oracle: d2's pair CTEs + the same 3 iterations unrolled
    * (generated, like the Lloyd's chains); half-up division spelled
    * `(2n+d)//(2d)` — every quantity here is non-negative. */
  val g1Sql: String = {
    val iters = 3
    def hu(n: String, d: String) = s"((2*($n) + ($d)) // (2*($d)))"
    val iterCtes = (1 to iters).flatMap { i =>
      Seq(
        s"""sh$i AS (
           |  SELECT r.doc_id AS u, ${hu("r.r", "g.deg")} AS share
           |  FROM r${i - 1}t r JOIN deg g ON g.a = r.doc_id)""".stripMargin,
        s"""in$i AS (
           |  SELECT e.b, CAST(sum(sh.share) AS BIGINT) AS s
           |  FROM edges e JOIN sh$i sh ON sh.u = e.a GROUP BY e.b)""".stripMargin,
        s"""r${i}t AS (
           |  SELECT b.doc_id, b.base_e6 + ${hu("coalesce(i.s, 0) * 85", "100")} AS r
           |  FROM base b LEFT JOIN in$i i ON i.b = b.doc_id)""".stripMargin)
    }
    s"""WITH ${graft.dedup.Dedup.d2Ctes},
       |p AS MATERIALIZED (SELECT doc_id1 AS a, doc_id2 AS b FROM est WHERE est_jaccard >= 0.7),
       |edges AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
       |deg AS (SELECT a, count(*) AS deg FROM edges GROUP BY a),
       |nn AS (SELECT count(*) AS n FROM documents),
       |base AS (
       |  SELECT d.doc_id, ${hu("150000", "nn.n")} AS base_e6,
       |         ${hu("1000000", "nn.n")} AS r0
       |  FROM documents d, nn),
       |r0t AS (SELECT doc_id, r0 AS r FROM base),
       |${iterCtes.mkString(",\n")}
       |SELECT r.doc_id, CAST(coalesce(g.deg, 0) AS BIGINT) AS degree,
       |  CAST(r.r AS BIGINT) AS rank_e6
       |FROM r${iters}t r LEFT JOIN deg g ON g.a = r.doc_id
       |ORDER BY r.doc_id""".stripMargin
  }

  /** g2: per-doc triangle count + local clustering coefficient over
    * the d2 near-dup graph ([[graft.operators.Graph.triangles]],
    * degree-oriented Suri–Vassilvitskii enumeration). The LCC
    * separates CLIQUE-shaped duplication (template + N mutually-similar
    * copies → lcc ≈ 1: pick one survivor, drop the rest) from
    * CHAIN-shaped drift (A~B~C but A≁C → lcc ≈ 0: each hop is a
    * borderline pair a curation pass should check before d7's
    * transitive closure merges the whole chain). lcc = 2·tri/(deg·
    * (deg−1)) as a ×1e6 integer via halfUpDiv — exact both engines. */
  def g2Triangles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val halfUp = graft.functions.IntMath.halfUpDiv _
    val pairs = graft.dedup.Dedup.d2Pairs(spark, dir, threshold = 0.7)
      .select($"doc_id1", $"doc_id2")
    graft.operators.Graph.triangles(pairs)
      .select($"id".as("doc_id"), $"degree", $"triangles",
        when($"degree" >= 2L,
          halfUp($"triangles" * 2000000L, $"degree" * ($"degree" - 1L)))
          .otherwise(0L).as("lcc_e6"))
  }

  /** g2 oracle: d2's pair CTEs + the same orientation/wedge/closure
    * joins; half-up division as `(2n+d)//(2d)` (all non-negative). */
  val g2Sql: String =
    s"""WITH ${graft.dedup.Dedup.d2Ctes},
       |p AS MATERIALIZED (SELECT doc_id1 AS a, doc_id2 AS b FROM est WHERE est_jaccard >= 0.7),
       |und AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
       |deg AS (SELECT a AS id, count(*) AS deg FROM und GROUP BY a),
       |wd AS (
       |  SELECT p.a, p.b, da.deg AS da, db.deg AS db
       |  FROM p JOIN deg da ON da.id = p.a JOIN deg db ON db.id = p.b),
       |ori AS (
       |  SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS u,
       |         CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS v,
       |         CASE WHEN da < db OR (da = db AND a < b) THEN db ELSE da END AS dv
       |  FROM wd),
       |wed AS (
       |  SELECT o1.u, o1.v, o2.v AS w
       |  FROM ori o1 JOIN ori o2 ON o2.u = o1.u
       |    AND (o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v))),
       |tri AS (
       |  SELECT wed.u, wed.v, wed.w
       |  FROM wed JOIN ori c ON c.u = wed.v AND c.v = wed.w),
       |pn AS (
       |  SELECT id, count(*) AS t FROM (
       |    SELECT u AS id FROM tri
       |    UNION ALL SELECT v FROM tri
       |    UNION ALL SELECT w FROM tri)
       |  GROUP BY id)
       |SELECT d.id AS doc_id, CAST(d.deg AS BIGINT) AS degree,
       |  CAST(coalesce(pn.t, 0) AS BIGINT) AS triangles,
       |  CAST(CASE WHEN d.deg >= 2 THEN
       |    ((2*(coalesce(pn.t, 0)*2000000) + d.deg*(d.deg-1)) // (2*(d.deg*(d.deg-1))))
       |    ELSE 0 END AS BIGINT) AS lcc_e6
       |FROM deg d LEFT JOIN pn ON pn.id = d.id
       |ORDER BY doc_id""".stripMargin

  /** g3: community detection by SYNCHRONOUS label propagation
    * (Raghavan/Albert/Kumara 2007) over the d2 near-dup graph — the
    * sub-structure pass between g2's local view and d7's transitive
    * closure: where d7 merges everything reachable (one borderline
    * edge chains two template families together), LP lets densely
    * duplicated families keep their own label, so a curation pass
    * can split an over-merged d7 cluster along community lines.
    * Fixed 3 iterations, every node adopts its neighbors' majority
    * label (ties → smallest label id), updates applied synchronously
    * — fully deterministic, no demon of asynchronous LP's update
    * order.
    *
    * Scale shape: d7's execution family — per iteration one join of
    * the edge list against the label frame + one (node, label)
    * map-side-combined count + an argmax window partitioned by node
    * (never global); everything ∝ the pair artifact, the corpus
    * never shuffles; static 3-iteration plan, no convergence action.
    */
  /** The converged LP label frame — the artifact both g3 (membership
    * + sizes) and g7 (modularity audit) project, memoized once per
    * (dir, iters) like d2's pair set: the 3-round LP is the
    * expensive part, and a lazy consumer referencing it k times
    * would re-run all k·3 rounds (measured on g7: 6.7 s for three
    * references vs 3.4 for one). */
  private[graft] def g3Labels(spark: SparkSession, dir: String, iters: Int = 3): DataFrame =
    graft.operators.Indexes.memo(s"g3_labels:$dir:$iters") {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val pairs = graft.dedup.Dedup.d2Pairs(spark, dir, threshold = 0.7)
        .select($"doc_id1".as("a"), $"doc_id2".as("b"))
      val edges = pairs.unionAll(pairs.select($"b".as("a"), $"a".as("b")))
      val nodes = edges.select($"a".as("id")).distinct()
      var lab = nodes.select($"id", $"id".as("label"))
      val w = Window.partitionBy($"dst").orderBy($"cnt".desc, $"label")
      for (_ <- 1 to iters) {
        lab = edges.join(lab, edges("a") === lab("id"))
          .select(edges("b").as("dst"), $"label")
          .groupBy($"dst", $"label").agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"dst".as("id"), $"label")
      }
      lab
    }

  def g3Communities(spark: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    import spark.implicits._
    val lab = g3Labels(spark, dir, iters)
    val size = lab.groupBy($"label").agg(count(lit(1)).as("comm_size"))
    lab.join(size, "label")
      .select($"id".as("doc_id"), $"label".as("community"), $"comm_size")
  }

  /** The label-propagation CTE chain (d2 pairs → edges → 3 LP rounds
    * → community sizes) — ONE copy of the g3 formation, shared by the
    * g3 oracle and g7's modularity audit. */
  private def g3Ctes: String = {
    val iters = 3
    val iterCtes = (1 to iters).map { i =>
      s"""l$i AS (
         |  SELECT id, label FROM (
         |    SELECT e.b AS id, l.label, count(*) AS cnt
         |    FROM edges e JOIN l${i - 1} l ON l.id = e.a GROUP BY 1, 2)
         |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY cnt DESC, label) = 1)""".stripMargin
    }
    // `lfin` aliases the final round so consumers never hard-code a
    // round index: bumping `iters` would otherwise leave a stale
    // `l3` reference silently resolving to an INTERMEDIATE round
    s"""${graft.dedup.Dedup.d2Ctes},
       |p AS MATERIALIZED (SELECT doc_id1 AS a, doc_id2 AS b FROM est WHERE est_jaccard >= 0.7),
       |edges AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
       |l0 AS (SELECT DISTINCT a AS id, a AS label FROM edges),
       |${iterCtes.mkString(",\n")},
       |lfin AS (SELECT id, label FROM l$iters),
       |sz AS (SELECT label, count(*) AS comm_size FROM lfin GROUP BY label)""".stripMargin
  }

  /** g3 oracle: d2's pair CTEs + the same 3 synchronous rounds
    * unrolled (argmax via QUALIFY row_number, the same tie-break). */
  val g3Sql: String =
    s"""WITH $g3Ctes
       |SELECT l.id AS doc_id, CAST(l.label AS BIGINT) AS community,
       |  CAST(s.comm_size AS BIGINT) AS comm_size
       |FROM lfin l JOIN sz s ON s.label = l.label
       |ORDER BY doc_id""".stripMargin

  /** g4: k-CORE PEELING (Seidman 1983; distributed rounds à la
    * Montresor et al.) over the d2 near-dup graph, k = 2, 3 fixed
    * rounds — the density layer under g2/g3: a node that survives the
    * 2-core peel sits inside a duplication STRUCTURE (cycle/clique —
    * template families), while peeled nodes are pendant drift (chains
    * g2's lcc already flags edge-by-edge). Curation reading: the
    * 2-core is where "pick one canonical copy" deletes many rows;
    * pendant near-dups are borderline pairs to review individually.
    * Emits, per pair-graph node, the round it was peeled (0 = still
    * in after 3 rounds — fixed-round like g1/g3, so the plan is
    * static; the round count is part of the query's contract) and
    * its degree inside the surviving subgraph.
    *
    * Scale shape: the d7/g1/g3 execution family — per round one
    * semi-join of the edge list against the alive set + one
    * map-side-combined degree count, everything ∝ the pair artifact
    * (corpus never shuffles), alive sets only shrink. */
  def g4KCore(spark: SparkSession, dir: String, k: Int = 2, rounds: Int = 3)
  : DataFrame = {
    import spark.implicits._
    val pairs = graft.dedup.Dedup.d2Pairs(spark, dir, threshold = 0.7)
      .select($"doc_id1".as("a"), $"doc_id2".as("b"))
    graft.operators.Graph.kCore(pairs, k, rounds)
      .select($"id".as("doc_id"), $"peel_round", $"core_deg")
  }

  /** g5: multi-source BFS hop distance over the d2 near-dup graph —
    * every pair-graph node's distance to its nearest LOCAL-MINIMUM
    * canonical (a node whose id is smaller than all its neighbors':
    * exactly the nodes that win the first round of d7's min-label
    * propagation). Hop distance is the curation complement to d7's
    * flat cluster map: hops = 1 is a direct near-dup of a canonical
    * (safe to drop), larger hops reach a canonical only through a
    * CHAIN of borderline pairs (the drift g2's lcc flags) — review
    * before deleting. Fixed 4 rounds (the g1/g3/g4 static-plan
    * convention; the round budget is part of the contract), nodes
    * unreached within the budget report hops = -1.
    *
    * Scale shape: textbook frontier BFS on DataFrames — per round ONE
    * join of the edge list against the just-reached frontier (never
    * the full reached set, never the corpus), an anti-join against
    * the node-sized state to keep first-touch hops, and a
    * localCheckpoint of the linear (id, hops) state frame (the g4
    * died-count convention — node-sized state, lineage cut per
    * round; production would checkpoint reliably). Total join work
    * over all rounds ≤ Σ deg(reached) ≤ 2m. */
  def g5BfsHops(spark: SparkSession, dir: String, rounds: Int = 4): DataFrame = {
    import spark.implicits._
    val pairs = graft.dedup.Dedup.d2Pairs(spark, dir, threshold = 0.7)
      .select($"doc_id1", $"doc_id2")
    graft.operators.Graph.bfsHops(pairs, rounds)
      .select($"id".as("doc_id"), $"hops")
  }

  /** g5 oracle: d2's pair CTEs + the same 4 BFS rounds unrolled
    * (frontier = previous round's new layer, anti-join via
    * null-rejecting LEFT JOIN). */
  val g5Sql: String = {
    val rounds = 4
    val iterCtes = (1 to rounds).flatMap { i =>
      Seq(
        s"""n$i AS (
           |  SELECT DISTINCT e.b AS id
           |  FROM edges e JOIN s${i - 1} f ON f.id = e.a AND f.hops = ${i - 1})""".stripMargin,
        s"""s$i AS (
           |  SELECT id, hops FROM s${i - 1}
           |  UNION ALL
           |  SELECT n.id, $i AS hops
           |  FROM n$i n LEFT JOIN s${i - 1} s ON s.id = n.id
           |  WHERE s.id IS NULL)""".stripMargin)
    }
    s"""WITH ${graft.dedup.Dedup.d2Ctes},
       |p AS MATERIALIZED (SELECT doc_id1 AS a, doc_id2 AS b FROM est WHERE est_jaccard >= 0.7),
       |edges AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
       |nodes AS (SELECT DISTINCT a AS id FROM edges),
       |s0 AS (
       |  SELECT a AS id, 0 AS hops FROM edges GROUP BY a HAVING a < min(b)),
       |${iterCtes.mkString(",\n")}
       |SELECT n.id AS doc_id, CAST(coalesce(s.hops, -1) AS BIGINT) AS hops
       |FROM nodes n LEFT JOIN s$rounds s ON s.id = n.id
       |ORDER BY doc_id""".stripMargin
  }

  /** g6: common-neighbor LINK PREDICTION (Liben-Nowell & Kleinberg
    * 2003, the common-neighbors / Jaccard family) over the part
    * CO-PURCHASE graph — parts are adjacent when ≥2 distinct orders
    * contain both (the market-basket projection of lineitem; the ≥2
    * support floor drops one-off coincidences). The prediction read:
    * the top non-adjacent pairs sharing co-purchase partners are the
    * assortment's missing links — recommended bundles no order has
    * contained YET. (The d2 near-dup graph is the wrong substrate
    * here: LSH banding at any threshold keeps whole template families
    * mutually connected, so it has NO non-edge wedges — measured 0 at
    * thresholds 0.5–0.7.) Scores: common-neighbor count, ties broken
    * by ×1e6-integer Jaccard of neighbor sets (|Γu∩Γv| / |Γu∪Γv| via
    * halfUpDiv — exact cross-engine), then (id1, id2) for a total
    * deterministic order; top 20.
    *
    * Scale shape: the co-occurrence self-join is keyed on l_orderkey
    * and quadratic only in BASKET size (bounded per order — the
    * market-basket convention), never in table size. Wedge
    * enumeration at the MIDDLE node (one self-join of the edge list
    * keyed on the wedge center + one map-side-combined count) is
    * Σ deg(mid)² with a DEGREE CAP on wedge centers (the d9 df-cap
    * convention: a hub co-purchased with everything predicts nothing
    * — it's the staple product, the graph's boilerplate). Anti-join
    * against the (small) edge artifact keeps only non-edges; the
    * fact table is scanned once. */
  /** The co-purchase edge list is THE artifact of the g6 family (like
    * d2's pair set): every downstream frame (edges, degrees, wedges,
    * the anti-join) references it repeatedly, and without
    * materialization the tree-shaped lineage re-derives the basket
    * self-join per reference — 26 fact-table scans measured. Memoized
    * = computed once, every consumer reads the cached pair rows; also
    * warmed as its own `_artifacts` step so g6's bench number is its
    * marginal cost, not the index build. */
  /** The deduped (basket, item) projection — the base artifact under
    * BOTH the co-pair index and g8's popularity rollup: one fact-table
    * scan total for the whole g6/g8 family. */
  private[graft] def g6BasketItems(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Indexes.memo(s"g6_items:$dir") {
      import spark.implicits._
      Tables.read(spark, dir, "lineitem")
        .select($"l_orderkey", $"l_partkey").distinct()
    }

  private[graft] def g6CoPairs(spark: SparkSession, dir: String,
                               minSupport: Long = 2L): DataFrame =
    graft.operators.Indexes.memo(s"g6_copairs:$dir:$minSupport") {
      import spark.implicits._
      val li = g6BasketItems(spark, dir)
      val li2 = li.select($"l_orderkey".as("o2"), $"l_partkey".as("p2"))
      li.join(li2, $"l_orderkey" === $"o2" && $"l_partkey" < $"p2")
        .groupBy($"l_partkey".as("a"), $"p2".as("b"))
        .agg(count(lit(1)).as("cooccur"))
        .filter($"cooccur" >= minSupport)
    }

  def g6LinkPred(spark: SparkSession, dir: String, minSupport: Long = 2L,
                 degCap: Int = 64, topK: Int = 20): DataFrame = {
    import spark.implicits._
    val halfUp = graft.functions.IntMath.halfUpDiv _
    val pairs = g6CoPairs(spark, dir, minSupport).select($"a", $"b")
    val edges = pairs.unionAll(pairs.select($"b".as("a"), $"a".as("b")))
    val deg = edges.groupBy($"a".as("id")).agg(count(lit(1)).as("deg"))
    val mids = deg.filter($"deg" <= degCap).select($"id".as("mid"))
    val e1 = edges.join(mids, edges("a") === mids("mid"))
      .select($"mid", edges("b").as("u"))
    val e2 = e1.select($"mid".as("mid2"), $"u".as("v"))
    val cand = e1.join(e2, $"mid" === $"mid2" && $"u" < $"v")
      .groupBy($"u", $"v").agg(count(lit(1)).as("common_nbrs"))
      .join(pairs, $"u" === pairs("a") && $"v" === pairs("b"), "left_anti")
    cand
      .join(deg.select($"id".as("u"), $"deg".as("du")), Seq("u"))
      .join(deg.select($"id".as("v"), $"deg".as("dv")), Seq("v"))
      .select($"u".as("part_id1"), $"v".as("part_id2"), $"common_nbrs",
        halfUp($"common_nbrs" * 1000000L, $"du" + $"dv" - $"common_nbrs")
          .as("jaccard_e6"))
      .orderBy($"common_nbrs".desc, $"jaccard_e6".desc, $"part_id1", $"part_id2")
      .limit(topK)
  }

  /** g6 oracle: the same basket/wedge/anti-join/score formation;
    * half-up division as `(2n+d)//(2d)` (non-negative). */
  val g6Sql: String =
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |co AS (
       |  SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS cooccur
       |  FROM li x JOIN li y ON y.l_orderkey = x.l_orderkey AND x.l_partkey < y.l_partkey
       |  GROUP BY 1, 2),
       |p AS (SELECT a, b FROM co WHERE cooccur >= 2),
       |edges AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
       |deg AS (SELECT a AS id, count(*) AS deg FROM edges GROUP BY a),
       |mids AS (SELECT id AS mid FROM deg WHERE deg <= 64),
       |e1 AS (SELECT e.a AS mid, e.b AS u FROM edges e JOIN mids m ON m.mid = e.a),
       |wcand AS (
       |  SELECT w1.u, w2.u AS v, count(*) AS common_nbrs
       |  FROM e1 w1 JOIN e1 w2 ON w2.mid = w1.mid AND w1.u < w2.u
       |  GROUP BY w1.u, w2.u),
       |ne AS (
       |  SELECT c.u, c.v, c.common_nbrs
       |  FROM wcand c LEFT JOIN p ON p.a = c.u AND p.b = c.v
       |  WHERE p.a IS NULL)
       |SELECT ne.u AS part_id1, ne.v AS part_id2,
       |  CAST(ne.common_nbrs AS BIGINT) AS common_nbrs,
       |  CAST(((2*(ne.common_nbrs * 1000000) + (du.deg + dv.deg - ne.common_nbrs))
       |        // (2*(du.deg + dv.deg - ne.common_nbrs))) AS BIGINT) AS jaccard_e6
       |FROM ne JOIN deg du ON du.id = ne.u JOIN deg dv ON dv.id = ne.v
       |ORDER BY common_nbrs DESC, jaccard_e6 DESC, part_id1, part_id2
       |LIMIT 20""".stripMargin

  /** g7: MODULARITY AUDIT of g3's partition (Newman & Girvan 2004):
    * per community, the contribution Q_c = e_c/m − (d_c/2m)² — intra-
    * community edge share minus the share expected under the degree-
    * preserving null model. The acceptance gate for g3 the way s4/s13
    * gate the ANN tiers: a community with q ≤ 0 is no denser than
    * random (label propagation glued it together; don't split a d7
    * cluster along that line), and the column sum is the partition's
    * global Q. Emits (community, comm_size, in_edges, deg_sum, q_e6).
    *
    * Arithmetic is the OVERFLOW-SAFE staged form: the degree share
    * d_c/2m becomes a ×1e6 integer FIRST (≤ 1e6), then squares and
    * rescales — the naive d_c²·1e6 numerator overflows long once
    * m ≳ 10⁹ edges, exactly the corpus sizes this engine targets.
    * Both halfUp divisions see only non-negative operands (the
    * engines' DIV semantics agree there); q_e6 itself may be
    * negative but is a pure subtraction.
    *
    * Scale shape: g3's labels are re-derived per reference (the LP
    * rounds run over the MEMOIZED pair artifact — no base-table
    * rescan; label frames are node-sized); the audit adds one
    * endpoints→labels join pair over the edge list + two map-side-
    * combined rollups + a 1-row m broadcast. */
  def g7Modularity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = graft.dedup.Dedup.d2Pairs(spark, dir, threshold = 0.7)
      .select($"doc_id1", $"doc_id2")
    // the audit references the label frame three times (both edge
    // endpoints + the degree rollup) — it rides the shared g3Labels
    // memo, so each reference reads the cached node-sized frame
    val lab = g3Labels(spark, dir, iters = 3)
      .select($"id", $"label".as("community"))
    graft.operators.Graph.modularity(pairs, lab)
  }

  /** g7 oracle: the shared g3 CTE chain + the same staged
    * overflow-safe modularity arithmetic. */
  val g7Sql: String = {
    def hu(n: String, d: String) = s"((2*($n) + ($d)) // (2*($d)))"
    val dsh = hu("dc.deg_sum * 1000000", "mm.m * 2")
    s"""WITH $g3Ctes,
       |deg AS (SELECT a AS id, count(*) AS deg FROM edges GROUP BY a),
       |mm AS (SELECT count(*) AS m FROM p),
       |lc AS (SELECT id, label AS community FROM lfin),
       |intra AS (
       |  SELECT la.community, count(*) AS in_edges
       |  FROM p JOIN lc la ON la.id = p.a
       |  JOIN lc lb ON lb.id = p.b AND lb.community = la.community
       |  GROUP BY 1),
       |dc AS (
       |  SELECT lc.community, count(*) AS comm_size,
       |    CAST(sum(d.deg) AS BIGINT) AS deg_sum
       |  FROM lc JOIN deg d ON d.id = lc.id GROUP BY 1)
       |SELECT CAST(dc.community AS BIGINT) AS community,
       |  CAST(dc.comm_size AS BIGINT) AS comm_size,
       |  CAST(coalesce(i.in_edges, 0) AS BIGINT) AS in_edges,
       |  dc.deg_sum,
       |  CAST(${hu("coalesce(i.in_edges, 0) * 1000000", "mm.m")}
       |     - ${hu(s"$dsh * $dsh", "1000000")} AS BIGINT) AS q_e6
       |FROM dc LEFT JOIN intra i ON i.community = dc.community, mm
       |ORDER BY community""".stripMargin
  }

  /** g4 oracle: d2's pair CTEs + the same 3 peel rounds unrolled. */
  val g4Sql: String = {
    val k = 2; val rounds = 3
    val iterCtes = (1 to rounds).flatMap { i =>
      Seq(
        s"""d$i AS (
           |  SELECT e.a AS id, count(*) AS deg
           |  FROM edges e
           |  JOIN a${i - 1} x ON x.id = e.a
           |  JOIN a${i - 1} y ON y.id = e.b
           |  GROUP BY e.a)""".stripMargin,
        s"""rm$i AS (
           |  SELECT x.id FROM a${i - 1} x LEFT JOIN d$i d ON d.id = x.id
           |  WHERE coalesce(d.deg, 0) < $k)""".stripMargin,
        s"""a$i AS (SELECT id FROM d$i WHERE deg >= $k)""")
    }
    val rmUnion = (1 to rounds)
      .map(i => s"SELECT id, $i AS peel_round, 0 AS core_deg FROM rm$i")
      .mkString("\nUNION ALL\n")
    s"""WITH ${graft.dedup.Dedup.d2Ctes},
       |p AS MATERIALIZED (SELECT doc_id1 AS a, doc_id2 AS b FROM est WHERE est_jaccard >= 0.7),
       |edges AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
       |a0 AS (SELECT DISTINCT a AS id FROM edges),
       |${iterCtes.mkString(",\n")},
       |dfin AS (
       |  SELECT e.a AS id, count(*) AS deg
       |  FROM edges e
       |  JOIN a$rounds x ON x.id = e.a
       |  JOIN a$rounds y ON y.id = e.b
       |  GROUP BY e.a),
       |core AS (
       |  SELECT a.id, 0 AS peel_round, coalesce(d.deg, 0) AS core_deg
       |  FROM a$rounds a LEFT JOIN dfin d ON d.id = a.id)
       |SELECT CAST(id AS BIGINT) AS doc_id,
       |  CAST(peel_round AS BIGINT) AS peel_round,
       |  CAST(core_deg AS BIGINT) AS core_deg
       |FROM ($rmUnion
       |UNION ALL
       |SELECT id, peel_round, core_deg FROM core)
       |ORDER BY doc_id""".stripMargin
  }

  /** g8: MARKET-BASKET LIFT — association-rule mining (Agrawal et al.
    * 1993) over the same co-purchase pairs g6 predicts links from:
    * lift(a,b) = P(a,b) / (P(a)·P(b)) = cooccur·N / (cnt_a·cnt_b),
    * the "bought together MORE than their popularities explain"
    * score. g6 asks "which non-edges look like edges" (structure);
    * g8 scores the OBSERVED edges for dependence — the
    * recommendation/affinity table itself. ×1e6 integer, half-up.
    *
    * Overflow is the real design point: cooccur·N·1e6 passes 2⁶³ once
    * baskets reach ~10⁹ (exactly the 100 TB regime), so the quotient
    * is staged through DECIMAL(38,0) — Spark's DECIMAL DIV and
    * DuckDB's HUGEINT `//` agree exactly on non-negatives (w7's
    * convention).
    *
    * Scale shape: the pair artifact is the memoized g6CoPairs frame
    * (computed once per session, basket-bounded — never n²); item
    * popularity is ONE map-side-combined rollup of the deduped
    * (basket, item) scan; N is a 1-row broadcast. Joins keyed on the
    * item ids; top-k via TakeOrderedAndProject. */
  def g8BasketLift(spark: SparkSession, dir: String, minSupport: Long = 2L,
                   topK: Int = 25): DataFrame = {
    import spark.implicits._
    val co = g6CoPairs(spark, dir, minSupport) // (a, b, cooccur)
    val li = g6BasketItems(spark, dir)
    val itemCnt = li.groupBy($"l_partkey").agg(count(lit(1)).as("n_baskets_item"))
    val nBaskets = li.select($"l_orderkey").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    co.join(itemCnt.select($"l_partkey".as("a"), $"n_baskets_item".as("cnt_a")), Seq("a"))
      .join(itemCnt.select($"l_partkey".as("b"), $"n_baskets_item".as("cnt_b")), Seq("b"))
      .crossJoin(broadcast(nBaskets))
      .select($"a".as("part_id1"), $"b".as("part_id2"),
        $"cooccur", $"cnt_a", $"cnt_b",
        expr("""CAST((2 * (CAST(cooccur AS DECIMAL(38,0)) * n_baskets * 1000000)
                |      + (CAST(cnt_a AS DECIMAL(38,0)) * cnt_b))
                |  DIV (2 * CAST(cnt_a AS DECIMAL(38,0)) * cnt_b) AS BIGINT)""".stripMargin)
          .as("lift_e6"))
      .orderBy($"lift_e6".desc, $"cooccur".desc, $"part_id1", $"part_id2")
      .limit(topK)
  }

  /** g8 oracle: the g6 basket CTEs + popularity rollup; the half-up
    * quotient rides HUGEINT, matching Spark's DECIMAL(38,0) DIV. */
  val g8Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |co AS (
      |  SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS cooccur
      |  FROM li x JOIN li y ON y.l_orderkey = x.l_orderkey AND x.l_partkey < y.l_partkey
      |  GROUP BY 1, 2),
      |p AS (SELECT a, b, cooccur FROM co WHERE cooccur >= 2),
      |ic AS (SELECT l_partkey, count(*) AS n_baskets_item FROM li GROUP BY 1),
      |nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM li)
      |SELECT p.a AS part_id1, p.b AS part_id2, p.cooccur,
      |  ca.n_baskets_item AS cnt_a, cb.n_baskets_item AS cnt_b,
      |  CAST((2 * (CAST(p.cooccur AS HUGEINT) * nb.n_baskets * 1000000)
      |        + (CAST(ca.n_baskets_item AS HUGEINT) * cb.n_baskets_item))
      |    // (2 * CAST(ca.n_baskets_item AS HUGEINT) * cb.n_baskets_item) AS BIGINT) AS lift_e6
      |FROM p JOIN ic ca ON ca.l_partkey = p.a
      |       JOIN ic cb ON cb.l_partkey = p.b, nb
      |ORDER BY lift_e6 DESC, cooccur DESC, part_id1, part_id2
      |LIMIT 25""".stripMargin

  /** g9: DEGREE DISTRIBUTION of the co-purchase graph, log₂-binned —
    * the first diagnostic anyone runs on a large graph (is the tail
    * power-law? where does the hub mass sit?), and the capacity-
    * planning input for every g-family operator here: g2's wedge
    * bound, g6's degCap and j1's salting threshold are all chosen
    * off this histogram. Per bin [2^b, 2^(b+1)): node count, min/max
    * degree, node share ×1e6 and DEGREE-MASS share ×1e6 (hubs carry
    * the mass long before they dominate the count).
    *
    * floor(log₂ d) is computed EXACTLY as length(bin(d)) − 1 — bit
    * length, no float log2() whose last-ulp wobble at exact powers
    * of two flips bins between engines.
    *
    * Scale shape: the memoized pair artifact (never n²) → one
    * map-side-combined degree rollup (node-sized) → bin rollup
    * (≤64 rows); totals ride a 1-row broadcast (m6 convention). */
  def g9DegreeDist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val halfUp = graft.functions.IntMath.halfUpDiv _
    val pairs = g6CoPairs(spark, dir).select($"a", $"b")
    val edges = pairs.unionAll(pairs.select($"b".as("a"), $"a".as("b")))
    val deg = edges.groupBy($"a".as("id")).agg(count(lit(1)).as("deg"))
    val binned = deg
      .groupBy((length(bin($"deg")) - 1).cast("long").as("bin"))
      .agg(count(lit(1)).as("n_nodes"), min($"deg").as("min_deg"),
        max($"deg").as("max_deg"), sum($"deg").as("deg_mass"))
    val tot = binned.agg(sum($"n_nodes").as("tn"), sum($"deg_mass").as("tm"))
    binned.crossJoin(broadcast(tot))
      .select($"bin", $"n_nodes", $"min_deg", $"max_deg", $"deg_mass",
        halfUp($"n_nodes" * 1000000L, $"tn").as("node_share_e6"),
        halfUp($"deg_mass" * 1000000L, $"tm").as("mass_share_e6"))
      .orderBy("bin")
  }

  /** g9 oracle: the g6 pair CTEs + the same bit-length binning. */
  val g9Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |co AS (
      |  SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS cooccur
      |  FROM li x JOIN li y ON y.l_orderkey = x.l_orderkey AND x.l_partkey < y.l_partkey
      |  GROUP BY 1, 2),
      |p AS (SELECT a, b FROM co WHERE cooccur >= 2),
      |edges AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
      |deg AS (SELECT a AS id, count(*) AS deg FROM edges GROUP BY a),
      |bn AS (
      |  SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bin, count(*) AS n_nodes,
      |    min(deg) AS min_deg, max(deg) AS max_deg, sum(deg) AS deg_mass
      |  FROM deg GROUP BY 1),
      |t AS (SELECT sum(n_nodes) AS tn, sum(deg_mass) AS tm FROM bn)
      |SELECT bn.bin, bn.n_nodes, CAST(bn.min_deg AS BIGINT) AS min_deg,
      |  CAST(bn.max_deg AS BIGINT) AS max_deg, CAST(bn.deg_mass AS BIGINT) AS deg_mass,
      |  CAST((2 * (bn.n_nodes * 1000000) + t.tn) // (2 * t.tn) AS BIGINT) AS node_share_e6,
      |  CAST((2 * (bn.deg_mass * 1000000) + t.tm) // (2 * t.tm) AS BIGINT) AS mass_share_e6
      |FROM bn, t ORDER BY bn.bin""".stripMargin

  /** g10: degree ASSORTATIVITY of the co-purchase graph (Newman,
    * PRL 2002) — the Pearson correlation of endpoint degrees over
    * edges, ×1e6. Positive = hubs attach to hubs (social-network
    * shape: dedup clusters percolate, j1-style skew compounds);
    * negative = hubs attach to leaves (star/catalog shape: salting
    * the few hubs fixes the whole join). g9 says where the degree
    * MASS sits; g10 says how it WIRES — together they decide whether
    * g6's degCap removes a fringe or the core.
    *
    * Exactness: over the symmetrized edge list both marginals are
    * identical, so r = cxy/cxx with the SAME six-sum co-moment
    * machinery as q35 (n·Σxy − ΣxΣy staged through DECIMAL(38,0) ≡
    * HUGEINT; Spark DIV quotients kept under 2⁶³; sign routed around
    * floor-vs-truncate DIV) — float corr() cannot be the oracle, its
    * last ulp depends on summation order.
    *
    * Scale shape: memoized pair artifact → node-sized degree rollup
    * → ONE self-equi-join pairs↔degrees (two broadcast-sized hash
    * joins at any scale — degrees are node-sized, edges stream) →
    * grouping-less six-sum rollup (map-side-combined to 1 row). */
  def g10Assortativity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d38 = "decimal(38,0)"
    val pairs = g6CoPairs(spark, dir).select($"a", $"b")
    val edges = pairs.unionAll(pairs.select($"b".as("a"), $"a".as("b")))
    val deg = edges.groupBy($"a".as("id")).agg(count(lit(1)).as("deg"))
    val da = deg.select($"id".as("ia"), $"deg".as("dx"))
    val db = deg.select($"id".as("ib"), $"deg".as("dy"))
    edges.join(da, $"a" === $"ia").join(db, $"b" === $"ib")
      .agg(count(lit(1)).cast(d38).as("n"),
        sum($"dx".cast(d38)).as("sx"),
        // cast BEFORE multiplying (q35's convention): a long·long
        // product of two >~3e9 hub degrees would wrap silently
        sum($"dx".cast(d38) * $"dx").as("sxx"),
        sum($"dx".cast(d38) * $"dy").as("sxy"))
      .withColumn("cxx", expr("n * sxx - sx * sx"))
      .withColumn("cxy", expr("n * sxy - sx * sx"))
      .select(expr("CAST(n AS BIGINT) DIV 2").as("n_edges"),
        expr("""CAST(CASE WHEN cxx = 0 THEN NULL
               |  WHEN cxy >= 0 THEN (2 * (cxy * 1000000) + cxx) DIV (2 * cxx)
               |  ELSE -((2 * ((-cxy) * 1000000) + cxx) DIV (2 * cxx))
               |END AS BIGINT)""".stripMargin).as("assort_e6"))
  }

  /** g10 oracle: the g6 pair CTEs + the identical co-moment chain on
    * HUGEINT (sx ≡ sy over symmetrized edges, so cxy = n·sxy − sx²). */
  val g10Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |co AS (
      |  SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS cooccur
      |  FROM li x JOIN li y ON y.l_orderkey = x.l_orderkey AND x.l_partkey < y.l_partkey
      |  GROUP BY 1, 2),
      |p AS (SELECT a, b FROM co WHERE cooccur >= 2),
      |edges AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
      |deg AS (SELECT a AS id, count(*) AS deg FROM edges GROUP BY a),
      |s AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(x.deg) AS HUGEINT) AS sx,
      |    sum(CAST(x.deg AS HUGEINT) * CAST(x.deg AS HUGEINT)) AS sxx,
      |    sum(CAST(x.deg AS HUGEINT) * CAST(y.deg AS HUGEINT)) AS sxy
      |  FROM edges e JOIN deg x ON x.id = e.a JOIN deg y ON y.id = e.b),
      |c AS (SELECT n, n * sxx - sx * sx AS cxx, n * sxy - sx * sx AS cxy FROM s)
      |SELECT CAST(n // 2 AS BIGINT) AS n_edges,
      |  CAST(CASE WHEN cxx = 0 THEN NULL
      |    WHEN cxy >= 0 THEN (2 * (cxy * 1000000) + cxx) // (2 * cxx)
      |    ELSE -((2 * ((-cxy) * 1000000) + cxx) // (2 * cxx))
      |  END AS BIGINT) AS assort_e6
      |FROM c""".stripMargin

  /** g11: PERSONALIZED PageRank / random walk with restart (Jeh &
    * Widom 2003; Tong et al. 2006) over the co-purchase graph,
    * seeded from one product cohort (the lexicographically-min
    * p_brand — self-contained and deterministic): every part ranked
    * by walk-proximity to the cohort. This is the lookalike-expansion
    * primitive — grow a labeled seed set into "similar by behavior"
    * candidates (audience expansion, semi-supervised selection of
    * training examples near a trusted core) — where g1 ranks GLOBAL
    * centrality, the restart pins the walk to the cohort.
    *
    * Same execution family as g1: per iteration two joins + one agg
    * over the EDGE SUBGRAPH only (g6's memoized co-pair artifact;
    * the part table never re-shuffles), 3 fixed iterations, all
    * arithmetic ×1e6-integer half-up — restart mass 0.15 splits over
    * the |S| seeds instead of all N nodes, spread mass damps by 0.85
    * on the inflow; non-seed isolated parts stay at exactly 0.
    * Bit-identical cross-engine (the s3/g1 convention). */
  def g11Ppr(spark: SparkSession, dir: String, iters: Int = 3,
             minSupport: Long = 2L): DataFrame = {
    import spark.implicits._
    val halfUp = graft.functions.IntMath.halfUpDiv _
    val pairs = g6CoPairs(spark, dir, minSupport).select($"a", $"b")
    // memoized exactly like g1's edge/degree artifacts (see g1PageRank)
    val edges = graft.operators.Indexes.memo(s"g11_edges:$dir:$minSupport") {
      pairs.unionAll(pairs.select($"b".as("a"), $"a".as("b"))).repartition($"a")
    }
    val deg = graft.operators.Indexes.memo(s"g11_deg:$dir:$minSupport") {
      edges.groupBy($"a").agg(count(lit(1)).as("deg"))
    }
    val parts = Tables.read(spark, dir, "part")
    val minBrand = parts.agg(min($"p_brand").as("seed_brand"))
    val nSeedsF = parts.crossJoin(broadcast(minBrand))
      .agg(sum(($"p_brand" === $"seed_brand").cast("long")).as("ns"))
    // node-sized, consumed once per iteration plus twice at the end —
    // memoized like g1's base (the scan-gate convention)
    val base = graft.operators.Indexes.memo(s"g11_base:$dir") {
      parts.crossJoin(broadcast(minBrand)).crossJoin(broadcast(nSeedsF))
        .select($"p_partkey",
          ($"p_brand" === $"seed_brand").cast("long").as("is_seed"),
          when($"p_brand" === $"seed_brand", halfUp(lit(150000L), $"ns"))
            .otherwise(0L).as("base_e6"),
          when($"p_brand" === $"seed_brand", halfUp(lit(1000000L), $"ns"))
            .otherwise(0L).as("r0"))
    }
    var r = base.select($"p_partkey", $"r0".as("r_e6"))
    for (_ <- 1 to iters) {
      val share = r.join(deg, r("p_partkey") === deg("a"))
        .select(r("p_partkey").as("u"), halfUp($"r_e6", $"deg").as("share"))
      val inSum = edges.join(share, edges("a") === share("u"))
        .groupBy(edges("b")).agg(sum($"share").as("s"))
      r = base.join(inSum, base("p_partkey") === inSum("b"), "left")
        .select(base("p_partkey"),
          ($"base_e6" + halfUp(coalesce($"s", lit(0L)) * 85L, lit(100L))).as("r_e6"))
    }
    r.join(deg.select($"a".as("p_partkey"), $"deg"), Seq("p_partkey"), "left")
      .join(base.select($"p_partkey", $"is_seed"), Seq("p_partkey"))
      .select($"p_partkey", $"is_seed",
        coalesce($"deg", lit(0L)).as("degree"), $"r_e6".as("rank_e6"))
  }

  /** g11 oracle: g6's co-pair CTEs + the same 3 restart iterations
    * unrolled (g1's generated-chain pattern); all quantities
    * non-negative so half-up is `(2n+d)//(2d)`. */
  val g11Sql: String = {
    val iters = 3
    def hu(n: String, d: String) = s"((2*($n) + ($d)) // (2*($d)))"
    val iterCtes = (1 to iters).flatMap { i =>
      Seq(
        s"""sh$i AS (
           |  SELECT r.p_partkey AS u, ${hu("r.r", "g.deg")} AS share
           |  FROM r${i - 1}t r JOIN deg g ON g.a = r.p_partkey)""".stripMargin,
        s"""in$i AS (
           |  SELECT e.b, CAST(sum(sh.share) AS BIGINT) AS s
           |  FROM edges e JOIN sh$i sh ON sh.u = e.a GROUP BY e.b)""".stripMargin,
        s"""r${i}t AS (
           |  SELECT b.p_partkey, b.base_e6 + ${hu("coalesce(i.s, 0) * 85", "100")} AS r
           |  FROM base b LEFT JOIN in$i i ON i.b = b.p_partkey)""".stripMargin)
    }
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |co AS (
       |  SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS cooccur
       |  FROM li x JOIN li y ON y.l_orderkey = x.l_orderkey AND x.l_partkey < y.l_partkey
       |  GROUP BY 1, 2),
       |p AS (SELECT a, b FROM co WHERE cooccur >= 2),
       |edges AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
       |deg AS (SELECT a, count(*) AS deg FROM edges GROUP BY a),
       |sb AS (SELECT min(p_brand) AS sbrand FROM part),
       |ns AS (SELECT count(*) AS n FROM part, sb WHERE p_brand = sbrand),
       |base AS (
       |  SELECT p_partkey,
       |    CASE WHEN p_brand = (SELECT sbrand FROM sb) THEN 1 ELSE 0 END AS is_seed,
       |    CASE WHEN p_brand = (SELECT sbrand FROM sb)
       |         THEN ${hu("150000", "(SELECT n FROM ns)")} ELSE 0 END AS base_e6,
       |    CASE WHEN p_brand = (SELECT sbrand FROM sb)
       |         THEN ${hu("1000000", "(SELECT n FROM ns)")} ELSE 0 END AS r0
       |  FROM part),
       |r0t AS (SELECT p_partkey, r0 AS r FROM base),
       |${iterCtes.mkString(",\n")}
       |SELECT b.p_partkey, CAST(b.is_seed AS BIGINT) AS is_seed,
       |  CAST(coalesce(d.deg, 0) AS BIGINT) AS degree,
       |  CAST(r.r AS BIGINT) AS rank_e6
       |FROM base b
       |JOIN r${iters}t r ON r.p_partkey = b.p_partkey
       |LEFT JOIN deg d ON d.a = b.p_partkey
       |ORDER BY b.p_partkey""".stripMargin
  }

  /** g12: CONNECTED COMPONENTS of the part co-purchase graph —
    * assortment islands (products that transitively co-sell), the
    * graph-shape summary next to g9's degree view: the component size
    * distribution tells whether the catalog co-sells as one giant
    * island (cross-sell everywhere) or fragmented clusters (isolated
    * assortments), and singleton count = parts with no qualifying
    * co-purchase at all.
    *
    * Scale shape: edges = the memoized g6/g8 co-pair index (ONE
    * lineitem scan for the whole g6/g8/g12 family); labels via
    * [[graft.operators.Graph.connectedComponents]] — pointer-jumping
    * min-label propagation, O(log diameter) rounds, per-round state
    * lineage-cut; the two rollups (label sizes, size histogram) are
    * component-count-sized. Oracle = recursive transitive closure +
    * min-label (tractable at gate scale; the operator itself never
    * materializes closures). */
  def g12Components(spark: SparkSession, dir: String, minSupport: Long = 2L,
                    maxIters: Int = 20): DataFrame = {
    import spark.implicits._
    val pairs = g6CoPairs(spark, dir, minSupport).select($"a", $"b")
    val parts = Tables.read(spark, dir, "part").select($"p_partkey".as("id"))
    graft.operators.Graph
      .connectedComponents(pairs, parts, s"g12:$dir:$minSupport", maxIters)
      .groupBy($"label").agg(count(lit(1)).as("comp_size"))
      .groupBy($"comp_size").agg(count(lit(1)).as("n_components"))
      .orderBy($"comp_size")
  }

  /** g12 oracle: same co-pair formation, recursive reach closure,
    * min-label components, size histogram. */
  val g12Sql: String =
    """WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |co AS (
      |  SELECT x.l_partkey AS a, y.l_partkey AS b FROM li x JOIN li y
      |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |edges AS (SELECT a, b FROM co UNION SELECT b, a FROM co),
      |reach AS (
      |  SELECT p_partkey AS a, p_partkey AS b FROM part
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      |cc AS (SELECT a AS id, min(b) AS label FROM reach GROUP BY a),
      |sizes AS (SELECT label, count(*) AS comp_size FROM cc GROUP BY label)
      |SELECT CAST(comp_size AS BIGINT) AS comp_size,
      |  CAST(count(*) AS BIGINT) AS n_components
      |FROM sizes GROUP BY 1 ORDER BY 1""".stripMargin
}
