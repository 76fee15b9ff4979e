package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced distributed-analytics operators: iterative graph ranking
  * (PageRank), market-basket lift mining, sequential-pattern counting,
  * deterministic per-group reservoir sampling, and bounded-window EWMA
  * smoothing. These extend the engine past the reference's web-journey
  * analytics into the graph/sequence/sampling ops a production corpus or
  * event platform runs at fleet scale.
  *
  * Scale notes (100 TB):
  *  - `pagerank` is the canonical iterative-join workload. Edges and the
  *    node list are built ONCE and cached; each of the K iterations is one
  *    keyed join (ranks ⋈ edges on src) + one partial aggregate (sum of
  *    contributions per dst) + two one-row broadcast scalars (node count,
  *    dangling mass). Nothing global, no driver round-trips inside the
  *    loop. Per-iteration ranks are rounded to 8 dp so aggregate summation
  *    ORDER can never leak into the next iteration — the same
  *    bit-reproducibility idiom as the Lloyd fit in [[LlmData]].
  *  - `item_cooccur` self-joins lineitem on the order key: fan-out is
  *    bounded by max items/order (≤ a few dozen), never corpus-quadratic.
  *    Lift arithmetic is exact-integer products with ONE final division,
  *    so the doubles are bit-identical in any IEEE engine.
  *  - `seq_mining` and `ewma_smooth` partition their windows on user_id
  *    (high-cardinality — partition-parallel at any scale).
  *  - `group_sample` replaces "ORDER BY rand() LIMIT k per group" with a
  *    deterministic md5 coin + per-key rank: Spark pushes the rank filter
  *    down as WindowGroupLimit (per-partition top-k before the shuffle),
  *    so the exchange carries O(groups·k) rows, not the table.
  */
object AnalyticsPack extends QueryPack {

  private def withUs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("us", unix_micros(col("ts")))

  // ------------------------------------------------------------ PageRank

  private val PrDamping = 0.85
  private val PrIters   = 5

  /** PageRank over the bipartite customer→part endorsement graph (an edge
    * when a customer's order contains the part). Parts have no out-edges,
    * so the dangling-mass redistribution path is exercised for real:
    * r'(v) = 0.15/N + 0.85·(Σ_{u→v} r(u)/deg(u) + dangling/N).
    *
    * The iteration body is pure plan: ranks ⋈ deg ⋈ edges → per-dst sum,
    * plus a one-row dangling-mass aggregate crossJoin-broadcast back (no
    * collect). Ranks are rounded to 8 dp at every iteration boundary —
    * float-sum ordering differences (~1e-15) are quantized away long
    * before they could compound, making the fixed-point bit-reproducible
    * across engines. */
  def pagerank(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // partition AND sort the edge list on src ONCE: InMemoryRelation
    // propagates both outputPartitioning and outputOrdering, so each
    // iteration's sort-merge join against the (much smaller) rank frame
    // reuses this layout instead of re-exchanging + re-sorting |edges|
    // rows K times — the dominant cost of iterative graph workloads
    val edges = Tables.orders(s, dir)
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c:"), col("o_custkey")).as("src"),
        concat(lit("p:"), col("l_partkey")).as("dst"))
      .distinct().repartition(col("src")).sortWithinPartitions("src")
      .cache()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("double").as("deg"))
    // the node's out-degree is STATIC — folding it into the node frame
    // (and carrying it on every rank frame) removes the deg join AND the
    // dangling anti-join from the loop body entirely: contribution weights
    // and the dangling mass become row-local projections of the previous
    // iteration's checkpointed frame. nodeMeta is partitioned + sorted on
    // node once so each iteration's update join reuses the layout.
    val nodeMeta = nodes.join(deg, Seq("node"), "left")
      .repartition(col("node")).sortWithinPartitions("node").cache()
    val nCnt = nodeMeta.agg(count(lit(1)).cast("double").as("n_nodes"))

    var ranks = nodeMeta.crossJoin(broadcast(nCnt))
      .select(col("node"), round(lit(1.0) / col("n_nodes"), 8).as("r"),
        col("deg"))
    // AQE materializes every query stage as its own job; across K
    // iterations of small fixed-shape stages that is ~10 driver
    // round-trips per iteration of pure scheduling latency. The loop's
    // stage sizes are known (O(nodes) frames, one pre-partitioned edge
    // join), so run the ITERATION BODY with AQE off and restore after —
    // the returned plan (and every other query) keeps AQE.
    val aqeWas = s.conf.get("spark.sql.adaptive.enabled", "true")
    if (graft.plans.Eager.enabled) s.conf.set("spark.sql.adaptive.enabled", "false")
    try for (_ <- 1 to PrIters) {
      val contrib = ranks.filter(col("deg").isNotNull)
        .select(col("node").as("src"), (col("r") / col("deg")).as("w"))
        .join(edges, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("w")).as("contrib"))
      val dang = ranks.filter(col("deg").isNull)
        .agg(coalesce(sum("r"), lit(0.0)).as("dm"))
      ranks = nodeMeta.crossJoin(broadcast(nCnt)).crossJoin(broadcast(dang))
        .join(contrib, Seq("node"), "left")
        .select(col("node"), round(
          lit(0.15) / col("n_nodes") + lit(0.85) *
            (coalesce(col("contrib"), lit(0.0)) + col("dm") / col("n_nodes")),
          8).as("r"), col("deg"))
      // Each iteration references the previous ranks twice (contributions
      // + dangling mass): left lazy, the plan tree grows exponentially and
      // the early iterations recompute 2^K times. Materialize the O(nodes)
      // frame per iteration (same graft.plans.lazy opt-out as the rank
      // machinery — PlanDump keeps the full tree).
      if (graft.plans.Eager.enabled) ranks = ranks.localCheckpoint(true)
    } finally s.conf.set("spark.sql.adaptive.enabled", aqeWas)
    ranks.select(col("node"), col("r").as("rank")).orderBy("node")
  }

  /** DuckDB twin: the identical iteration unrolled as chained CTEs with
    * the identical 8-dp per-iteration rounding. */
  private def pagerankSql: String = {
    val base =
      """edges AS (SELECT DISTINCT 'c:' || o_custkey AS src, 'p:' || l_partkey AS dst
        |   FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        | nodes AS (SELECT DISTINCT node FROM
        |   (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
        | nc AS (SELECT count(*)::DOUBLE AS n_nodes FROM nodes),
        | deg AS (SELECT src, count(*)::DOUBLE AS deg FROM edges GROUP BY src),
        | pr0 AS (SELECT node, round(1.0::DOUBLE / n_nodes, 8) AS r FROM nodes, nc)"""
        .stripMargin
    val steps = (1 to PrIters).map { i =>
      val p = s"pr${i - 1}"
      s""" c$i AS (SELECT e.dst AS node, sum(p.r / d.deg) AS contrib
         |   FROM $p p JOIN deg d ON p.node = d.src JOIN edges e ON p.node = e.src
         |   GROUP BY e.dst),
         | dg$i AS (SELECT coalesce(sum(p.r), 0.0::DOUBLE) AS dm FROM $p p
         |   WHERE p.node NOT IN (SELECT src FROM deg)),
         | pr$i AS (SELECT n.node, round(0.15::DOUBLE / nc.n_nodes + 0.85::DOUBLE *
         |     (coalesce(c.contrib, 0.0::DOUBLE) + dg.dm / nc.n_nodes), 8) AS r
         |   FROM nodes n CROSS JOIN nc CROSS JOIN dg$i dg
         |   LEFT JOIN c$i c ON n.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $base,
       |$steps
       |SELECT node, r AS rank FROM pr$PrIters ORDER BY node""".stripMargin
  }

  // ----------------------------------------------- market-basket mining

  // ≥2 shared orders: the data's basket overlap thins as parts scale with
  // SF (max pair support is 5 at sf0.001 but 3 at sf0.1), so a higher
  // floor would empty the result at bench scale; the top-k cut below is
  // the real selectivity control
  private val CooccurMinSupport = 2
  private val CooccurTopK       = 50

  /** Market-basket lift: part pairs that co-occur in the same order far
    * more often than chance — lift(a,b) = P(a,b)/(P(a)·P(b)) over orders.
    * The pair generation is a self-join of the (order, part) incidence
    * list on the order key: fan-out per order is bounded by items/order,
    * so the intermediate is O(rows · basket), never quadratic in parts or
    * orders. Lift = (n_ab·N)/(n_a·n_b) — exact 64-bit integer products,
    * one final double division: bit-identical across engines, so the
    * top-k cut is deterministic. */
  def itemCooccur(s: SparkSession, dir: String): DataFrame = {
    val inc = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().cache()
    val nOrders = Tables.orders(s, dir)
      .agg(count(lit(1)).as("n_orders"))
    val itemN = inc.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    val pairs = inc.select(col("ok"), col("pk").as("pa"))
      .join(inc.select(col("ok"), col("pk").as("pb")), "ok")
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= CooccurMinSupport)
    pairs
      .join(itemN.select(col("pk").as("pa"), col("n_item").as("n_a")), "pa")
      .join(itemN.select(col("pk").as("pb"), col("n_item").as("n_b")), "pb")
      .crossJoin(broadcast(nOrders))
      .withColumn("lift",
        (col("n_ab") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"))
      .select(col("pa"), col("pb"), col("n_ab"), round(col("lift"), 6).as("lift"))
      .orderBy(desc("lift"), asc("pa"), asc("pb"))
      .limit(CooccurTopK)
  }

  // ------------------------------------------------- triangle counting

  /** Triangle census of the co-purchase graph (parts sharing ≥ 2 orders),
    * with the DEGREE-ORDERED enumeration (Ortmann & Brandes / the classic
    * compact-forward algorithm): every edge is oriented from its
    * lower-(degree, id) endpoint, wedges are enumerated only from each
    * vertex's out-neighbors, and each triangle is found exactly once at
    * its lowest-degree corner. That bounds the wedge join at
    * O(Σ_v outdeg(v)²) ≤ O(E^1.5) — the shape that survives power-law
    * graphs where a naive wedge count explodes at the hubs. All joins are
    * keyed; counts are exact integers. */
  def triangleCount(s: SparkSession, dir: String): DataFrame = {
    val inc = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = inc.select(col("ok"), col("pk").as("a"))
      .join(inc.select(col("ok"), col("pk").as("b")), "ok")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .filter(col("n") >= CooccurMinSupport)
      .select("a", "b").cache()
    val deg = e.select(col("a").as("node")).union(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val o = e
      .join(deg.select(col("node").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("d").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("b")).otherwise(col("a")).as("v"))
      .cache()
    val w = o.select(col("u"), col("v").as("x"))
      .join(o.select(col("u"), col("v").as("y")), "u")
      .filter(col("x") < col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
    val nTri = w.join(e, Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nE = e.agg(count(lit(1)).as("n_edges"))
    val nW = w.agg(count(lit(1)).as("n_wedges"))
    nE.crossJoin(broadcast(nW)).crossJoin(broadcast(nTri))
  }

  // ------------------------------------------------- sequential patterns

  /** Frequent 3-event sequences (consecutive event-type trigrams within a
    * user's timeline) — sequence mining's workhorse query. One keyed
    * window (two leads) + one partial aggregate; integer counts only. */
  def seqMining(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    withUs(s, dir)
      .withColumn("b", lead(col("event_type"), 1).over(w))
      .withColumn("c", lead(col("event_type"), 2).over(w))
      .filter(col("c").isNotNull)
      .groupBy(col("event_type").as("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("a"), asc("b"), asc("c"))
      .limit(20)
  }

  // ---------------------------------------------- per-group reservoir

  private val SamplePerGroup = 3

  /** Deterministic k-per-group reservoir: rank rows inside each group by
    * an md5 coin on the row key and keep the first k. Identical sample in
    * any engine (and on any re-run over the same data) — the property
    * `TABLESAMPLE`/`rand()` cannot give. The rank filter is pushed down
    * as WindowGroupLimit: each task keeps only k rows per group before
    * the exchange. */
  def groupSample(s: SparkSession, dir: String): DataFrame =
    groupSampleOf(Tables.events(s, dir))

  /** Same over any frame with (event_type, event_id, value) — the form
    * the streaming-equality spec replays (twin: StreamOps.reservoirSample). */
  def groupSampleOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(md5(col("event_id").cast("string")), col("event_id"))
    events
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= SamplePerGroup)
      .select(col("event_type"), col("rnk"), col("event_id"),
        round(col("value"), 4).as("value"))
      .orderBy("event_type", "rnk")
  }

  // -------------------------------------------------- EWMA smoothing

  private val EwmaWindow = 9 // rows of history (10 total incl. current)

  /** Per-user exponentially-weighted moving average of `value` over the
    * last 10 events, α = 1/2: ewma_t = Σ_{d=0..9} 2^{-d}·x_{t-d} / Σ 2^{-d}.
    * Powers of two are EXACT doubles, so the only cross-engine freedom is
    * 10-term summation order (~1e-16) — quantized away by the 6-dp round.
    * Expressed as an equi-keyed self-join on (user, row-offset ≤ 9): one
    * sort-merge join partitioned on user_id with fan-out ≤ 10, the shape
    * that survives any scale (a varying-weight frame is not expressible
    * as a built-in window aggregate without buffering).
    *
    * The band join is BLOCKED, not bare: a bare equi-join on user_id with
    * the row-offset range as a post-filter generates n² pairs for an
    * n-event user before filtering — a heavy key dies at scale. Blocking
    * on bucket = rn div (W+1) (each current row probes its own and the
    * previous bucket) turns it into an equi-join on (user_id, bucket)
    * with fan-out ≤ 2·(W+1) per row REGARDLESS of the user's size. */
  def ewmaSmooth(s: SparkSession, dir: String): DataFrame =
    ewmaSmoothOf(withUs(s, dir))

  /** Same over any frame with (user_id, event_id, value, us) — the form
    * the streaming-equality spec replays (twin: StreamOps.ewmaSmooth). */
  def ewmaSmoothOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val bkt = EwmaWindow + 1
    val seq = events
      .withColumn("rn", row_number().over(w))
      .select(col("user_id"), col("rn"), col("event_id"), col("value"))
      .cache()
    val cur = seq.select(col("user_id"), col("rn"), col("event_id"))
      .withColumn("bucket", explode(array(
        (col("rn") / bkt).cast("int") - 1, (col("rn") / bkt).cast("int"))))
    val past = seq.select(col("user_id"), col("rn").as("prn"),
        col("value").as("pv"))
      .withColumn("bucket", (col("prn") / bkt).cast("int"))
    cur.join(past, Seq("user_id", "bucket"))
      .filter(col("prn") >= col("rn") - EwmaWindow && col("prn") <= col("rn"))
      .withColumn("wt", pow(lit(0.5), col("rn") - col("prn")))
      .groupBy("user_id", "rn", "event_id")
      .agg(round(sum(col("wt") * col("pv")) / sum(col("wt")), 6).as("ewma"))
      .orderBy("user_id", "rn")
  }

  // ---------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pagerank" -> pagerank,
    "triangle_count" -> triangleCount,
    "item_cooccur" -> itemCooccur,
    "seq_mining" -> seqMining,
    "group_sample" -> groupSample,
    "ewma_smooth" -> ewmaSmooth)

  private val eventsUs =
    """e AS (SELECT user_id, event_id, event_type, value,
      |   epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)""".stripMargin

  def oracle: Map[String, String] = Map(
    "pagerank" -> pagerankSql,
    "triangle_count" ->
      s"""WITH inc AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         | e AS (SELECT a.pk AS a, b.pk AS b FROM inc a
         |   JOIN inc b ON a.ok = b.ok AND a.pk < b.pk
         |   GROUP BY 1, 2 HAVING count(*) >= $CooccurMinSupport),
         | deg AS (SELECT n AS node, count(*) AS d FROM
         |   (SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY n),
         | o AS (SELECT
         |   CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b END AS u,
         |   CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END AS v
         |  FROM e JOIN deg da ON e.a = da.node JOIN deg db ON e.b = db.node),
         | w AS (SELECT least(o1.v, o2.v) AS a, greatest(o1.v, o2.v) AS b
         |  FROM o o1 JOIN o o2 ON o1.u = o2.u AND o1.v < o2.v)
         |SELECT (SELECT count(*)::BIGINT FROM e) AS n_edges,
         |  (SELECT count(*)::BIGINT FROM w) AS n_wedges,
         |  (SELECT count(*)::BIGINT FROM w JOIN e USING (a, b)) AS n_triangles"""
        .stripMargin,
    "item_cooccur" ->
      s"""WITH inc AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         | n AS (SELECT count(*)::BIGINT AS n_orders FROM orders),
         | itemn AS (SELECT pk, count(*)::BIGINT AS n_item FROM inc GROUP BY pk),
         | pairs AS (SELECT a.pk AS pa, b.pk AS pb, count(*)::BIGINT AS n_ab
         |   FROM inc a JOIN inc b ON a.ok = b.ok AND a.pk < b.pk
         |   GROUP BY 1, 2 HAVING count(*) >= $CooccurMinSupport)
         |SELECT pa, pb, n_ab,
         |  round((n_ab * n_orders)::DOUBLE / (ia.n_item * ib.n_item)::DOUBLE, 6) AS lift
         |FROM pairs, n
         |  JOIN itemn ia ON pa = ia.pk JOIN itemn ib ON pb = ib.pk
         |ORDER BY lift DESC, pa, pb LIMIT $CooccurTopK""".stripMargin,
    "seq_mining" ->
      s"""WITH $eventsUs,
         | tri AS (SELECT event_type AS a,
         |   lead(event_type, 1) OVER w AS b, lead(event_type, 2) OVER w AS c
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
         |SELECT a, b, c, count(*)::BIGINT AS n FROM tri WHERE c IS NOT NULL
         |GROUP BY a, b, c ORDER BY n DESC, a, b, c LIMIT 20""".stripMargin,
    "group_sample" ->
      s"""WITH r AS (SELECT event_type, event_id, value,
         |   row_number() OVER (PARTITION BY event_type
         |     ORDER BY md5(event_id::VARCHAR), event_id) AS rnk
         |  FROM events)
         |SELECT event_type, rnk, event_id, round(value, 4) AS value
         |FROM r WHERE rnk <= $SamplePerGroup ORDER BY event_type, rnk""".stripMargin,
    "ewma_smooth" ->
      s"""WITH $eventsUs,
         | seq AS (SELECT user_id, event_id, value,
         |   row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
         |  FROM e)
         |SELECT c.user_id, c.rn, c.event_id,
         |  round(sum(power(0.5::DOUBLE, c.rn - p.rn) * p.value) /
         |        sum(power(0.5::DOUBLE, c.rn - p.rn)), 6) AS ewma
         |FROM seq c JOIN seq p ON c.user_id = p.user_id
         |  AND p.rn >= c.rn - $EwmaWindow AND p.rn <= c.rn
         |GROUP BY c.user_id, c.rn, c.event_id
         |ORDER BY c.user_id, c.rn""".stripMargin)
}
