package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale training-data pipeline operators over the `documents` and
  * `embeddings` tables: deduplication (exact, MinHash-LSH, SimHash, n-gram
  * Jaccard), similarity search (brute-force cosine top-k baseline),
  * text analysis (language-ID heuristic, quality scoring, token counting,
  * fingerprinting).
  *
  * Scale notes (100 TB):
  *  - All dedup ops are expressed as shuffle-on-key joins/aggregations —
  *    never all-pairs. MinHash-LSH pairs candidates through band-signature
  *    buckets (shuffle keyed on the 128-bit band hash → uniform
  *    distribution, no skew); the exact-Jaccard verify join only touches
  *    candidate pairs.
  *  - The n-gram inverted-index join (`neardup_pairs`) is quadratic in
  *    per-shingle document frequency; at 100 TB it needs a DF cap on hot
  *    shingles or the MinHash path. It is kept as the exactness baseline.
  *  - Everything is hash-based on md5 (same function exists in the DuckDB
  *    oracle), so correctness is verifiable bit-for-bit across engines.
  *  - Text expressions are Spark-SQL builtins; the vector kernels are
  *    native Catalyst expressions with codegen (graft.functions) — both
  *    run inside whole-stage codegen, no Scala UDFs anywhere.
  */
object LlmData extends QueryPack {

  /** Distinct word-trigram shingles per doc, over any (id, text) frame —
    * the id column is normalized to `doc_id` for the downstream joins. */
  def shinglesOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .selectExpr(s"$idCol AS doc_id", s"split($textCol, ' ') AS toks")
      .selectExpr("doc_id",
        """explode(array_distinct(CASE WHEN size(toks) >= 3
          |  THEN transform(sequence(0, size(toks) - 3),
          |                 i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
          |  ELSE array(concat_ws(' ', toks)) END)) AS s""".stripMargin)

  private def shingles(s: SparkSession, dir: String): DataFrame =
    shinglesOf(Tables.documents(s, dir), "doc_id", "text")

  /** DuckDB fragment matching [[shingles]] (1-based list indexing). */
  private val shinglesSql =
    """sh AS (SELECT DISTINCT doc_id, s FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
      |    THEN list_transform(generate_series(1, len(toks) - 2),
      |                        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
      |    ELSE [concat_ws(' ', toks)] END) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)))""".stripMargin

  // ------------------------------------------------- coarse quantization

  /** k-means cluster count for the CLUSTERING queries (embed_kmeans,
    * kmeans_balance, semdedup): a model hyperparameter the user picks for
    * their domain, deliberately NOT corpus-derived — re-running the same
    * clustering on a grown corpus must not silently change k. */
  private val KmeansK = 8

  /** Bounds for the ANN coarse codebook. The cap keeps the broadcast
    * O(MaxCoarseK·dim) — ≤ 65536 × 64 doubles ≈ 34 MB, a safe broadcast
    * on any executor; the floor keeps every cell populated at tiny SFs. */
  private[queries] val MinCoarseK = 8
  private[queries] val MaxCoarseK = 65536

  /** Corpus-adaptive IVF cell count: k = clamp(⌈√N⌉, 8, 65536) — the
    * classic IVF sizing rule. Unlike the k-means hyperparameter above,
    * the INDEX cell count must grow with the corpus: a constant k means
    * every query scans a constant nprobe/k FRACTION of the corpus (at
    * 100 TB, terabytes per query — barely better than brute force), while
    * k≈√N keeps both the codebook broadcast and the per-query probe work
    * O(√N). Pure integer/IEEE-sqrt arithmetic — DuckDB's
    * `ceil(sqrt(count(*)))` computes the identical value. */
  private[queries] def adaptiveCoarseK(n: Long): Int =
    math.min(MaxCoarseK.toLong,
      math.max(MinCoarseK.toLong, math.ceil(math.sqrt(n.toDouble)).toLong)).toInt

  /** Probe width grows as √k (so the probed corpus FRACTION nprobe/k
    * shrinks as the corpus grows: 3/8 at k=8, 256/65536 ≈ 0.4% at the
    * cap) — the standard recall/selectivity trade for IVF. */
  private[queries] def adaptiveNprobe(k: Int): Int =
    math.max(3, math.ceil(math.sqrt(k.toDouble)).toInt)

  /** Deterministic pseudo-random seed order: Knuth's multiplicative hash
    * ((id mod 1000003) · 2654435761) mod 1000003, tie-broken by id — pure
    * integer arithmetic, bit-identical in any engine. The id is reduced
    * mod 1000003 BEFORE the multiply so the product stays ≤ ~2.7e15, far
    * under 2^63: without the reduction Spark silently wraps at
    * id ≳ 3.5e9 while DuckDB raises on BIGINT overflow — billion-row
    * corpora would diverge between engines. */
  private def seedOrder(id: org.apache.spark.sql.Column) =
    Seq(pmod(pmod(id, lit(1000003L)) * lit(2654435761L), lit(1000003L)), id)

  /** The k seed rows of `e` (any frame carrying `vec_id`).
    * Plans as TakeOrderedAndProject — per-partition top-k merged on the
    * driver, so the seed set is O(k) at ANY corpus size. This replaces the
    * former corpus-fraction seeding (`vec_id % 97`) whose cell count — and
    * therefore the broadcast size and the per-row argmin work — grew O(N). */
  private[queries] def coarseSeeds(e: DataFrame, k: Int): DataFrame =
    e.orderBy(seedOrder(col("vec_id")): _*).limit(k)

  /** DuckDB twin of [[coarseSeeds]]: `ORDER BY $seedOrderSql LIMIT k`. */
  private val seedOrderSql = "((vec_id % 1000003) * 2654435761) % 1000003, vec_id"

  /** DuckDB twin of [[adaptiveCoarseK]]/[[adaptiveNprobe]], as a CTE the
    * ANN oracles prepend: `LIMIT (SELECT k FROM kk)` replays the exact k
    * the Spark side computed from its own `count()` of the same table. */
  private val adaptiveKCte =
    """kk AS (SELECT
      |   greatest(8, least(65536, CAST(ceil(sqrt(count(*))) AS BIGINT))) AS k,
      |   greatest(3, CAST(ceil(sqrt(
      |     greatest(8, least(65536, ceil(sqrt(count(*))))))) AS BIGINT)) AS np
      |  FROM embeddings)""".stripMargin

  // ---------------------------------------------------------------- dedup

  /** Exact dedup: hash-groupBy on normalized text, keep lowest doc_id.
    * One shuffle on the 128-bit hash — uniform keys, no skew at any scale. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(lower(trim(col("text")))).as("text_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies", "text_hash")
      .orderBy("keep_id")

  /** Soft-dedup training weights (the SlimPajama/RefinedWeb alternative
    * to hard removal): every doc keeps a weight of 1/n_copies of its
    * exact-dedup cluster, so duplicated content contributes ONE copy's
    * worth of gradient mass regardless of how many times it recurs. The
    * report is the per-source raw vs effective character mass — the
    * number that says how much of a source's apparent volume is
    * duplication. Scale shape: one groupBy on the uniform md5 hash (the
    * dedup shuffle that runs anyway) + one keyed join back + one partial
    * aggregate; nothing beyond the exact-dedup cost. */
  def softDedupWeights(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        md5(lower(trim(col("text")))).as("h"))
    val grp = d.groupBy("h").agg(count(lit(1)).as("n_copies"))
    d.join(grp, "h")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("raw_chars"),
        round(sum(col("n_chars") / col("n_copies")), 4).as("eff_chars"))
      .withColumn("eff_ratio", round(col("eff_chars") / col("raw_chars"), 6))
      .orderBy("source")
  }

  /** Exact n-gram (trigram-shingle) Jaccard near-dup pairs via inverted-
    * index join — the exactness baseline for MinHash. */
  def neardupPairs(s: SparkSession, dir: String): DataFrame =
    neardupPairsImpl(s, dir, maxDf = None, prefixFilter = true)

  /** The inverted-index join with the 100 TB hot-shingle mitigation made
    * real: shingles whose document frequency exceeds `maxDf` are dropped
    * from the index before the self-join, bounding the per-shingle join
    * fan-out at df² ≤ maxDf² (a boilerplate-shingle appearing in 1M docs
    * would otherwise emit 10¹² pairs). Jaccard is computed over the capped
    * shingle universe — the oracle applies the identical cap, so the capped
    * semantics are exact, not approximate. */
  def neardupCapped(s: SparkSession, dir: String): DataFrame =
    // the cap already bounds per-shingle fan-out at maxDf² — prefix
    // filtering on top is redundant stages, so it stays off here
    neardupPairsImpl(s, dir, maxDf = Some(50), prefixFilter = false)

  /** Exact Jaccard-join with PREFIX FILTERING (AllPairs/PPJoin family,
    * Bayardo et al. WWW'07 / Xiao et al. ICDE'08): under any global
    * shingle order, two docs with Jaccard ≥ t MUST share a shingle inside
    * each one's first `n − ⌈t·n⌉ + 1` shingles — so the inverted index is
    * built from prefixes only (rarest-first order makes them the least
    * frequent shingles), and the full intersection is computed
    * PAIR-DRIVEN on the candidates, exactly like the MinHash verify. The
    * result is provably identical to the naive inverted-index self-join;
    * the per-shingle join fan-out drops from df² over the whole corpus to
    * df² over prefixes of the rarest shingles. With `prefixFilter` off the
    * index join runs over all shingles directly — right when a DF cap
    * already bounds the fan-out. */
  private def neardupPairsImpl(s: SparkSession, dir: String,
                               maxDf: Option[Int],
                               prefixFilter: Boolean): DataFrame = {
    val t = 0.8
    val shAll = shingles(s, dir)
    val sh = (maxDf match {
      case Some(k) =>
        // shingles are distinct per doc, so count(*) per shingle IS the df
        val rare = shAll.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") <= k).select("s")
        shAll.join(rare, Seq("s"), "left_semi")
      case None => shAll
    }).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter =
      if (!prefixFilter)
        // one self-join computes the intersections directly — fan-out is
        // already bounded (maxDf²), a candidate pre-pass would double it
        sh.select(col("doc_id").as("da"), col("s"))
          .join(sh.select(col("doc_id").as("db"), col("s")), "s")
          .filter(col("da") < col("db"))
          .groupBy("da", "db").agg(count(lit(1)).as("ni"))
      else {
        // global rarest-first order (df asc, shingle asc): prefixes then
        // hold the most selective shingles, shrinking the join's fan-out
        val df = sh.groupBy("s").agg(count(lit(1)).as("df"))
        val prefix = sh.join(df, "s")
          .withColumn("rnk", row_number().over(
            Window.partitionBy("doc_id").orderBy(col("df"), col("s"))))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
          .filter(col("rnk") <= col("n") - ceil(lit(t) * col("n")) + 1)
          .select("doc_id", "s")
        val cand = prefix.select(col("doc_id").as("da"), col("s"))
          .join(prefix.select(col("doc_id").as("db"), col("s")), "s")
          .filter(col("da") < col("db"))
          .select("da", "db").distinct()
        // pair-driven intersection: cost Σ_cand |shingles(da)|, never df²
        cand
          .join(sh.select(col("doc_id").as("da"), col("s")), "da")
          .join(sh.select(col("doc_id").as("db"), col("s")), Seq("db", "s"))
          .groupBy("da", "db").agg(count(lit(1)).as("ni"))
      }
    inter
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .withColumn("jac", round(col("ni") / (col("na") + col("nb") - col("ni")), 6))
      .filter(col("jac") >= t)
      .select("da", "db", "jac")
      .orderBy("da", "db")
  }

  /** ASYMMETRIC near-dup: shingle CONTAINMENT c(A→B) = |S(A)∩S(B)| / |S(A)|
    * — catches a short doc quoted/embedded inside a long one, which
    * symmetric Jaccard misses (the union term drowns the short side).
    * Directed, so both (A,B) and (B,A) are scored in ONE self-join pass
    * (`da =!= db` instead of `<`). Same 100 TB shape as [[neardupCapped]]:
    * the inverted-index self-join runs over the DF-capped shingle universe
    * (fan-out ≤ maxDf² per shingle), and the cap is part of the operator's
    * exact semantics — the oracle applies the identical cap. */
  def containmentPairs(s: SparkSession, dir: String,
                       maxDf: Int = 50, minC: Double = 0.5): DataFrame = {
    val shAll = shingles(s, dir)
    val rare = shAll.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("s")
    val sh = shAll.join(rare, Seq("s"), "left_semi").cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // intersection counted ONCE per unordered pair (da < db halves the
    // heavy aggregate); both directions are then emitted from the tiny
    // |pairs| frame by exploding the two (src, dst, src-size) orientations
    val inter = sh.select(col("doc_id").as("da"), col("s"))
      .join(sh.select(col("doc_id").as("db"), col("s")), "s")
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("ni"))
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
    inter
      .select(explode(array(
        struct(col("da").as("da"), col("db").as("db"), col("ni"),
          col("na").as("n_src")),
        struct(col("db").as("da"), col("da").as("db"), col("ni"),
          col("nb").as("n_src")))).as("p"))
      .select(col("p.da").as("da"), col("p.db").as("db"), col("p.ni").as("ni"),
        round(col("p.ni") / col("p.n_src"), 6).as("cont"))
      .filter(col("cont") >= minC)
      .orderBy("da", "db")
  }

  /** MinHash signatures (12 universal hashes over one md5 per shingle),
    * banded 4×3 LSH: candidate pairs meet in a band-signature bucket
    * (shuffle on the band hash — never all-pairs), then exact-Jaccard
    * verified ≥ 0.7.
    *
    * Plan shape (matters at scale): each shingle is md5'd ONCE; the 12
    * hash family members are integer mixes (aₖ·h + bₖ) mod p — codegen'd
    * arithmetic, not 12 digests — aggregated as 12 `min` columns of ONE
    * hash aggregate (no 12× row explode, no (doc, seed) shuffle). Band
    * signatures are row-local concat+md5 of those columns. The
    * exact-Jaccard verify is PAIR-DRIVEN: candidate pairs broadcast onto
    * the (semi-joined) shingle stream, so the cost is Σ_pairs |shingles|
    * — bounded by the LSH output, never quadratic in a hot shingle's
    * document frequency the way an inverted-index self-join is. */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    minhashPairs(s, dir).orderBy("da", "db")

  /** Verified near-dup pairs (unordered) — shared by [[dedupMinhash]] and
    * [[dedupClusters]]. */
  private def minhashPairs(s: SparkSession, dir: String): DataFrame =
    minhashPairsOf(Tables.documents(s, dir), "doc_id", "text")

  /** The full MinHash-LSH + exact-verify pipeline over ANY (id, text)
    * frame — what [[graft.CorpusRunner]]'s `dedup_minhash` step runs.
    * Output columns are `da`/`db` (the id pair, `da < db`) + `jac`. */
  def minhashPairsOf(docs: DataFrame, idCol: String, textCol: String,
                     threshold: Double = 0.7): DataFrame = {
    val sh = shinglesOf(docs, idCol, textCol).cache()
    minhashPairsFrom(sh, minhashSigsFrom(sh), threshold)
  }

  /** 12-permutation MinHash signature per doc over a shingle stream —
    * one digest per shingle → 60-bit int → 12 universal-hash mins.
    * Shared by the pair pipeline and the estimator calibration so a
    * caller holding both never hashes the shingle stream twice. */
  private[queries] def minhashSigsFrom(sh: DataFrame): DataFrame = {
    val seeds = 0 until 12
    val p = 2147483647L // 2^31 − 1
    val withH = sh.withColumn("h1",
      expr("cast(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)") % p)
    def mix(k: Int) = (lit(2L * k + 1) * col("h1") + lit((k * 2654435761L) % p)) % p
    withH.groupBy("doc_id").agg(
      min(mix(seeds.head)).as(s"mh${seeds.head}"),
      seeds.tail.map(k => min(mix(k)).as(s"mh$k")): _*)
  }

  /** LSH banding + pair-driven exact verify over precomputed shingles and
    * signatures (see [[minhashPairsOf]] for the fused entry point). */
  /** 4-band LSH index rows (doc_id, band, sig) from the 12-slot signature
    * frame: band b hashes seeds {b, b+4, b+8}; the signature string matches
    * the oracle's string_agg(seed||':'||mh, '|' ORDER BY seed). */
  private[queries] def minhashBandsFrom(mh: DataFrame): DataFrame = {
    val seeds = 0 until 12
    def sig(b: Int) = md5(concat_ws("|",
      seeds.filter(_ % 4 == b).map(k => concat(lit(s"$k:"), col(s"mh$k"))): _*))
    mh.select(col("doc_id"), explode(array(
        (0 until 4).map(b => struct(lit(b).as("band"), sig(b).as("sig"))): _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** ROW-LOCAL MinHash banding: the identical signatures/band hashes as
    * [[minhashSigsFrom]]+[[minhashBandsFrom]] computed as pure expressions
    * over a per-doc shingle ARRAY — `array_min(transform(...))` replaces
    * the explode→groupBy-min aggregation, so there is NO shuffle and NO
    * aggregation state. That makes it legal in a Structured-Streaming
    * stateless projection (the streaming near-dup probe,
    * [[graft.streaming.StreamOps.nearDupProbe]]) and proves the banding is
    * embarrassingly parallel; the batch pipeline keeps the aggregated form
    * because its verify step wants the exploded shingle stream anyway.
    * Output: 4 rows per doc — (doc_id, shingles, band, sig); equality with
    * the aggregated path is pinned by spec. `carryCols` (e.g. an event-time
    * column the streaming probe watermarks on) pass through untouched. */
  def rowLocalBands(docs: DataFrame, idCol: String, textCol: String,
                    carryCols: Seq[String] = Nil): DataFrame = {
    val seeds = 0 until 12
    val p = 2147483647L
    val withSh = docs
      .withColumn("__toks", split(col(textCol), " "))
      .withColumn("__sh", expr(
        """array_distinct(CASE WHEN size(__toks) >= 3
          |  THEN transform(sequence(0, size(__toks) - 3),
          |    i -> concat_ws(' ', __toks[i], __toks[i+1], __toks[i+2]))
          |  ELSE array(concat_ws(' ', __toks)) END)""".stripMargin))
    val withMh = seeds.foldLeft(withSh)((d, k) =>
      d.withColumn(s"mh$k", expr(
        s"""array_min(transform(__sh, s ->
           |  (${2 * k + 1}L * (cast(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)
           |     % ${p}L) + ${(k * 2654435761L) % p}L) % ${p}L))""".stripMargin)))
    def sig(b: Int) = md5(concat_ws("|",
      seeds.filter(_ % 4 == b).map(k => concat(lit(s"$k:"), col(s"mh$k"))): _*))
    val carried = carryCols.map(col)
    withMh.select(col(idCol).as("doc_id") +: col("__sh").as("shingles") +:
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), sig(b).as("sig"))): _*)).as("bs") +:
        carried: _*)
      .select(col("doc_id") +: col("shingles") +:
        col("bs.band").as("band") +: col("bs.sig").as("sig") +: carried: _*)
  }

  private[queries] def minhashPairsFrom(sh: DataFrame, mh: DataFrame,
                                        threshold: Double): DataFrame = {
    val bands = minhashBandsFrom(mh)
    val cand = bands.select(col("band"), col("sig"), col("doc_id").as("da"))
      .join(bands.select(col("band"), col("sig"), col("doc_id").as("db")), Seq("band", "sig"))
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
      .cache() // used twice: candidate-doc semi-join + pair-driven verify
    // restrict the shingle stream to candidate docs, then intersect per PAIR:
    // cand ⋈ shingles(da) gives each pair its left shingle set; matching on
    // (db, s) counts the intersection — work scales with pairs, not df².
    // no broadcast hint: the candidate-doc set scales with the dup rate —
    // at 100 TB it can exceed any broadcast budget; below the 64MB
    // threshold AQE still picks a broadcast semi-join on its own
    val candDocs = cand.select(explode(array(col("da"), col("db"))).as("doc_id")).distinct()
    val shC = sh.join(candDocs, Seq("doc_id"), "left_semi").cache()
    val sizes = shC.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // no broadcast hint on cand: small under the 64MB auto-threshold at
    // test scale; at 100 TB the pair set can be large — AQE decides.
    val inter = cand
      .join(shC.select(col("doc_id").as("da"), col("s")), "da")
      .join(shC.select(col("doc_id").as("db"), col("s")), Seq("db", "s"))
      .groupBy("da", "db").agg(count(lit(1)).as("ni"))
    inter
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .withColumn("jac", round(col("ni") / (col("na") + col("nb") - col("ni")), 6))
      .filter(col("jac") >= threshold)
      .select("da", "db", "jac")
  }

  /** Near-dup CLUSTERS: connected components over the verified MinHash
    * pair graph, labeling every member with the minimum doc_id reachable
    * from it — the "keep one representative per duplicate cluster" step of
    * a dedup pipeline.
    *
    * Scale design: the pair graph after LSH + verify is orders of magnitude
    * smaller than the corpus, so — exactly like a broadcast-join
    * threshold — components are solved driver-side by union-find while the
    * edge list fits (`maxDriverEdges`), and by the distributed min-label
    * propagation loop with POINTER JUMPING (lbl ← lbl(lbl) each round →
    * O(log n) rounds instead of O(diameter)) when it does not. Both paths
    * produce identical labels (min doc_id per component); the spec forces
    * the distributed path and asserts equality. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    dedupClusters(s, dir, 1L << 20)

  def dedupClusters(s: SparkSession, dir: String, maxDriverEdges: Long): DataFrame = {
    val pairs = minhashPairs(s, dir).select("da", "db").cache()
    val labels = componentLabels(s, pairs, maxDriverEdges)
    labels
      .groupBy(col("lbl").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"), max("doc_id").as("max_doc"))
      .orderBy("cluster_id")
  }

  /** Canonical-document selection — "keep the BEST doc per duplicate
    * cluster", the refinement every production dedup ships instead of
    * keep-min-id: within each near-dup cluster the longest document wins
    * (ties → smallest id), the others are dropped. Clusters come from the
    * same LSH + verify + component machinery as [[dedupClusters]]; the
    * winner is one row_number window PARTITIONED ON cluster_id (high
    * cardinality — partition-parallel at any corpus size, never a global
    * sort). Output per cluster: the kept doc, its length, and how many
    * copies it displaced. */
  def dedupCanonical(s: SparkSession, dir: String): DataFrame = {
    val pairs = minhashPairs(s, dir).select("da", "db").cache()
    val labels = componentLabels(s, pairs)
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lbl").orderBy(col("n_chars").desc, col("doc_id").asc)
    labels.join(docs, "doc_id")
      .withColumn("rn", row_number().over(w))
      .groupBy(col("lbl").as("cluster_id"))
      .agg(max(when(col("rn") === 1, col("doc_id"))).as("keep_doc"),
        max(when(col("rn") === 1, col("n_chars"))).as("keep_chars"),
        (count(lit(1)) - 1).as("n_dropped"))
      .orderBy("cluster_id")
  }

  /** Normalization-aware exact dedup — the Dolma/CCNet "fuzzy-exact"
    * step: lowercase, strip non-alphanumerics, collapse whitespace, THEN
    * hash-group. Catches the re-encoded/re-punctuated copies raw exact
    * dedup misses while keeping its one-uniform-shuffle cost (the group
    * key is the md5 of the normal form, never the text itself). The
    * corpus is staged with a deterministic perturbed copy of every doc
    * (upper-cased, double-spaced, trailing punctuation — replayed
    * verbatim by the oracle) so the collapse is observable: every group
    * must land exactly two copies. */
  def dedupNormalized(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    // id offset derived from the data so staged copies can never collide
    // with real ids at ANY scale factor
    val off = docs.agg((max("doc_id") + 1).as("__off"))
    val perturbed = docs.crossJoin(broadcast(off)).select(
      (col("doc_id") + col("__off")).as("doc_id"),
      concat(regexp_replace(upper(col("text")), lit(" "), lit("  ")),
        lit(" !!")).as("text"))
    dedupNormalizedOf(docs.union(perturbed), "doc_id", "text")
  }

  /** The normalize-then-group dedup over ANY (id, text) frame. The
    * character class is UNICODE-aware (`\p{L}\p{N}`, identical semantics
    * in Java regex and DuckDB's RE2): an ASCII-only `[^a-z0-9 ]` would
    * erase every non-Latin script before hashing, falsely merging all
    * CJK/Cyrillic/Arabic documents into one "duplicate" group — exactly
    * the multilingual corpora this step exists for (see
    * LlmQualitySpec's CJK fixtures). */
  def dedupNormalizedOf(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    docs
      .withColumn("norm_md5", md5(trim(regexp_replace(
        regexp_replace(lower(col(textCol)), "[^\\p{L}\\p{N} ]", ""),
        " +", " "))))
      .groupBy("norm_md5")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select("keep_id", "n_copies", "norm_md5")
      .orderBy("keep_id")

  /** Edit-distance near-dup pairs via MULTI-PASS BLOCKING — the record-
    * linkage pattern for typo-level duplicates that token-set methods
    * (shingles/MinHash) blur and normalization dedup misses: candidates
    * come from equi-joins on cheap block keys (shared 24-char PREFIX or
    * shared 24-char SUFFIX — two passes, because one key alone misses
    * edits at its own end), then the expensive Levenshtein gate runs on
    * candidates only, with a length-difference prune first (|lenA−lenB|
    * is a lower bound on edit distance) and Spark's thresholded banded
    * DP (`levenshtein(a,b,t)` → -1 past t) so the per-pair cost is
    * O(maxDist·len), not O(len²). Shuffles are equi-joins on block keys;
    * nothing is all-pairs at any corpus size. The corpus is staged with
    * deterministic tail-edited (doc_id % 37) and head-edited (% 41)
    * copies — replayed verbatim by the oracle — so each blocking pass
    * has pairs only IT can catch. */
  def fuzzyPairs(s: SparkSession, dir: String, maxDist: Int = 24): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val off = docs.agg((max("doc_id") + 1).as("__off"))
    val withOff = docs.crossJoin(broadcast(off))
    val tailEdited = withOff.filter(col("doc_id") % 37 === 0).select(
      (col("doc_id") + col("__off")).as("doc_id"),
      concat(col("text"), lit(" near duplicate tail")).as("text"))
    val headEdited = withOff.filter(col("doc_id") % 41 === 0).select(
      (col("doc_id") + col("__off") * 2).as("doc_id"),
      concat(lit("copy: "), col("text")).as("text"))
    fuzzyPairsOf(docs.unionAll(tailEdited).unionAll(headEdited),
      "doc_id", "text", maxDist)
  }

  /** The blocked Levenshtein pair join over ANY (id, text) frame.
    * Returns (id_a, id_b, dist) for every pair within `maxDist` edits
    * that shares a 24-char prefix or suffix block. */
  def fuzzyPairsOf(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int): DataFrame = {
    val base = docs.selectExpr(s"$idCol AS id", s"$textCol AS t",
      s"length($textCol) AS len")
    def blockPairs(key: String): DataFrame = {
      val k = base.withColumn("bk", expr(key))
      val a = k.select(col("bk"), col("id").as("id_a"),
        col("t").as("ta"), col("len").as("la"))
      val b = k.select(col("bk"), col("id").as("id_b"),
        col("t").as("tb"), col("len").as("lb"))
      a.join(b, "bk").filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b", "ta", "tb", "la", "lb")
    }
    blockPairs("left(t, 24)").unionAll(blockPairs("right(t, 24)"))
      .dropDuplicates("id_a", "id_b")
      .filter(abs(col("la") - col("lb")) <= maxDist)
      .withColumn("dist",
        expr(s"levenshtein(ta, tb, ${maxDist + 1})"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
      .orderBy("id_a", "id_b")
  }

  /** Leakage-safe train/eval split — the contamination guard a training
    * pipeline needs BEFORE holding out an eval set: the random coin is
    * thrown per near-dup CLUSTER (connected component of the verified
    * pair graph; singletons are their own cluster), so two near-duplicate
    * documents can never land on opposite sides of the split. A naive
    * per-doc split leaks ~every duplicated eval doc into training — the
    * cross_pairs column (verified near-dup pairs straddling the split)
    * is 0 by construction here and is emitted as the checked evidence.
    * Cost beyond the pair graph: one left join + row-local coin + two
    * bounded aggs. */
  def clusterSafeSplit(s: SparkSession, dir: String,
                       trainFrac: Double = 0.8): DataFrame = {
    val pairs = minhashPairs(s, dir).select("da", "db").cache()
    val labels = componentLabels(s, pairs)
    val docs = Tables.documents(s, dir).select("doc_id")
    val lbl = docs.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("lbl"))
    val coin = graft.functions.GraftFunctions.md5Coin(col("lbl"))
    val sided = lbl
      .withColumn("side", when(coin < trainFrac, "train").otherwise("eval"))
      .cache()
    val sides = sided.groupBy("side").agg(count(lit(1)).as("n_docs"),
      countDistinct("lbl").as("n_clusters"))
    val cross = pairs
      .join(sided.select(col("doc_id").as("da"), col("side").as("sa")), "da")
      .join(sided.select(col("doc_id").as("db"), col("side").as("sb")), "db")
      .agg(coalesce(sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)),
        lit(0L)).as("cross_pairs"))
    sides.crossJoin(broadcast(cross)).orderBy("side")
  }

  /** Connected-component labels `(doc_id, lbl)` over an undirected pair
    * graph (`da`/`db` columns), lbl = min id reachable. Driver union-find
    * while the edge list fits `maxDriverEdges`; distributed min-label
    * propagation with pointer jumping beyond it — identical output either
    * way (see [[dedupClusters]]). Ids absent from any pair get no row. */
  def componentLabels(s: SparkSession, pairs: DataFrame,
                      maxDriverEdges: Long = 1L << 20): DataFrame = {
    if (pairs.count() <= maxDriverEdges) {
      // driver union-find with min-root tracking. `find` is ITERATIVE
      // (walk to root, then path-compress): a recursive version recurses
      // once per parent link, and an adversarial long-chain component near
      // maxDriverEdges would overflow the driver stack.
      val es = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var root = x
        while (parent.getOrElseUpdate(root, root) != root) root = parent(root)
        var cur = x
        while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
        root
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
      }
      val rows = parent.keys.toSeq.map(d => (d, find(d)))
      import s.implicits._
      rows.toDF("doc_id", "lbl")
    } else {
      val edges = pairs.select(col("da").as("a"), col("db").as("b"))
        .union(pairs.select(col("db").as("a"), col("da").as("b")))
        .cache()
      var lbls = edges.select(col("a").as("doc_id")).distinct()
        .withColumn("lbl", col("doc_id"))
        .cache()
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 25) {
        val neighborMin = edges
          .join(lbls.select(col("doc_id").as("a"), col("lbl").as("la")), "a")
          .groupBy(col("b").as("doc_id")).agg(min("la").as("nl"))
        val propagated = lbls.join(neighborMin, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("lbl"))
        // pointer jumping: shortcut each label to its label's label
        val next = propagated
          .join(propagated.select(col("doc_id").as("lbl"), col("lbl").as("ll")),
            Seq("lbl"), "left")
          .select(col("doc_id"), least(col("lbl"), coalesce(col("ll"), col("lbl"))).as("lbl"))
          .cache()
        changed = next.join(lbls.withColumnRenamed("lbl", "old"), "doc_id")
          .filter(col("lbl") =!= col("old")).count()
        lbls.unpersist()
        lbls = next
        rounds += 1
      }
      lbls
    }
  }

  /** 60-bit SimHash per doc from distinct-token md5s (15-bit band keys give a 32768-way shuffle key space per band — an 8-bit split would hot-key the band join at corpus scale) (majority vote per
    * bit). Single aggregation keyed by doc — embarrassingly parallel. */
  def simhashSig(s: SparkSession, dir: String): DataFrame =
    simhashSigOf(Tables.documents(s, dir), "doc_id", "text")

  /** 60-bit SimHash signature over ANY (id, text) frame. */
  def simhashSigOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .selectExpr(s"$idCol AS doc_id",
        s"explode(array_distinct(split($textCol, ' '))) AS t")
      .selectExpr("doc_id",
        "cast(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) AS h")
      .selectExpr("doc_id", "h", "explode(sequence(0, 59)) AS b")
      .selectExpr("doc_id", "b",
        "CASE WHEN (h div shiftleft(CAST(1 AS BIGINT), b)) % 2 = 1 THEN 1 ELSE -1 END AS v")
      .groupBy("doc_id", "b").agg(sum("v").as("vs"))
      .selectExpr("doc_id",
        "CASE WHEN vs > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END AS bit")
      .groupBy("doc_id").agg(sum("bit").as("simhash"))
      .orderBy("doc_id")

  /** SimHash near-dup pairs — the Charikar/Google-crawl dedup: docs whose
    * 60-bit SimHash signatures differ in at most `maxHamming` bits. The
    * band count is DERIVED from the radius (bands = maxHamming + 1) so the
    * pigeonhole recall guarantee holds for every configurable radius, not
    * just the default: Hamming ≤ r over r+1 bands forces at least one band
    * to match exactly, so banding has 100% recall at radius r (asserted
    * against a brute-force sweep by spec) while candidate generation costs
    * one shuffle on the (band, band-sig) key. At the default r=3 this is
    * the classic 4×15-bit split (32768-way key space per band — wide
    * enough not to hot-key the shuffle); higher radii narrow the bands and
    * coarsen the key space, the inherent LSH recall/cost trade. Verify is
    * a row-local `bit_count(xor)`. */
  def simhashNeardup(s: SparkSession, dir: String,
                     maxHamming: Int = 3): DataFrame =
    simhashNeardupOf(Tables.documents(s, dir), "doc_id", "text", maxHamming)

  /** The banded Hamming pair join over ANY (id, text) frame — what the
    * `dedup_simhash` corpus step gates on. Bands = maxHamming + 1 (clamped
    * to [1, 60]); band i covers bits [i*60/nb, (i+1)*60/nb) of the 60-bit
    * signature, so uneven widths are spread evenly when 60 % nb != 0. */
  def simhashNeardupOf(docs: DataFrame, idCol: String, textCol: String,
                       maxHamming: Int): DataFrame = {
    val nb = math.min(60, math.max(1, maxHamming + 1))
    val banded = simhashSigOf(docs, idCol, textCol)
      .selectExpr("doc_id", "simhash", s"explode(sequence(0, ${nb - 1})) AS band")
      .selectExpr("doc_id", "simhash", "band",
        s"(simhash div shiftleft(CAST(1 AS BIGINT), CAST(band * 60 / $nb AS INT))) " +
          s"% shiftleft(CAST(1 AS BIGINT), " +
          s"CAST((band + 1) * 60 / $nb AS INT) - CAST(band * 60 / $nb AS INT)) AS bsig")
      .cache() // both sides of the candidate join
    val cand = banded.selectExpr("band", "bsig", "doc_id AS da", "simhash AS ha")
      .join(banded.selectExpr("band", "bsig", "doc_id AS db", "simhash AS hb"),
        Seq("band", "bsig"))
      .filter(col("da") < col("db"))
      .select("da", "db", "ha", "hb").distinct()
    cand
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxHamming)
      .select("da", "db", "hamming")
      .orderBy("da", "db")
  }

  /** Contract-facing summary of [[simhashNeardup]]: pair count and
    * distinct docs involved per Hamming distance. The synthetic corpus's
    * 31-word vocabulary makes SimHash signatures still collide
    * (hundreds of thousands of ≤3 pairs at sf0.1 — a property of the
    * data, not the operator), so the checked artifact is the compact
    * distance histogram; the pair-level output is exercised by the
    * brute-force recall spec instead. */
  def simhashNeardupProfile(s: SparkSession, dir: String): DataFrame = {
    val pairs = simhashNeardup(s, dir).cache()
    val np = pairs.groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
    val nd = pairs
      .select(col("hamming"), explode(array(col("da"), col("db"))).as("d"))
      .groupBy("hamming").agg(countDistinct("d").as("n_docs"))
    np.join(nd, "hamming").orderBy("hamming")
  }

  // ----------------------------------------------------- similarity search
  //
  // The vector kernels (normalize / dot / LSH signature) are native
  // Catalyst expressions with codegen — graft.functions.VectorExpressions —
  // registered as vec_norm/vec_dot/vec_sig via SparkSessionExtensions.
  // Inside whole-stage codegen they read ArrayData directly; the Scala UDFs
  // they replaced paid per-row Seq boxing on every candidate pair.
  import graft.functions.GraftFunctions.{vecDot, vecL2, vecNorm, vecSig}

  /** Brute-force cosine top-5 for query vectors (vec_id < 8) — the
    * correctness baseline for ANN. The query side is tiny → broadcast
    * nested-loop; candidates stream partition-parallel. Scale path:
    * LSH-bucketed candidate generation ([[annLsh]]). */
  def annTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), vecNorm(col("embedding")).as("vn"))
    val q = e.filter(col("vec_id") < 8).select(col("vec_id").as("q_id"), col("vn").as("qv"))
    val c = e.select(col("vec_id").as("c_id"), col("vn").as("cv"))
    // broadcast the bounded query set, stream the corpus (see annSq8 note)
    val scored = broadcast(q).crossJoin(c).filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(vecDot(col("qv"), col("cv")), 4).as("cos_sim"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("cos_sim"), asc("c_id"))))
      .filter(col("rnk") <= 5)
      .select("q_id", "rnk", "c_id", "cos_sim")
      .orderBy("q_id", "rnk")
  }

  /** Retrieval-quality evaluation of the LSH scale path against the exact
    * brute-force gold standard: recall@3, MRR, and binary-relevance
    * nDCG@3, averaged over the query set — the numbers that tell you
    * whether an ANN shortcut is GOOD ENOUGH to serve, not just fast. Both
    * rankings come from the already-verified operators ([[annLsh]] /
    * [[annTopK]]), so this is one membership join on the tiny per-query
    * result frames plus closed-form aggregates; MRR rides max(1/rnk) over
    * the relevant hits — no window. */
  def annNdcg(s: SparkSession, dir: String): DataFrame = {
    val gold = annTopK(s, dir).filter(col("rnk") <= 3)
      .select(col("q_id"), col("c_id"))
    val sys = annLsh(s, dir).select(col("q_id"), col("rnk"), col("c_id"))
    val idcg = (1 to 3).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0))).sum
    // the aggregation is driven from the GOLD side: a query whose LSH
    // bands produce zero candidates still contributes 0 to every metric
    // instead of silently vanishing from n_queries (which would inflate
    // the averages — the eval must charge the index for total misses)
    gold.join(sys, Seq("q_id", "c_id"), "left")
      .groupBy("q_id").agg(
        (sum(when(col("rnk").isNotNull, 1).otherwise(0)) / lit(3.0))
          .as("recall"),
        coalesce(max(when(col("rnk").isNotNull, lit(1.0) / col("rnk"))),
          lit(0.0)).as("rr"),
        coalesce(sum(when(col("rnk").isNotNull,
          lit(1.0) / log2(col("rnk") + lit(1.0)))), lit(0.0)).as("dcg"))
      .agg(count(lit(1)).as("n_queries"),
        round(avg("recall"), 6).as("recall_at_3"),
        round(avg("rr"), 6).as("mrr"),
        round(avg(col("dcg") / lit(idcg)), 6).as("ndcg_at_3"))
  }

  /** Maximal Marginal Relevance (MMR) diversified top-k — the re-ranking
    * step between retrieval and consumption (RAG context assembly,
    * dedup-aware search): greedily pick k results maximizing
    * λ·relevance − (1−λ)·max-similarity-to-already-picked, so near-
    * duplicate hits don't crowd the result list the plain cosine top-k
    * ([[annTopK]]) returns. */
  def annMmr(s: SparkSession, dir: String): DataFrame =
    annMmrOf(Tables.embeddings(s, dir), col("vec_id") < 8)

  /** MMR over ANY (vec_id, embedding) frame with an arbitrary bounded
    * query predicate. Scale shape: candidate generation is the standard
    * broadcast-queries/stream-corpus pass (swap in the persisted ANN
    * probe for candidates at index scale — same contract), after which
    * ALL work runs on the O(nq·nCand) candidate table: its pairwise sims
    * are nq·nCand² rows, and each of the k greedy rounds is one
    * join + keyed-window argmax over that bounded frame, parallel across
    * queries. The sequential part is k ROUNDS (k plan iterations, frames
    * checkpointed flat), never a per-row driver loop; corpus size only
    * ever enters through the one scored scan. */
  def annMmrOf(emb: DataFrame, queryPred: org.apache.spark.sql.Column,
               k: Int = 5, lam: Double = 0.7, nCand: Int = 12,
               maxQueries: Long = 4096): DataFrame = {
    val e = emb.select(col("vec_id"), vecNorm(col("embedding")).as("vn"))
    val q0 = e.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("vn").as("qv"))
    val nq = q0.limit(math.min(maxQueries + 1, Int.MaxValue.toLong).toInt).count()
    require(nq > 0, "ann_mmr: query predicate selected no rows")
    require(nq <= maxQueries,
      s"ann_mmr: query set has more than $maxQueries rows (the broadcast " +
        "bound) — generate candidates via the persisted ANN index instead")
    val q = q0.localCheckpoint(true)
    val c = e.select(col("vec_id").as("c_id"), col("vn").as("cv"))
    val cand = broadcast(q).crossJoin(c).filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(vecDot(col("qv"), col("cv")), 4).as("rel"), col("cv"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("rel"), asc("c_id"))))
      .filter(col("rnk") <= nCand)
      .drop("rnk")
      .localCheckpoint(true) // O(nq·nCand) rows — everything below is bounded
    val ps = cand.select(col("q_id"), col("c_id").as("a"), col("cv").as("av"))
      .join(cand.select(col("q_id"), col("c_id").as("b"), col("cv").as("bv")), "q_id")
      .filter(col("a") =!= col("b"))
      .select(col("q_id"), col("a"), col("b"),
        round(vecDot(col("av"), col("bv")), 4).as("sim"))
      .localCheckpoint(true)
    val candLite = cand.select("q_id", "c_id", "rel")
    var selected: DataFrame = null
    for (r <- 1 to k) {
      val scored =
        if (r == 1) candLite.withColumn("score", lit(lam) * col("rel"))
        else {
          val pen = ps
            .join(selected.select(col("q_id"), col("c_id").as("b")), Seq("q_id", "b"))
            .groupBy(col("q_id"), col("a").as("c_id")).agg(max("sim").as("pen"))
          candLite
            .join(selected.select("q_id", "c_id"), Seq("q_id", "c_id"), "left_anti")
            .join(pen, Seq("q_id", "c_id"), "left")
            .withColumn("score", lit(lam) * col("rel") -
              lit(1.0 - lam) * coalesce(col("pen"), lit(0.0)))
        }
      val pick = scored
        .withColumn("rn", row_number().over(
          Window.partitionBy("q_id").orderBy(desc("score"), asc("c_id"))))
        .filter(col("rn") === 1)
        .select(col("q_id"), lit(r).as("rnk"), col("c_id"), col("rel"),
          // 5 decimals: λ·rel − (1−λ)·pen has an EXACT 5-digit decimal
          // value (4-rounded inputs × a 1-digit λ), so rounding at 5
          // lands on the grid point in both engines; rounding at 4 sits
          // exactly on the half-way tie, where Spark (HALF_UP) and
          // DuckDB (float round) disagree
          round(col("score"), 5).as("score"))
      selected = (if (r == 1) pick else selected.unionAll(pick))
        .localCheckpoint(true) // keep round r+1's plan flat
    }
    selected.orderBy("q_id", "rnk")
  }

  /** Hard-negative mining for embedding-model training (contrastive /
    * triplet pipelines): for each query vector, the most similar
    * SAME-label candidate (the positive) and the most similar
    * DIFFERENT-label candidate (the hard negative) by exact cosine —
    * the pair selection step a contrastive fine-tune runs over its
    * training corpus. Same plan as [[annTopK]]: broadcast the bounded
    * query set, stream the corpus partition-parallel; at 100 TB the
    * candidate generation swaps to the ANN index ([[annLsh]]/[[annIvf]])
    * without changing the ranking or the output contract. */
  def hardNegatives(s: SparkSession, dir: String): DataFrame =
    hardNegativesOf(Tables.embeddings(s, dir), col("vec_id") < 8)

  /** Hard-negative mining over ANY (vec_id, label, embedding) frame with
    * an ARBITRARY query-set predicate. The query set is broadcast, so its
    * size is validated against `maxQueries` (a loud failure, not a silent
    * executor OOM) — a larger query set belongs on the ANN index path
    * ([[annIvfProbeFrom]]), which swaps in without changing the ranking
    * or the output contract. */
  def hardNegativesOf(emb: DataFrame,
                      queryPred: org.apache.spark.sql.Column,
                      maxQueries: Long = 4096): DataFrame = {
    val e = emb
      .select(col("vec_id"), col("label"), vecNorm(col("embedding")).as("vn"))
    val q0 = e.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("label").as("ql"), col("vn").as("qv"))
    // bounded validation scan: limit(max+1) answers both "empty?" and
    // "over the broadcast bound?" without a full count of the corpus
    val nq = q0.limit(math.min(maxQueries + 1, Int.MaxValue.toLong).toInt).count()
    require(nq > 0, "hard_negatives: query predicate selected no rows")
    require(nq <= maxQueries,
      s"hard_negatives: query set has more than $maxQueries rows (the " +
        "broadcast bound) — use the persisted ANN index path for large " +
        "query sets")
    // the VALIDATED query set is <= maxQueries narrow rows: materialize it
    // once (local checkpoint — no catalog-cache entry to leak) so the
    // probe side doesn't re-run the predicate scan
    val q = q0.localCheckpoint(true)
    val c = e.select(col("vec_id").as("c_id"), col("label").as("cl"), col("vn").as("cv"))
    val scored = broadcast(q).crossJoin(c).filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("ql"), col("c_id"), col("cl"),
        round(vecDot(col("qv"), col("cv")), 4).as("cos_sim"))
      .cache() // feeds both the positive and the negative ranking
    def top1(cond: org.apache.spark.sql.Column, pfx: String) = scored
      .filter(cond)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("cos_sim"), asc("c_id"))))
      .filter(col("rnk") === 1)
      .select(col("q_id"), col("c_id").as(s"${pfx}_id"),
        col("cos_sim").as(s"${pfx}_cos"))
    top1(col("ql") === col("cl"), "pos")
      .join(top1(col("ql") =!= col("cl"), "neg"), "q_id")
      .orderBy("q_id")
  }

  /** LSH-bucketed ANN — the SCALE path for similarity search: EIGHT
    * independent 4-hyperplane sign-projection tables (weights ±1 from md5
    * hex-digit parity of the dimension index, band b reading digit family
    * b·4 — reproducible in any engine) hash every vector into 16 buckets
    * per band; candidates meet when they share a bucket in ANY band
    * (OR-ed tables — the standard LSH recall knob: per-band match
    * probability is (1−θ/π)⁴, so recall@3 on this weakly-clustered
    * synthetic corpus goes ~0.13 (1 band) → ~0.21 (3) → ~0.46 (6) →
    * 0.67 at 8, measured by AnnRecallSpec), then exact cosine ranks top-3.
    * At 100 TB: signatures are row-local expressions, the index is 3× the
    * corpus in narrow (band, sig, id) rows, the join shuffles on the
    * (band, sig) key, and bands/planes trade recall for bucket size
    * without changing the plan shape. */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val nBands = 8
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), vecNorm(col("embedding")).as("vn"),
        explode(array((0 until nBands).map(b =>
          struct(lit(b).as("band"),
            vecSig(col("embedding"), 4, 64, b * 4).as("sig"))): _*)).as("bs"))
      .select(col("vec_id"), col("vn"),
        col("bs.band").as("band"), col("bs.sig").as("sig"))
      .cache() // both join sides read the banded index
    val q = e.filter(col("vec_id") < 8)
      .selectExpr("vec_id AS q_id", "vn AS qv", "band", "sig")
    val c = e.selectExpr("vec_id AS c_id", "vn AS cv", "band", "sig")
    q.join(c, Seq("band", "sig")).filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(vecDot(col("qv"), col("cv")), 4).as("cos_sim"))
      // a pair sharing several bands appears once per band — dedup on the
      // NARROW (ids, score) rows, never shuffling the vectors
      .groupBy("q_id", "c_id").agg(min("cos_sim").as("cos_sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("cos_sim"), asc("c_id"))))
      .filter(col("rnk") <= 3)
      .select("q_id", "rnk", "c_id", "cos_sim")
      .orderBy("q_id", "rnk")
  }

  /** IVF-bucketed ANN — the coarse-quantizer scale path (IVF-flat): a small
    * centroid set partitions the corpus into inverted lists; every vector
    * joins its nearest centroid's list (one broadcast join — the centroid
    * set is small by construction), and queries probe their `nprobe`
    * closest lists, so candidate generation touches ~nprobe/k of the corpus
    * instead of all of it. Exact cosine ranks the survivors.
    *
    * Centroids are a deterministic k-sample ([[coarseSeeds]]) so the
    * oracle can replay the assignment; k defaults to the corpus-adaptive
    * [[adaptiveCoarseK]] (⌈√N⌉ capped) and nprobe to [[adaptiveNprobe]]
    * (⌈√k⌉), so probe selectivity IMPROVES as the corpus grows instead of
    * pinning at a test-scale constant. At 100 TB centroids would come from
    * k-means on a sample — the plan shape (broadcast assign → equi-join on
    * cell id → per-query top-k) is unchanged. Assignment ranks on
    * round(dot, 6) with a centroid-id tie-break — deterministic across
    * engines. */
  def annIvf(s: SparkSession, dir: String,
             k: Int = -1, nprobe: Int = -1): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), vecNorm(col("embedding")).as("vn"))
      .cache() // normalized corpus, read by assignment + both join sides
    val kk = if (k > 0) k else adaptiveCoarseK(e.count())
    val np = if (nprobe > 0) nprobe else adaptiveNprobe(kk)
    val cents = coarseSeeds(e, kk)
      .select(col("vec_id").as("cent_id"), col("vn").as("cv"))
    // Assignment ranks on NARROW rows (vec_id, cent_id, d): the k-way
    // centroid fan-out must never replicate the embedding array k× through
    // the ranking shuffle/cache — vectors are joined back by id afterwards
    // (linear, co-partitioned on vec_id).
    val scored = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"),
        round(vecDot(col("vn"), col("cv")), 6).as("d"))
    // rn over vec_id: high-cardinality partition key — parallel window
    val byCell = row_number().over(
      Window.partitionBy("vec_id").orderBy(desc("d"), asc("cent_id")))
    val assigned = scored.withColumn("rn", byCell)
      .filter(col("rn") <= np).select("vec_id", "cent_id", "rn")
      .cache()
    val lists = assigned.filter(col("rn") === 1).join(e, "vec_id")
      .select(col("vec_id").as("c_id"), col("vn").as("cvn"), col("cent_id"))
    val probes = assigned.filter(col("vec_id") < 8).join(e, "vec_id")
      .select(col("vec_id").as("q_id"), col("vn").as("qv"), col("cent_id"))
    probes.join(lists, "cent_id").filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(vecDot(col("qv"), col("cvn")), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("cos_sim"), asc("c_id"))))
      .filter(col("rnk") <= 3)
      .select("q_id", "rnk", "c_id", "cos_sim")
      .orderBy("q_id", "rnk")
  }

  /** Embedding-cosine near-dup pairs: LSH-bucketed candidates (same
    * 16-bucket sign-projection scheme as [[annLsh]]), kept when cosine ≥
    * 0.35 (the top of the similarity range in the synthetic corpus) — the embedding-space twin of MinHash dedup. Never all-pairs.
    *
    * Per-pair work is ONE dot product of pre-normalized vectors: norms are
    * computed once per vector at signature time (O(n) not O(pairs)), and
    * the pair dot runs as a primitive-array UDF loop — higher-order array
    * expressions (`aggregate`/`zip_with`) are interpreted per element, an
    * order of magnitude slower in the pair hot path. */
  def neardupCosine(s: SparkSession, dir: String): DataFrame = {
    val sigs = Tables.embeddings(s, dir)
      .select(col("vec_id"), vecNorm(col("embedding")).as("vn"),
        vecSig(col("embedding"), 4, 64).as("sig"))
      .cache()
    sigs.selectExpr("sig", "vec_id AS da", "vn AS va")
      .join(sigs.selectExpr("sig", "vec_id AS db", "vn AS vb"), "sig")
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"),
        round(vecDot(col("va"), col("vb")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= 0.35)
      .orderBy("da", "db")
  }

  /** Deterministic k-means over the embedding corpus (Lloyd, 3 assignment
    * rounds, centroids seeded from the fixed-k [[coarseSeeds]] sample) →
    * per-cluster profile — the corpus-clustering step of training-data
    * curation (cluster-balanced sampling / domain discovery).
    *
    * Scale design: assignment is ROW-LOCAL — the k centroids ride into the
    * plan as literals (the broadcast-join limit case: no shuffle, no join,
    * one argmin expression per row), exactly how MLlib's k-means scores
    * after collecting centroids to the driver. Each centroid update is one
    * hash aggregate on narrow (cluster, dim, partial-sum) rows with
    * map-side combine. Per-round centroids are rounded to 6 dp so the
    * floating-point summation order of the update aggregate can never leak
    * into the next round's distances — that makes the whole iteration
    * bit-reproducible cross-engine (distances use the left-to-right
    * vec_dot kernel = DuckDB's list_dot_product order). */
  def embedKmeans(s: SparkSession, dir: String): DataFrame =
    kmeansAssign(s, dir)
      .groupBy(col("cid").as("cluster_id"))
      .agg(count(lit(1)).as("n"),
        round(avg(sqrt(greatest(col("d2"), lit(0.0)))), 4).as("avg_dist"))
      .orderBy("cluster_id")

  /** Cluster-balanced sampling — the curation step k-means exists for:
    * per cluster, the `perCluster` members nearest the centroid
    * (deterministic order: rounded distance, then vec_id). A keyed window
    * per cluster — partition-parallel, no global sort. */
  def kmeansBalance(s: SparkSession, dir: String,
                    perCluster: Int = 3): DataFrame =
    kmeansAssign(s, dir)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("cid").orderBy(round(col("d2"), 6), col("vec_id"))))
      .filter(col("rnk") <= perCluster)
      .select(col("cid").as("cluster_id"), col("rnk"), col("vec_id"),
        round(sqrt(greatest(col("d2"), lit(0.0))), 4).as("dist"))
      .orderBy("cluster_id", "rnk")

  /** The literal centroid array expression: k (cid, cv, |cv|²) structs
    * riding into the plan as constants — the broadcast-join limit case
    * (no shuffle, no join; row-local argmin). O(k·dim) literals. */
  private def centArrOf(cents: Seq[(Long, Array[Double])]) =
    array(cents.map { case (id, cv) =>
      struct(lit(id).as("cid"),
        array(cv.map(lit(_)): _*).as("cv"),
        lit(cv.foldLeft(0.0)((a, x) => a + x * x)).as("c2"))
    }: _*)

  /** Squared L2 distance of row vector `v` (with cached `x2`) to a
    * centroid struct — shared by assignment and probe ranking. */
  private def centD2(c: org.apache.spark.sql.Column) =
    col("x2") + c("c2") - lit(2.0) * vecDot(col("v"), c("cv"))

  /** Row-local best-centroid assignment of `e` (vec_id, v, x2). */
  private def assignBest(e: DataFrame,
                         cents: Seq[(Long, Array[Double])]): DataFrame =
    e.withColumn("best", array_min(transform(centArrOf(cents), c =>
        struct(round(centD2(c), 6).as("rd2"), c("cid").as("cid"), centD2(c).as("d2")))))
      .select(col("vec_id"), col("v"),
        col("best.cid").as("cid"), col("best.d2").as("d2"))

  /** Deterministic 2-round Lloyd fit: returns the cached (vec_id, v, x2)
    * frame and the refined centroids. Seeds come from [[coarseSeeds]]
    * (O(k) driver state at any SF); each update is one hash aggregate on
    * narrow (cluster, dim, partial-sum) rows; per-round components are
    * rounded to 6 dp so aggregate summation order can never leak into the
    * next round — bit-reproducible cross-engine. */
  private def kmeansFit(s: SparkSession, dir: String,
                        k: Int = KmeansK): (DataFrame, Seq[(Long, Array[Double])]) = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("x2", vecDot(col("v"), col("v")))
      .cache() // read once per round; narrow (id, vec, norm) rows
    (e, lloydFit(e, k))
  }

  /** Deterministic 2-round Lloyd over ANY (vec_id, v, x2) frame — shared
    * by the full-vector k-means and the per-subspace PQ training. */
  private def lloydFit(e: DataFrame, k: Int): Seq[(Long, Array[Double])] = {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    var cents: Seq[(Long, Array[Double])] = coarseSeeds(e, k)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray.map(round6)))
      .sortBy(_._1).toSeq
    for (_ <- 1 to 2) {
      val updated = assignBest(e, cents)
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          (cid, rows.sortBy(_.getInt(1)).map(r => round6(r.getDouble(2))).toArray)
        }
      // empty clusters keep their previous centroid (standard Lloyd choice)
      cents = cents.map { case (id, cv) => (id, updated.getOrElse(id, cv)) }
    }
    cents
  }

  /** Final-round (vec_id, cid, d2) assignment shared by the k-means
    * profile and the balanced sampler. */
  private def kmeansAssign(s: SparkSession, dir: String): DataFrame = {
    val (e, cents) = kmeansFit(s, dir)
    assignBest(e, cents)
  }

  /** IVF with a TRAINED coarse quantizer — the production billion-scale
    * shape end to end: the fixed-k seeds refined by the deterministic
    * 2-round Lloyd ([[kmeansFit]]), inverted lists = the final L2
    * assignment, probes = each query's `nprobe` nearest refined centroids
    * (row-local ranked literal array — no shuffle), exact cosine re-rank
    * of list members. Differs from [[annIvf]] (raw-seed cells, cosine
    * assignment) exactly the way a trained IVF differs from a random one;
    * both keep O(k) broadcast state and O(N·k) assignment at any SF, with
    * the same corpus-adaptive k/nprobe defaults. */
  def annIvfTrained(s: SparkSession, dir: String,
                    k: Int = -1, nprobe: Int = -1): DataFrame = {
    val n = Tables.embeddings(s, dir).count()
    val kk = if (k > 0) k else adaptiveCoarseK(n)
    val np = if (nprobe > 0) nprobe else adaptiveNprobe(kk)
    val (e, cents) = kmeansFit(s, dir, kk)
    val lists = assignBest(e, cents)
      .select(col("vec_id").as("c_id"), col("cid").as("cent_id"))
    // nprobe nearest refined centroids per query: sort the k-struct literal
    // array by (round(d2, 6), cid) and slice — row-local, engine-replayable
    val probes = e.filter(col("vec_id") < 8)
      .withColumn("pr", slice(array_sort(transform(centArrOf(cents), c =>
        struct(round(centD2(c), 6).as("rd2"), c("cid").as("cid")))), 1, np))
      .select(col("vec_id").as("q_id"), explode(col("pr")).as("p"))
      .select(col("q_id"), col("p.cid").as("cent_id"))
    val vn = Tables.embeddings(s, dir)
      .select(col("vec_id"), vecNorm(col("embedding")).as("vn"))
      .cache() // read by both sides of the re-rank join
    probes.join(lists, "cent_id").filter(col("q_id") =!= col("c_id"))
      .join(vn.select(col("vec_id").as("q_id"), col("vn").as("qv")), "q_id")
      .join(vn.select(col("vec_id").as("c_id"), col("vn").as("cv")), "c_id")
      .select(col("q_id"), col("c_id"),
        round(vecDot(col("qv"), col("cv")), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("cos_sim"), asc("c_id"))))
      .filter(col("rnk") <= 3)
      .select("q_id", "rnk", "c_id", "cos_sim")
      .orderBy("q_id", "rnk")
  }

  /** In-JVM registry of published IVF index roots, keyed by
    * (corpus dir, corpus file signature, publish root). Production
    * similarity search builds its index ONCE and probes many times; the
    * registry gives Verify/Bench that exact shape — the first call
    * (bench's unmeasured warmup) pays build+publish, every later call is
    * probe-only against the committed artifact. The signature keys the
    * cache on corpus CONTENT metadata (file names, lengths, mtimes), so
    * a rewritten corpus at the same path invalidates the entry instead
    * of silently serving a stale index. */
  private val ivfIndexRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** File-level corpus signature: (name, length, mtime) of the embeddings
    * table's files, hashed. O(files) driver-side metadata listing — the
    * same scheme-dispatched Hadoop FS the read itself uses, so it works
    * on any store a cluster would read from. */
  private def embeddingsSignature(s: SparkSession, dir: String): String =
    fileSignature(s, s"$dir/embeddings.parquet")

  private def documentsSignature(s: SparkSession, dir: String): String =
    fileSignature(s, s"$dir/documents.parquet")

  private def fileSignature(s: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val parts =
      (if (st.isDirectory) fs.listStatus(p).toSeq else Seq(st))
        .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
        .sorted.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .take(16)
  }

  /** Build the trained-IVF index for `dir` and PUBLISH it as a pair of
    * [[graft.plans.SnapshotStore]] tables under one root — `centroids`
    * (O(k·dim) refined Lloyd centroids) and `lists` (O(N) inverted-list
    * rows: member id, cell id, unit vector) — returning the root. The
    * artifact is everything a probe needs: serving requires NO access to
    * the training pipeline, and a rebuild publishes the next version
    * atomically while running probes keep reading the committed one.
    *
    * `publishRoot` (or `spark.graft.index.root`) names the SHARED
    * filesystem location a cluster deployment publishes under — each
    * corpus signature gets its own subdirectory, and an index already
    * committed there (by this or any other driver) is reused without a
    * rebuild. With neither set, the index lands in a driver-local temp
    * directory: correct in local mode (the only place executors share
    * the driver's disk), which is what Verify/Bench run. */
  def ivfIndexPublish(s: SparkSession, dir: String,
                      publishRoot: Option[String] = None): String = {
    val confRoot = s.conf.getOption("spark.graft.index.root")
    val base = publishRoot.orElse(confRoot)
    val sig = embeddingsSignature(s, dir)
    ivfIndexRoots.computeIfAbsent(s"$dir#$sig#${base.getOrElse("")}", _ => {
      val root = base.map(b => s"$b/ivf-$sig").getOrElse(
        java.nio.file.Files.createTempDirectory("graft-ivf-index").toString)
      val committed = // cross-driver reuse: a committed index IS the build
        Seq("centroids", "lists", "codebook", "codes").forall(t =>
          graft.plans.SnapshotStore.latestVersion(s"$root/$t").isDefined)
      if (!committed) {
        val n = Tables.embeddings(s, dir).count()
        val (e, cents) = kmeansFit(s, dir, adaptiveCoarseK(n))
        import s.implicits._
        val centDf = cents.map { case (cid, cv) => (cid, cv.toSeq) }
          .toDF("cid", "cv")
        val vn = Tables.embeddings(s, dir)
          .select(col("vec_id"), vecNorm(col("embedding")).as("cvn"))
        val assigned = assignBest(e, cents)
          .select(col("vec_id"), col("cid").as("cent_id"))
        val lists = assigned
          .join(vn, "vec_id")
          .select(col("vec_id").as("c_id"), col("cent_id"), col("cvn"))
        graft.plans.SnapshotStore.publish(centDf, s"$root/centroids", 1L)
        graft.plans.SnapshotStore.publish(lists, s"$root/lists", 1L)
        // PQ side of the artifact: per-subspace codebooks (the first-kcb
        // unit subvectors — O(m·kcb·sub) rows) and each member's m codes
        // riding next to its cell id. The ADC probe path reads ONLY these
        // (id, cell, 4 small ints) rows; full vectors stay in `lists` for
        // the bounded shortlist re-rank.
        val cbSub = pqRawCodebook(s, dir)
        val cbDf = cbSub.zipWithIndex.flatMap { case (cws, j) =>
          cws.map { case (cid, cw) => (j, cid, cw.toSeq) }
        }.toDF("j", "cid", "cw")
        val codes = pqEncode(vn.select(col("vec_id"), col("cvn").as("vn")),
          cbSub)
          .join(assigned, "vec_id")
          .select(col("vec_id").as("c_id") +: col("cent_id") +:
            (0 until PqM).map(j => col(s"c$j")): _*)
        graft.plans.SnapshotStore.publish(cbDf, s"$root/codebook", 1L)
        graft.plans.SnapshotStore.publish(codes, s"$root/codes", 1L)
      }
      root
    })
  }

  private val PqM = 4       // subspaces
  private val PqSub = 16    // dims per subspace (64-dim embeddings)
  private val PqKcb = 8     // codewords per subspace

  /** The raw first-kcb PQ codebook over UNIT vectors: per subspace j, the
    * j-th slices of the first kcb normalized embeddings. Deterministic and
    * SF-stable — the same quantizer [[annIvfPq]] uses. */
  private def pqRawCodebook(s: SparkSession,
                            dir: String): Seq[Seq[(Long, Array[Double])]] = {
    val cbVecs = Tables.embeddings(s, dir)
      .select(col("vec_id"), vecNorm(col("embedding")).as("vn"))
      .filter(col("vec_id") < PqKcb)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
    (0 until PqM).map(j => cbVecs.map { case (cid, v) =>
      (cid, v.slice(j * PqSub, (j + 1) * PqSub)) })
  }

  /** Row-local PQ encoding of a (vec_id, vn) frame: adds columns c0..c{m-1}
    * = nearest-codeword id per subspace, ties on (round(d2,6), cid). */
  private def pqEncode(vecs: DataFrame,
                       cbSub: Seq[Seq[(Long, Array[Double])]]): DataFrame =
    (0 until PqM).foldLeft(vecs) { (df, j) =>
      val cbArr = array(cbSub(j).map { case (cid, cv) =>
        struct(lit(cid).as("cid"),
          array(cv.map(lit(_)).toIndexedSeq: _*).as("cv"),
          lit(cv.foldLeft(0.0)((a, x) => a + x * x)).as("c2"))
      }: _*)
      val sv = slice(col("vn"), j * PqSub + 1, PqSub)
      def d2(c: org.apache.spark.sql.Column) =
        vecDot(sv, sv) + c("c2") - lit(2.0) * vecDot(sv, c("cv"))
      df.withColumn(s"c$j", array_min(transform(cbArr, c =>
        struct(round(d2(c), 6).as("rd2"), c("cid").as("cid"))))
        .getField("cid"))
    }

  /** Probe-only ANN over the PUBLISHED index — the serving path of
    * [[annIvfTrained]], with no index build anywhere in the plan: the
    * committed centroids come back as an O(k·dim) literal (row-local
    * probe selection, no shuffle), the committed inverted lists are one
    * parquet scan joined on the cell id, and exact cosine re-ranks the
    * list members. Must return byte-identical rows to the inline
    * [[annIvfTrained]] (same oracle SQL checks both). */
  /** INCREMENTAL index maintenance: append new vectors to a published IVF
    * (+PQ) index without retraining — the steady-state path of a serving
    * index (FAISS `add` semantics: quantizers stay fixed, new vectors are
    * assigned to existing cells). Each append:
    *  - assigns the new vectors row-locally against the O(k) centroid
    *    literals (no shuffle),
    *  - ANTI-JOINS against the current lists on vec id, so re-appending
    *    the same batch is IDEMPOTENT (at-least-once ingest safe),
    *  - publishes merged `lists` and `codes` as the NEXT SnapshotStore
    *    version — running probes keep reading the old committed version
    *    until the atomic manifest flip, and `vacuum` reclaims it later.
    * Centroids/codebook tables are untouched (the whole point: no
    * retrain); recall on drifted distributions is the operator's signal
    * to REBUILD, which is `ivfIndexPublish` at the next version.
    * Returns the new lists version. */
  def ivfIndexAppend(s: SparkSession, root: String,
                     newVecs: DataFrame): Long = {
    val cents: Seq[(Long, Array[Double])] =
      graft.plans.SnapshotStore.readLatest(s, s"$root/centroids")
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).toSeq
    val e = newVecs
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("x2", vecDot(col("v"), col("v")))
    val assigned = assignBest(e, cents)
      .select(col("vec_id"), col("cid").as("cent_id"))
    val vn = newVecs.select(col("vec_id"),
      vecNorm(col("embedding")).as("cvn"))
    val lists = graft.plans.SnapshotStore.readLatest(s, s"$root/lists")
    val freshLists = assigned.join(vn, "vec_id")
      .select(col("vec_id").as("c_id"), col("cent_id"), col("cvn"))
      .join(lists.select("c_id"), Seq("c_id"), "left_anti")
    val nextV = graft.plans.SnapshotStore.latestVersion(s"$root/lists")
      .getOrElse(sys.error(s"ivfIndexAppend: no committed index at $root")) + 1
    graft.plans.SnapshotStore.publish(
      lists.unionByName(freshLists), s"$root/lists", nextV)
    // PQ codes: encode against the PUBLISHED codebook (read back O(m·kcb))
    val cbSub: Seq[Seq[(Long, Array[Double])]] =
      graft.plans.SnapshotStore.readLatest(s, s"$root/codebook")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_._2).map(t => (t._2, t._3)).toSeq)
    val codes = graft.plans.SnapshotStore.readLatest(s, s"$root/codes")
    val freshCodes = pqEncode(vn.select(col("vec_id"), col("cvn").as("vn")), cbSub)
      .join(assigned, "vec_id")
      .select(col("vec_id").as("c_id") +: col("cent_id") +:
        (0 until PqM).map(j => col(s"c$j")): _*)
      .join(codes.select("c_id"), Seq("c_id"), "left_anti")
    // per-table versioning: a crash between the two publishes leaves the
    // tables at different versions, and each next append heals its own
    val nextCodesV = graft.plans.SnapshotStore.latestVersion(s"$root/codes")
      .getOrElse(sys.error(s"ivfIndexAppend: no committed codes at $root")) + 1
    graft.plans.SnapshotStore.publish(
      codes.unionByName(freshCodes), s"$root/codes", nextCodesV)
    nextV
  }

  def annIvfProbePersisted(s: SparkSession, dir: String): DataFrame =
    annIvfProbeFrom(s, dir, ivfIndexPublish(s, dir))

  /** Probe the latest committed index version at `root`. */
  def annIvfProbeFrom(s: SparkSession, dir: String,
                      root: String): DataFrame = {
    val cents: Seq[(Long, Array[Double])] =
      graft.plans.SnapshotStore.readLatest(s, s"$root/centroids")
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).toSeq
    val np = adaptiveNprobe(cents.size)
    val probes = Tables.embeddings(s, dir)
      .filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("x2", vecDot(col("v"), col("v")))
      .withColumn("pr", slice(array_sort(transform(centArrOf(cents), c =>
        struct(round(centD2(c), 6).as("rd2"), c("cid").as("cid")))), 1, np))
      .select(col("vec_id").as("q_id"), col("v"), explode(col("pr")).as("p"))
      .select(col("q_id"), col("p.cid").as("cent_id"))
    val lists = graft.plans.SnapshotStore.readLatest(s, s"$root/lists")
    val qv = Tables.embeddings(s, dir).filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), vecNorm(col("embedding")).as("qv"))
    probes.join(lists, "cent_id").filter(col("q_id") =!= col("c_id"))
      .join(broadcast(qv), "q_id")
      .select(col("q_id"), col("c_id"),
        round(vecDot(col("qv"), col("cvn")), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("cos_sim"), asc("c_id"))))
      .filter(col("rnk") <= 3)
      .select("q_id", "rnk", "c_id", "cos_sim")
      .orderBy("q_id", "rnk")
  }

  /** PQ-coded (ADC) probe over the PUBLISHED index — the serving path
    * that never moves full vectors until the shortlist: probe selection
    * is the committed-centroid literal (row-local, no shuffle), the
    * candidate stream is the committed `codes` table — (id, cell, m
    * small ints) rows only — ranked by asymmetric distance against the
    * committed per-subspace codebook (an O(m·kcb·sub) literal of lookup
    * maps), and only the top-`shortlistN` survivors join the full unit
    * vectors in `lists` for the exact cosine re-rank. At 100 TB the
    * full-vector traffic is |probes|×shortlist rows; everything upstream
    * is codes. Same composition as [[annIvfPq]] but with the TRAINED
    * coarse quantizer the published index commits, and no index build
    * anywhere in the plan. */
  def annIvfPqProbePersisted(s: SparkSession, dir: String,
                             shortlistN: Int = 50, topK: Int = 3): DataFrame = {
    val root = ivfIndexPublish(s, dir)
    val cents: Seq[(Long, Array[Double])] =
      graft.plans.SnapshotStore.readLatest(s, s"$root/centroids")
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).toSeq
    val np = adaptiveNprobe(cents.size)
    // committed codebook back as per-subspace literal lookup maps
    val cbSub: Seq[Seq[(Long, Array[Double])]] = {
      val rows = graft.plans.SnapshotStore.readLatest(s, s"$root/codebook")
        .collect().map(r => (r.getInt(0), r.getLong(1),
          r.getSeq[Double](2).toArray))
      (0 until PqM).map(j => rows.filter(_._1 == j)
        .map { case (_, cid, cw) => (cid, cw) }.sortBy(_._1).toSeq)
    }
    val cwMap = (0 until PqM).map(j => typedlit(cbSub(j).map {
      case (cid, cv) => cid -> cv.toSeq }.toMap))
    val c2Map = (0 until PqM).map(j => typedlit(cbSub(j).map {
      case (cid, cv) => cid -> cv.foldLeft(0.0)((a, x) => a + x * x) }.toMap))
    val probes = Tables.embeddings(s, dir)
      .filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("x2", vecDot(col("v"), col("v")))
      .withColumn("pr", slice(array_sort(transform(centArrOf(cents), c =>
        struct(round(centD2(c), 6).as("rd2"), c("cid").as("cid")))), 1, np))
      .select(col("vec_id").as("q_id"), explode(col("pr")).as("p"))
      .select(col("q_id"), col("p.cid").as("cent_id"))
    val qv = Tables.embeddings(s, dir).filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), vecNorm(col("embedding")).as("qv"))
    val codes = graft.plans.SnapshotStore.readLatest(s, s"$root/codes")
    val cand = probes.join(codes, "cent_id")
      .filter(col("q_id") =!= col("c_id"))
      .join(broadcast(qv), "q_id")
    val adc = (0 until PqM).map { j =>
      val qs = slice(col("qv"), j * PqSub + 1, PqSub)
      vecDot(qs, qs) + element_at(c2Map(j), col(s"c$j")) -
        lit(2.0) * vecDot(qs, element_at(cwMap(j), col(s"c$j")))
    }.reduce(_ + _)
    val short = cand.withColumn("adc", adc)
      .withColumn("srn", row_number().over(
        Window.partitionBy("q_id").orderBy(round(col("adc"), 6), col("c_id"))))
      .filter(col("srn") <= shortlistN)
    val lists = graft.plans.SnapshotStore.readLatest(s, s"$root/lists")
      .select(col("c_id"), col("cvn"))
    short
      .join(lists, "c_id")
      .select(col("q_id"), col("c_id"),
        round(vecDot(col("qv"), col("cvn")), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("cos_sim"), asc("c_id"))))
      .filter(col("rnk") <= topK)
      .select("q_id", "rnk", "c_id", "cos_sim")
      .orderBy("q_id", "rnk")
  }

  /** IVF-PQ — the production billion-scale ANN shape, end to end: IVF
    * coarse cells bound the candidate set (the same adaptive k/nprobe as
    * [[annIvf]]), PQ asymmetric distance (ADC) ranks candidates WITHOUT
    * touching full vectors (codes + a literal codebook — row-local lookups,
    * no vector shuffle), and only the top-`shortlistN` survivors are
    * re-ranked with exact cosine. At 100 TB the full-vector join is thus
    * bounded to |probes|×shortlist rows; everything upstream of the re-rank
    * moves (id, cell, 4 codes) rows only. All in cosine space on
    * normalized vectors (ADC in L2-on-unit-sphere ≡ monotone in cosine).
    * The raw first-k codebook keeps the oracle compact; the TRAINED
    * per-subspace Lloyd codebooks ([[embedPqTrained]]/[[lloydFit]], −34%
    * quantization error) drop into `cbVecs` unchanged — both quantizer
    * training paths are independently oracle-verified. */
  def annIvfPq(s: SparkSession, dir: String, k: Int = -1, nprobe: Int = -1,
               shortlistN: Int = 50, topK: Int = 3): DataFrame =
    annIvfPqImpl(s, dir, k, nprobe, shortlistN, topK, trainedCb = false)

  /** [[annIvfPq]] with TRAINED per-subspace PQ codebooks — the full
    * production composition: adaptive IVF cells + Lloyd-fit quantizer
    * ([[lloydFit]] per subspace over the normalized vectors, exactly as
    * [[embedPqTrained]] over the raw ones). Same plan shape and state
    * bounds; only the codeword literals change. */
  def annIvfPqTrained(s: SparkSession, dir: String, k: Int = -1,
                      nprobe: Int = -1, shortlistN: Int = 50,
                      topK: Int = 3): DataFrame =
    annIvfPqImpl(s, dir, k, nprobe, shortlistN, topK, trainedCb = true)

  private def annIvfPqImpl(s: SparkSession, dir: String, k: Int, nprobe: Int,
                           shortlistN: Int, topK: Int,
                           trainedCb: Boolean): DataFrame = {
    val m = 4; val sub = 16; val kcb = 8
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), vecNorm(col("embedding")).as("vn"))
      .cache() // id + unit vector: read by assignment, codes, and re-rank
    val kAdapt = if (k > 0) k else adaptiveCoarseK(e.count())
    val np = if (nprobe > 0) nprobe else adaptiveNprobe(kAdapt)
    val cents = coarseSeeds(e, kAdapt)
      .select(col("vec_id").as("cent_id"), col("vn").as("cv"))
    val scored = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"),
        round(vecDot(col("vn"), col("cv")), 6).as("d"))
    val assigned = scored.withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("d"), asc("cent_id"))))
      .filter(col("rn") <= np)
      .select("vec_id", "cent_id", "rn")
      .cache()
    // PQ codebooks, per subspace: either the normalized subvectors of the
    // first kcb vectors (compact oracle), or the 2-round-Lloyd-trained
    // codewords (production training) — both O(m·kcb·sub) driver literals
    val cbSub: Seq[Seq[(Long, Array[Double])]] =
      if (trainedCb) (0 until m).map { j =>
        val ej = e.select(col("vec_id"),
            slice(col("vn"), j * sub + 1, sub).as("v"))
          .withColumn("x2", vecDot(col("v"), col("v")))
          .cache()
        lloydFit(ej, kcb)
      }
      else {
        val cbVecs = e.filter(col("vec_id") < kcb)
          .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
          .sortBy(_._1).toSeq
        (0 until m).map(j => cbVecs.map { case (cid, v) =>
          (cid, v.slice(j * sub, (j + 1) * sub)) })
      }
    // per-subspace lookup maps: code -> codeword subvector / squared norm
    val cwMap = (0 until m).map(j => typedlit(cbSub(j).map { case (cid, cv) =>
      cid -> cv.toSeq }.toMap))
    val c2Map = (0 until m).map(j => typedlit(cbSub(j).map { case (cid, cv) =>
      cid -> cv.foldLeft(0.0)((a, x) => a + x * x) }.toMap))
    // encode every db vector (row-local argmin per subspace, as embedPq)
    val codes = (0 until m).foldLeft(e) { (df, j) =>
      val cbArr = array(cbSub(j).map { case (cid, cv) =>
        struct(lit(cid).as("cid"),
          array(cv.map(lit(_)).toIndexedSeq: _*).as("cv"),
          lit(cv.foldLeft(0.0)((a, x) => a + x * x)).as("c2"))
      }: _*)
      val sv = slice(col("vn"), j * sub + 1, sub)
      def d2(c: org.apache.spark.sql.Column) =
        vecDot(sv, sv) + c("c2") - lit(2.0) * vecDot(sv, c("cv"))
      df.withColumn(s"c$j", array_min(transform(cbArr, c =>
        struct(round(d2(c), 6).as("rd2"), c("cid").as("cid")))).getField("cid"))
    }.select(col("vec_id").as("c_id") +: (0 until m).map(j => col(s"c$j")): _*)
    val lists = assigned.filter(col("rn") === 1)
      .select(col("vec_id").as("c_id"), col("cent_id"))
      .join(codes, "c_id")
    val probes = assigned.filter(col("vec_id") < 8).join(e, "vec_id")
      .select(col("vec_id").as("q_id"), col("vn").as("qv"), col("cent_id"))
    val cand = probes.join(lists, "cent_id").filter(col("q_id") =!= col("c_id"))
    val adc = (0 until m).map { j =>
      val qs = slice(col("qv"), j * sub + 1, sub)
      vecDot(qs, qs) + element_at(c2Map(j), col(s"c$j")) -
        lit(2.0) * vecDot(qs, element_at(cwMap(j), col(s"c$j")))
    }.reduce(_ + _)
    val short = cand.withColumn("adc", adc)
      .withColumn("srn", row_number().over(
        Window.partitionBy("q_id").orderBy(round(col("adc"), 6), col("c_id"))))
      .filter(col("srn") <= shortlistN)
    short
      .join(e.select(col("vec_id").as("c_id"), col("vn").as("cvn")), "c_id")
      .select(col("q_id"), col("c_id"),
        round(vecDot(col("qv"), col("cvn")), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("cos_sim"), asc("c_id"))))
      .filter(col("rnk") <= topK)
      .select("q_id", "rnk", "c_id", "cos_sim")
      .orderBy("q_id", "rnk")
  }

  /** SCD1 MERGE (upsert): fold a changes snapshot into a base snapshot,
    * changes winning per key — the warehouse MERGE INTO expressed as the
    * scale-correct union + left-anti pattern: each side shuffles ONCE on
    * the key (or broadcasts when the changes side is small), versus a
    * full-outer-join MERGE that shuffles both sides and then filters.
    * Same v1/v2 convention as [[corpusDiff]] (base = doc_id < 400,
    * changes = doc_id >= 100). */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    val base = docs.filter(col("doc_id") < 400)
    val changes = docs.filter(col("doc_id") >= 100)
    changes.withColumn("origin", lit("changes"))
      .unionByName(
        base.join(changes, Seq("doc_id"), "left_anti")
          .withColumn("origin", lit("base")))
      .orderBy("doc_id")
  }

  /** Corpus text normalization — the cleanup gate every web-scale corpus
    * runs before hashing/dedup (lowercase, collapse whitespace runs, trim):
    * emits the normalized-content hash + length so downstream exact dedup
    * keys on canonical bytes. Row-local codegen'd string expressions — a
    * map-only scan at any corpus size; the profile agg is one partial-agg
    * shuffle over |langs| rows. */
  def textNormalize(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("norm",
        trim(regexp_replace(lower(col("text")), "\\s+", " ")))
      .select(col("doc_id"), md5(col("norm")).as("norm_hash"),
        length(col("norm")).as("n_chars_norm"),
        (length(col("text")) - length(col("norm"))).as("chars_removed"))
      .orderBy("doc_id")

  /** Product quantization (PQ) — the memory side of billion-scale ANN
    * (IVF-PQ): each vector is split into `m` subspaces and every subspace
    * is encoded as its nearest codeword id, compressing a 64-double vector
    * to `m` small ints. Output: per-vector code + total reconstruction
    * error (the quantity a PQ codebook is trained to minimize; ADC search
    * ranks by exactly these subspace distances).
    *
    * Scale design: the codebooks (m × k subvectors) are driver-side
    * literals like the k-means centroids — encoding is ROW-LOCAL (one
    * argmin expression per subspace per row, no shuffle, no join), so the
    * encode pass is a map-only scan at any corpus size. Codebook size is
    * FIXED (first k vectors), independent of SF — at 100 TB you'd train
    * it on a driver-collected sample exactly like this. Ties break on
    * (round(d2, 6), codeword id), the same cross-engine-stable rule as
    * k-means. */
  def embedPq(s: SparkSession, dir: String, m: Int = 4, k: Int = 8): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dim = 64
    val sub = dim / m
    // codebook: subvectors of the first k vectors (deterministic, SF-stable)
    val cb: Map[Int, Seq[(Long, Array[Double])]] = e.filter(col("vec_id") < k)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
      .flatMap { case (id, v) =>
        (0 until m).map(j => j -> (id, v.slice(j * sub, (j + 1) * sub)))
      }
      .groupBy(_._1).map { case (j, rows) => j -> rows.map(_._2).toSeq }
    val withBest = (0 until m).foldLeft(e) { (df, j) =>
      val cbArr = array(cb(j).map { case (cid, cv) =>
        struct(lit(cid).as("cid"),
          array(cv.map(lit(_)): _*).as("cv"),
          lit(cv.foldLeft(0.0)((a, x) => a + x * x)).as("c2"))
      }: _*)
      val sv = slice(col("v"), j * sub + 1, sub)
      def d2(c: org.apache.spark.sql.Column) =
        vecDot(sv, sv) + c("c2") - lit(2.0) * vecDot(sv, c("cv"))
      df.withColumn(s"best$j", array_min(transform(cbArr, c =>
        struct(round(d2(c), 6).as("rd2"), c("cid").as("cid"), d2(c).as("d2")))))
    }
    withBest.select(
      col("vec_id") +:
        (0 until m).map(j => col(s"best$j.cid").as(s"c$j")) :+
        round((0 until m).map(j => col(s"best$j.d2")).reduce(_ + _), 4)
          .as("err"): _*)
      .orderBy("vec_id")
  }

  /** PQ with TRAINED per-subspace codebooks — [[embedPq]]'s raw
    * first-k-subvector codewords replaced by a deterministic 2-round
    * Lloyd fit in EACH subspace (the same [[lloydFit]] the trained IVF
    * uses, over the sliced vectors), which is how production PQ is
    * actually trained (FAISS `ProductQuantizer::train` = per-subspace
    * k-means). Codebooks stay O(m·k·sub) driver/literal state; training
    * is m independent narrow aggregations; encoding is the same row-local
    * literal-argmin. The spec asserts the trained codebook strictly
    * reduces mean quantization error vs the raw seeds. */
  def embedPqTrained(s: SparkSession, dir: String,
                     m: Int = 4, k: Int = 8): DataFrame = {
    val dim = 64
    val sub = dim / m
    val base = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .cache()
    val subAssigns = (0 until m).map { j =>
      val ej = base.select(col("vec_id"),
          slice(col("v"), j * sub + 1, sub).as("v"))
        .withColumn("x2", vecDot(col("v"), col("v")))
        .cache() // read once per Lloyd round + final encode
      assignBest(ej, lloydFit(ej, k))
        .select(col("vec_id"), col("cid").as(s"c$j"), col("d2").as(s"d$j"))
    }
    subAssigns.reduce(_.join(_, "vec_id"))
      .select(col("vec_id") +:
        (0 until m).map(j => col(s"c$j")) :+
        round((0 until m).map(j => col(s"d$j")).reduce(_ + _), 4).as("err"): _*)
      .orderBy("vec_id")
  }

  /** Sequence packing: assign docs to fixed token-budget bins by their
    * starting offset in the corpus-order token stream — the deterministic
    * "pack documents into pretraining sequences" layout step. The global
    * running sum is plans.GlobalRank.withRunningSums (two-pass
    * range-partitioned prefix sums — partition-parallel, never the
    * single-task `Window.orderBy` cumsum). */
  def docPack(s: SparkSession, dir: String, budget: Int = 256): DataFrame =
    docPackOf(Tables.documents(s, dir), "doc_id", "text", budget)
      .groupBy("bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("bin_id")

  /** Per-doc token-budget bin assignment over ANY (id, text) frame —
    * global running token sums (two-pass range prefix sums) cut into
    * `budget`-sized bins in id order. Returns one row per doc:
    * (doc_id, n_tokens, cum, bin_id). */
  def docPackOf(docs: DataFrame, idCol: String, textCol: String,
                budget: Int): DataFrame = {
    val toks = docs
      .selectExpr(s"$idCol AS doc_id",
        s"size(split($textCol, ' ')) AS n_tokens")
    graft.plans.GlobalRank
      .withRunningSums(toks, Seq(col("doc_id")), Seq("n_tokens" -> "cum"))
      .withColumn("bin_id",
        ((col("cum") - col("n_tokens")) / budget).cast("long") + 1)
  }

  /** Sliding-window document CHUNKING — the context-window preparation
    * step (long doc → overlapping training windows), the complement of
    * `doc_pack` (short docs → packed bins): each doc's token stream is
    * cut into windows of `window` tokens advancing by `stride`
    * (overlap = window − stride keeps boundary context in two chunks,
    * the RAG/pretraining convention). Start positions are chosen so the
    * final window reaches the last token with no fully-redundant tail
    * chunk: i = 0 .. ⌈max(n−window,0)/stride⌉. Entirely row-local
    * (sequence + explode + slice — one generator, codegen'd, no
    * shuffle except the output sort), so it scales linearly with corpus
    * bytes at any SF. */
  def docChunk(s: SparkSession, dir: String): DataFrame =
    docChunkOf(Tables.documents(s, dir), "doc_id", "text",
      window = 32, stride = 24)

  /** The chunker over ANY (id, text) frame: one row per (doc, chunk)
    * with its start token, length, and content hash. */
  def docChunkOf(docs: DataFrame, idCol: String, textCol: String,
                 window: Int, stride: Int): DataFrame = {
    require(stride >= 1 && window >= stride,
      s"need window >= stride >= 1, got window=$window stride=$stride")
    docs
      .selectExpr(s"$idCol AS doc_id", s"split($textCol, ' ') AS toks")
      .withColumn("i", explode(expr(
        s"""sequence(0, CAST(ceil(greatest(size(toks) - $window, 0)
           |  / CAST($stride AS DOUBLE)) AS INT))""".stripMargin)))
      .selectExpr("doc_id",
        "CAST(i + 1 AS INT) AS chunk_id",
        s"CAST(i * $stride + 1 AS INT) AS start_tok",
        s"CAST(size(slice(toks, i * $stride + 1, $window)) AS INT) AS n_chunk_tokens",
        s"md5(array_join(slice(toks, i * $stride + 1, $window), ' ')) AS chunk_md5")
      .orderBy("doc_id", "chunk_id")
  }

  /** Quality gate over documents through the real text.TextQuality
    * operator: per-source pass/fail counts. */
  def qualityFilter(s: SparkSession, dir: String): DataFrame =
    graft.text.TextQuality.score(Tables.documents(s, dir), "text")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("keep").as("n_keep"),
        round(avg("stop_ratio"), 6).as("avg_stop_ratio"),
        round(avg("mean_tok_len"), 6).as("avg_tok_len"))
      .orderBy("source")

  /** Per-label embedding profile: count + mean L2 norm (vec_l2 native
    * expression — same left-to-right accumulation as the SQL `aggregate`). */
  def embedStats(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), vecL2(col("embedding")).as("nrm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg("nrm"), 4).as("avg_norm"))
      .orderBy("label")

  /** Embedding dimension-correlation diagnostics — the redundancy check a
    * vector pipeline runs before spending PQ codebooks or RP dimensions
    * on correlated axes: Pearson corr for every dimension pair, top-10 by
    * |corr|. ONE PASS: each vector folds its outer-product contributions
    * into an array-valued co-moment partial aggregate
    * ([[graft.functions.EmbedCorrMoments]] — n, Σxᵢ, Σxᵢ², upper-triangle
    * Σxᵢxⱼ; O(d²) mergeable state, a KB at d=64), so the corpus is never
    * multiplied into d(d−1)/2 cell rows per vector and the only shuffle
    * is the O(d²)-double partial-merge. The finished cells apply the
    * identical co-moment formula; corr is rounded BEFORE ranking so
    * sum-order ulps can't flip the reported set. */
  def embedCorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select("embedding").as[Seq[Float]]
      .select(new graft.functions.EmbedCorrMoments().toColumn)
      .selectExpr("inline(cells)") // typed select flattens CorrPairs
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        (col("corr") + lit(0.0)).as("corr"))
      .orderBy(abs(col("corr")).desc, col("i"), col("j"))
      .limit(10)
  }

  private val RpDim = 16

  /** Johnson-Lindenstrauss random projection (Achlioptas 2003: ±1 sign
    * matrix) from the native 64-dim embedding down to [[RpDim]] dims, with
    * the norm-concentration audit E[‖y‖²/‖x‖²] = 1 that makes JL usable as
    * the cheap front-end of LSH/ANN at scale. The "matrix" is never
    * materialized anywhere: sign(j,d) is a pure integer hash evaluated
    * inside a row-local codegen'd higher-order expression, so the projection
    * is a ZERO-shuffle map over the corpus — the exact shape you want in
    * front of a 100 TB embedding scan. Inner sums run strictly left-to-right
    * (SQL `aggregate`), so every per-vector ratio is bit-identical to the
    * oracle's `list_reduce` replay. */
  def embedRp(s: SparkSession, dir: String): DataFrame = {
    val dExpr = "zip_with(embedding, sequence(0, size(embedding) - 1), " +
      "(x, d) -> struct(cast(x AS DOUBLE) AS x, d AS d))"
    val sign = "(1 - 2 * (((cast(j AS BIGINT) * 1315423911 + " +
      "cast(e.d AS BIGINT) * 2654435761 + 97) % 2147483647) % 2))"
    Tables.embeddings(s, dir)
      .selectExpr("vec_id",
        s"""transform(sequence(0, ${RpDim - 1}), j ->
           |  aggregate($dExpr, cast(0.0 AS DOUBLE),
           |    (acc, e) -> acc + $sign * e.x)) AS y""".stripMargin,
        "aggregate(embedding, cast(0.0 AS DOUBLE), " +
          "(a, x) -> a + cast(x AS DOUBLE) * cast(x AS DOUBLE)) AS nx")
      .selectExpr(
        s"aggregate(y, cast(0.0 AS DOUBLE), (a, p) -> a + p * p) / $RpDim.0 / nx AS ratio")
      .agg(count(lit(1)).as("n"),
        round(avg("ratio"), 6).as("mean_ratio"),
        round(min("ratio"), 6).as("min_ratio"),
        round(max("ratio"), 6).as("max_ratio"))
  }

  // ----------------------------------------------------------- text analysis

  /** Token counting + quality scoring: whitespace tokens, BPE-ish regex
    * tokens, distinct ratio, mean token length, stopword ratio. Pure
    * row-local expressions — codegen'd, no shuffle except the final sort. */
  def textStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .selectExpr("doc_id", "split(text, ' ') AS toks", "text")
      .selectExpr(
        "doc_id",
        "size(toks) AS n_tokens",
        "size(array_distinct(toks)) AS n_uniq",
        "size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS n_bpe",
        """round(cast(aggregate(transform(toks, x -> length(x)), 0, (a, x) -> a + x) AS DOUBLE)
          |  / size(toks), 6) AS avg_tok_len""".stripMargin,
        """round(cast(size(filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'is', 'in', 'to'))) AS DOUBLE)
          |  / size(toks), 6) AS stop_ratio""".stripMargin)
      .orderBy("doc_id")

  /** BPE-style pre-tokenization counts: the GPT-2-family pretoken regex
    * (contraction suffixes | space-prefixed letter runs | digit runs |
    * punctuation runs | whitespace) — the unit a byte-pair tokenizer
    * would merge within. Per-doc pretoken count + content hash, plus the
    * whitespace-token count for comparison. Row-local regex → codegen,
    * no shuffle except the final sort. */
  /** Number of BPE merge-training iterations for [[bpeTrain]] — a model
    * hyperparameter (real vocabularies run tens of thousands; 5 keeps the
    * oracle's unrolled replay tractable while exercising the full loop). */
  private val BpeMerges = 5

  /** BPE VOCABULARY TRAINING (Sennrich et al., ACL'16): learn the first k
    * merge rules over the corpus vocabulary — the step that turns
    * [[tokenBpe]]'s pre-tokenizer into an actual trained tokenizer.
    *
    * Shape, per merge iteration:
    *  1. adjacent-symbol pair counts: one shuffle over
    *     O(|vocab| · avg word length) rows — the corpus itself is touched
    *     ONCE (word frequencies), everything after runs on the vocabulary
    *     table, which Heaps' law keeps sublinear in corpus size;
    *  2. the argmax pair comes to the driver (O(1) state per iteration,
    *     the same bounded-collect contract as the Lloyd codebooks);
    *  3. the merge itself is a row-local array fold (`aggregate`) —
    *     leftmost non-overlapping, provably equal to the sequential BPE
    *     merge pass because a merged token can never equal its own left
    *     constituent.
    * Per-iteration frames are checkpointed (graft.plans.lazy opt-out) so
    * the fold chain never re-executes. The oracle replays all k
    * iterations as unrolled CTEs with a `list_reduce` fold.
    * Ties are broken (count desc, lhs, rhs) — fully deterministic. */
  /** One leftmost-non-overlapping merge pass of pair (a, b) over a symbol
    * array — row-local, shared by training and application. */
  private def bpeMergeFold(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(try_element_at(acc, lit(-1)) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** The merge-learning loop shared by [[bpeTrain]] and [[bpeApply]]:
    * returns the k learned merges (driver state O(k)). */
  private def bpeFit(s: SparkSession, dir: String): Seq[(Int, String, String, Long)] = {
    val words = Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("word"), ""))
    var syms =
      if (graft.plans.Eager.enabled) words.localCheckpoint(true)
      else words.cache()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (k <- 1 to BpeMerges) {
      val pairs = syms.select(col("freq"),
          explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (x, y) => struct(x.as("a"), y.as("b")))).as("z"))
        .groupBy(col("z.a").as("a"), col("z.b").as("b"))
        .agg(sum("freq").as("n"))
      val top = pairs.orderBy(desc("n"), asc("a"), asc("b")).limit(1).collect()
      require(top.nonEmpty, s"bpeTrain: no adjacent pairs left at merge $k " +
        "— corpus vocabulary is single-character words")
      val (a, b) = (top(0).getString(0), top(0).getString(1))
      merges += ((k, a, b, top(0).getLong(2)))
      syms = syms.withColumn("syms", bpeMergeFold(col("syms"), a, b))
      if (graft.plans.Eager.enabled) syms = syms.localCheckpoint(true)
    }
    merges.toSeq
  }

  def bpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bpeFit(s, dir).toDF("step", "lhs", "rhs", "n").orderBy("step")
  }

  /** BPE TOKENIZATION with the learned merges — the apply half of the
    * train/apply lifecycle: per document, word/token/char accounting and
    * the fertility (tokens per word) + compression (chars per token)
    * ratios a tokenizer team watches per corpus slice.
    *
    * The merges are applied on the DISTINCT vocabulary (Heaps-bounded) as
    * k row-local folds; the corpus-sized frame only pays a broadcast-sized
    * join against that vocab table — at 100 TB the tokenization cost is
    * the scan, not the merge table. */
  def bpeApply(s: SparkSession, dir: String): DataFrame =
    bpeApplyWith(s, dir, bpeFit(s, dir).map(m => (m._2, m._3)))

  /** Tokenize with an explicit (ordered) merge list — shared by the
    * inline [[bpeApply]] and the artifact-loading [[bpeApplyPersisted]],
    * so "persisted path ≡ inline path" is equality of inputs, not of two
    * implementations. */
  private def bpeApplyWith(s: SparkSession, dir: String,
                           merges: Seq[(String, String)]): DataFrame = {
    val docWords = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
    var vocab = docWords.select("word").distinct()
      .withColumn("syms", split(col("word"), ""))
    merges.foreach { case (a, b) =>
      vocab = vocab.withColumn("syms", bpeMergeFold(col("syms"), a, b))
    }
    val tok = vocab.select(col("word"),
      size(col("syms")).cast("long").as("n_tok"),
      length(col("word")).cast("long").as("n_chr"))
    docWords.join(broadcast(tok), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_tok").as("n_tokens"),
        sum("n_chr").as("n_chars"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("n_words"), 6).as("fertility"),
        round(col("n_chars").cast("double") / col("n_tokens"), 6).as("chars_per_token"))
      .orderBy("doc_id")
  }

  private val bpeArtifactRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  /** Publish the trained BPE merge table as a versioned
    * [[graft.plans.SnapshotStore]] artifact (the [[ivfIndexPublish]]
    * pattern): training runs once per corpus signature, the merge list
    * commits atomically under `<root>/merges`, and serve-time tokenizers
    * load the committed version instead of re-deriving it — the artifact
    * lifecycle a tokenizer team needs (re-train publishes v2 while
    * running tokenization keeps reading v1; SnapshotStoreSpec covers the
    * atomicity, [[bpeApplyPersisted]] covers load ≡ inline). Returns the
    * artifact root. */
  def bpeTokenizerPublish(s: SparkSession, dir: String,
                          publishRoot: Option[String] = None): String = {
    import s.implicits._
    val confRoot = s.conf.getOption("spark.graft.tokenizer.root")
    val base = publishRoot.orElse(confRoot)
    val sig = documentsSignature(s, dir)
    bpeArtifactRoots.computeIfAbsent(s"$dir#$sig#${base.getOrElse("")}", _ => {
      val root = base.map(b => s"$b/bpe-$sig").getOrElse(
        java.nio.file.Files.createTempDirectory("graft-bpe-tokenizer").toString)
      val committed = // a committed artifact IS the training run
        graft.plans.SnapshotStore.latestVersion(s"$root/merges").isDefined
      if (!committed) {
        val merges = bpeFit(s, dir).toDF("step", "lhs", "rhs", "n")
        graft.plans.SnapshotStore.publish(merges, s"$root/merges", 1L)
      }
      root
    })
  }

  /** BPE tokenization FROM THE COMMITTED ARTIFACT — the serve-time half
    * of the publish/load lifecycle: the ordered merge list comes out of
    * the latest SnapshotStore version (O(k) driver rows, the same bounded
    * collect as training's argmax), then tokenizes through the SAME
    * [[bpeApplyWith]] fold as the inline path, so the output is
    * byte-identical to [[bpeApply]] by construction — which the driver
    * contract checks cross-engine (identical oracle SQL). */
  def bpeApplyPersisted(s: SparkSession, dir: String): DataFrame = {
    val root = bpeTokenizerPublish(s, dir)
    val merges = graft.plans.SnapshotStore
      .readLatest(s, s"$root/merges")
      .select(col("step"), col("lhs"), col("rhs"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
      .map(m => (m._2, m._3))
      .toSeq
    require(merges.nonEmpty, "bpeApplyPersisted: empty merge artifact")
    bpeApplyWith(s, dir, merges)
  }

  /** DuckDB twin of [[bpeTrain]]: the k merge iterations unrolled as
    * chained CTEs; the array fold rides `list_reduce` over a
    * unit-separator-encoded accumulator (symbols are [a-z]+ so chr(31)
    * can never collide). */
  /** The shared CTE chain (word frequencies + k unrolled merge
    * iterations) behind the bpe_train and bpe_apply oracles. */
  private def bpeChainSql: String = {
    val base =
      """w AS (
        |  SELECT word, count(*)::BIGINT AS freq FROM (
        |    SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  WHERE regexp_matches(word, '^[a-z]+$') GROUP BY word),
        | s0 AS (SELECT word, freq,
        |   list_transform(generate_series(1, length(word)), i -> word[i]) AS syms
        |  FROM w)""".stripMargin
    val steps = (1 to BpeMerges).map { k =>
      val p = s"s${k - 1}"
      s""" p$k AS (SELECT u[1] AS a, u[2] AS b, sum(freq)::BIGINT AS n
         |   FROM $p, unnest(list_zip(list_slice(syms, 1, len(syms)-1),
         |                            list_slice(syms, 2, len(syms)))) AS z(u)
         |   GROUP BY 1, 2),
         | t$k AS (SELECT a, b, n FROM p$k ORDER BY n DESC, a, b LIMIT 1),
         | s$k AS (SELECT word, freq,
         |   string_split(list_reduce(syms, (acc, x) -> CASE
         |     WHEN string_split(acc, chr(31))[-1] = t.a AND x = t.b THEN
         |       CASE WHEN strpos(acc, chr(31)) = 0 THEN t.a || t.b
         |            ELSE left(acc, length(acc) - length(t.a)) || t.a || t.b END
         |     ELSE acc || chr(31) || x END), chr(31)) AS syms
         |  FROM $p, t$k t)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$steps"
  }

  private def bpeTrainSql: String = {
    val tail = (1 to BpeMerges)
      .map(k => s"SELECT $k AS step, a AS lhs, b AS rhs, n FROM t$k")
      .mkString("\nUNION ALL\n")
    s"""WITH $bpeChainSql
       |SELECT * FROM (
       |$tail
       |) ORDER BY step""".stripMargin
  }

  private def bpeApplySql: String =
    s"""WITH $bpeChainSql,
       | dw AS (SELECT doc_id, word FROM (
       |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
       |    FROM documents)
       |  WHERE regexp_matches(word, '^[a-z]+$$'))
       |SELECT doc_id, count(*)::BIGINT AS n_words,
       |  sum(len(syms))::BIGINT AS n_tokens,
       |  round(sum(len(syms))::DOUBLE / count(*), 6) AS fertility,
       |  round(sum(length(word))::DOUBLE / sum(len(syms)), 6) AS chars_per_token
       |FROM dw JOIN s$BpeMerges USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Unigram-LM tokenizer EM iterations / final vocab size — model
    * hyperparameters (real runs use far more; these keep the oracle's
    * unrolled CTE replay tractable while exercising the full loop). */
  private val UnigramLmIters = 3
  private val UnigramLmTopK = 30

  /** One greedy maximal-munch segmentation pass: scan the char array
    * left-to-right, fusing the pending char with the next one whenever
    * the fused pair is in the CURRENT qualifying set. Row-local, shared
    * by every EM iteration and by apply. */
  private def greedyPairFold(syms: Column, ok: Column): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(length(try_element_at(acc, lit(-1))) === 1 &&
          array_contains(ok, concat(try_element_at(acc, lit(-1)), x)),
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(try_element_at(acc, lit(-1)), x))))
        .otherwise(concat(acc, array(x))))

  /** UNIGRAM-LM TOKENIZER TRAINING (Kudo, ACL'18 — the SentencePiece
    * algorithm family; BPE's sibling and the trainer most modern LLM
    * stacks actually use): fit a piece vocabulary by expectation-
    * maximization — segment the corpus under the current piece
    * distribution, re-estimate piece frequencies from the segmentation,
    * repeat — then prune to the target vocabulary.
    *
    * This implementation is the CROSS-ENGINE-EXACT form of hard
    * (Viterbi) EM: candidate pieces are capped at 2 chars and the E-step
    * segments greedily left-to-right, fusing a pair exactly when
    * c(ab)·N > c(a)·c(b) under the current counts — for a unigram LM
    * that inequality IS the Viterbi choice between emitting `ab` as one
    * piece vs two (p(ab) > p(a)·p(b)), evaluated in pure BIGINT
    * cross-multiplication, so every EM decision replays bit-identically
    * in the DuckDB oracle (the unrolled-CTE pattern shared with
    * `bpe_train`; a float log-likelihood would tie-break on ulps across
    * engines). At 100 TB counts the same test runs in the log domain
    * where ulp ties are statistically irrelevant.
    *
    * Scale shape, per EM iteration: the corpus is touched ONCE for word
    * frequencies (the same Heaps-bounded vocabulary trick as
    * [[bpeFit]]); segmentation is a row-local fold over the DISTINCT
    * words; counts are one shuffle over O(alphabet²) piece keys; the
    * qualifying set is an in-plan 1-row broadcast — ZERO driver-side
    * loop state, unlike BPE's per-merge argmax collect. */
  private def unigramLmFit(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val words = Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("word"), ""))
    val wordsP =
      if (graft.plans.Eager.enabled) words.localCheckpoint(true)
      else words.cache()
    // iteration-0 statistics: char unigrams + adjacent-pair candidates
    val c0 = wordsP.select(col("freq"), explode(col("syms")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("n"))
    val p0 = wordsP.select(col("freq"),
        explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => concat(x, y))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("n"))
    // the MLE likelihood-ratio test with N = total pieces in the model:
    // fuse ab iff c(ab)·N > c(a)·c(b) ⟺ p(ab) > p(a)·p(b)
    def qualify(cand: DataFrame, chars: DataFrame, all: DataFrame): DataFrame =
      cand
        .join(chars.select(col("piece").as("ca_p"), col("n").as("ca")),
          substring(col("piece"), 1, 1) === col("ca_p"), "left")
        .join(chars.select(col("piece").as("cb_p"), col("n").as("cb")),
          substring(col("piece"), 2, 1) === col("cb_p"), "left")
        .crossJoin(broadcast(all.agg(sum("n").as("tot"))))
        .filter(col("n") * col("tot") >
          coalesce(col("ca"), lit(0L)) * coalesce(col("cb"), lit(0L)))
        .agg(sort_array(collect_list(col("piece"))).as("ok_pieces"))
    var ok = qualify(p0, c0, c0) // seg0 = chars, so N0 = total chars
    var seg: DataFrame = null
    var counts: DataFrame = null
    for (t <- 1 to UnigramLmIters) {
      seg = wordsP.crossJoin(broadcast(ok))
        .withColumn("pieces", greedyPairFold(col("syms"), col("ok_pieces")))
        .select("word", "freq", "pieces")
      counts = seg.select(col("freq"), explode(col("pieces")).as("piece"))
        .groupBy("piece").agg(sum("freq").as("n"))
      counts =
        if (graft.plans.Eager.enabled) counts.localCheckpoint(true)
        else counts.cache()
      if (t < UnigramLmIters)
        // re-qualify the SURVIVING pairs against the new piece model;
        // single-char counts now exclude chars hidden inside pieces (the
        // unigram-LM view: pieces are opaque) — the vocab only prunes
        ok = qualify(counts.filter(length(col("piece")) === 2),
          counts.filter(length(col("piece")) === 1), counts)
    }
    (seg, counts)
  }

  /** The trained tokenizer's vocabulary: the [[UnigramLmTopK]] most
    * frequent pieces under the final EM segmentation. */
  def unigramLmTrain(s: SparkSession, dir: String): DataFrame = {
    val (_, counts) = unigramLmFit(s, dir)
    counts.orderBy(desc("n"), asc("piece")).limit(UnigramLmTopK)
      .select("piece", "n")
  }

  /** Tokenize the corpus with the trained unigram-LM pieces: per-doc
    * word/piece accounting with the fertility + compression ratios —
    * directly comparable to [[bpeApply]] on the same corpus (the
    * BPE-vs-unigram fertility comparison a tokenizer team runs before
    * picking one; LlmQualitySpec asserts the comparison). Same
    * broadcast-the-vocab shape as BPE apply: the corpus-sized frame pays
    * one broadcast join, the folds run on the Heaps-bounded vocab. */
  def unigramLmApply(s: SparkSession, dir: String): DataFrame =
    unigramLmApplyWith(s, dir, unigramLmFit(s, dir)._1)

  /** Tokenize with an explicit per-word segmentation table — shared by
    * the inline [[unigramLmApply]] and the artifact-loading
    * [[unigramLmApplyPersisted]] (same contract as [[bpeApplyWith]]). */
  private def unigramLmApplyWith(s: SparkSession, dir: String,
                                 seg: DataFrame): DataFrame = {
    val tok = seg.select(col("word"),
      size(col("pieces")).cast("long").as("n_p"),
      length(col("word")).cast("long").as("n_c"))
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .join(broadcast(tok), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_p").as("n_pieces"),
        sum("n_c").as("n_chars"))
      .select(col("doc_id"), col("n_words"), col("n_pieces"),
        round(col("n_pieces").cast("double") / col("n_words"), 6).as("fertility"),
        round(col("n_chars").cast("double") / col("n_pieces"), 6).as("chars_per_piece"))
      .orderBy("doc_id")
  }

  private val unigramArtifactRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  /** Publish the trained unigram-LM segmentation (word → pieces) as a
    * versioned SnapshotStore artifact — the [[bpeTokenizerPublish]]
    * lifecycle for the EM-trained tokenizer. */
  def unigramLmPublish(s: SparkSession, dir: String,
                       publishRoot: Option[String] = None): String = {
    val confRoot = s.conf.getOption("spark.graft.tokenizer.root")
    val base = publishRoot.orElse(confRoot)
    val sig = documentsSignature(s, dir)
    unigramArtifactRoots.computeIfAbsent(s"$dir#$sig#${base.getOrElse("")}",
      _ => {
        val root = base.map(b => s"$b/unigram-$sig").getOrElse(
          java.nio.file.Files
            .createTempDirectory("graft-unigram-tokenizer").toString)
        if (graft.plans.SnapshotStore.latestVersion(s"$root/pieces").isEmpty) {
          val seg = unigramLmFit(s, dir)._1.select("word", "pieces")
          graft.plans.SnapshotStore.publish(seg, s"$root/pieces", 1L)
        }
        root
      })
  }

  /** Unigram-LM tokenization from the committed artifact — byte-identical
    * to [[unigramLmApply]] through the shared [[unigramLmApplyWith]];
    * checked cross-engine against the same oracle. */
  def unigramLmApplyPersisted(s: SparkSession, dir: String): DataFrame = {
    val root = unigramLmPublish(s, dir)
    unigramLmApplyWith(s, dir,
      graft.plans.SnapshotStore.readLatest(s, s"$root/pieces"))
  }

  /** DuckDB twin of the unigram-LM EM chain: the iterations unrolled as
    * CTEs, the greedy fold as `list_reduce` over a unit-separator
    * accumulator (the bpe oracle's chr(31) encoding), and every
    * qualifying test in the same BIGINT cross-multiplication. */
  private def unigramLmChainSql: String = {
    val base =
      """w AS (
        |  SELECT word, count(*)::BIGINT AS freq FROM (
        |    SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  WHERE regexp_matches(word, '^[a-z]+$') GROUP BY word),
        | s0 AS (SELECT word, freq,
        |   list_transform(generate_series(1, length(word)), i -> word[i]) AS syms
        |  FROM w),
        | c0 AS (SELECT piece, sum(freq)::BIGINT AS n FROM (
        |     SELECT freq, unnest(syms) AS piece FROM s0) GROUP BY 1),
        | p0 AS (SELECT u[1] || u[2] AS piece, sum(freq)::BIGINT AS n
        |   FROM s0, unnest(list_zip(list_slice(syms, 1, len(syms)-1),
        |                            list_slice(syms, 2, len(syms)))) AS z(u)
        |   GROUP BY 1),
        | ok1 AS (SELECT list(p.piece ORDER BY p.piece) AS pieces
        |   FROM p0 p
        |   LEFT JOIN c0 ca ON ca.piece = substr(p.piece, 1, 1)
        |   LEFT JOIN c0 cb ON cb.piece = substr(p.piece, 2, 1),
        |     (SELECT sum(n)::BIGINT AS tot FROM c0) n0
        |   WHERE p.n * n0.tot > coalesce(ca.n, 0) * coalesce(cb.n, 0))""".stripMargin
    val steps = (1 to UnigramLmIters).map { t =>
      val okNext =
        if (t < UnigramLmIters)
          s""",
             | ok${t + 1} AS (SELECT list(p.piece ORDER BY p.piece) AS pieces
             |   FROM (SELECT * FROM c$t WHERE length(piece) = 2) p
             |   LEFT JOIN (SELECT * FROM c$t WHERE length(piece) = 1) ca
             |     ON ca.piece = substr(p.piece, 1, 1)
             |   LEFT JOIN (SELECT * FROM c$t WHERE length(piece) = 1) cb
             |     ON cb.piece = substr(p.piece, 2, 1),
             |     (SELECT sum(n)::BIGINT AS tot FROM c$t) n$t
             |   WHERE p.n * n$t.tot > coalesce(ca.n, 0) * coalesce(cb.n, 0))"""
            .stripMargin
        else ""
      s""" seg$t AS (SELECT word, freq, string_split(list_reduce(syms,
         |     (acc, x) -> CASE
         |       WHEN length(string_split(acc, chr(31))[-1]) = 1
         |        AND list_contains(ok.pieces,
         |              string_split(acc, chr(31))[-1] || x)
         |       THEN acc || x
         |       ELSE acc || chr(31) || x END), chr(31)) AS pieces
         |   FROM s0, ok$t ok),
         | c$t AS (SELECT piece, sum(freq)::BIGINT AS n FROM (
         |     SELECT freq, unnest(pieces) AS piece FROM seg$t) GROUP BY 1)"""
        .stripMargin + okNext
    }.mkString(",\n")
    s"$base,\n$steps"
  }

  private def unigramLmTrainSql: String =
    s"""WITH $unigramLmChainSql
       |SELECT piece, n FROM c$UnigramLmIters
       |ORDER BY n DESC, piece LIMIT $UnigramLmTopK""".stripMargin

  private def unigramLmApplySql: String =
    s"""WITH $unigramLmChainSql,
       | dw AS (SELECT doc_id, word FROM (
       |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
       |    FROM documents)
       |  WHERE regexp_matches(word, '^[a-z]+$$')),
       | wl AS (SELECT word, len(pieces)::BIGINT AS n_p,
       |     length(word)::BIGINT AS n_c FROM seg$UnigramLmIters)
       |SELECT doc_id, count(*)::BIGINT AS n_words,
       |  sum(n_p)::BIGINT AS n_pieces,
       |  round(sum(n_p)::DOUBLE / count(*), 6) AS fertility,
       |  round(sum(n_c)::DOUBLE / sum(n_p), 6) AS chars_per_piece
       |FROM dw JOIN wl USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def tokenBpe(s: SparkSession, dir: String): DataFrame = {
    val pat = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+|\\s+"
    Tables.documents(s, dir)
      .select(col("doc_id"),
        regexp_extract_all(lower(col("text")), lit(pat), lit(0)).as("bpe"),
        filter(split(col("text"), "\\s+"), t => length(t) > 0).as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_ws"),
        size(col("bpe")).cast("long").as("n_bpe"),
        md5(concat_ws("|", col("bpe"))).as("bpe_md5"))
      .orderBy("doc_id")
  }

  /** Language-ID by marker-token scoring (n-gram heuristic family):
    * count stopword hits per language, argmax with fixed tie order. */
  def langidMarkers(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id",
        "size(filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS s_en",
        "size(filter(toks, x -> x IN ('el', 'la', 'de', 'y', 'es'))) AS s_es",
        "size(filter(toks, x -> x IN ('der', 'die', 'das', 'und', 'ist'))) AS s_de",
        "size(filter(toks, x -> x IN ('le', 'un', 'et', 'est', 'les'))) AS s_fr")
      .selectExpr("doc_id", "s_en", "s_es", "s_de", "s_fr",
        """CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
          |     WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
          |     WHEN s_de >= s_fr THEN 'de'
          |     ELSE 'fr' END AS pred_lang""".stripMargin)
      .orderBy("doc_id")

  /** Document fingerprint: md5 over the 3 smallest shingle hashes (k-min
    * sketch — winnowing-style stable fingerprint). */
  def docFingerprint(s: SparkSession, dir: String): DataFrame =
    shingles(s, dir)
      .groupBy("doc_id")
      .agg(md5(concat_ws("", slice(array_sort(collect_list(md5(col("s")))), 1, 3)))
        .as("fingerprint"))
      .orderBy("doc_id")

  /** Winnowing fingerprint (TRUE rolling hash — functions.TextWinnow
    * native expression): 8-char-gram Rabin-Karp polynomial hash, window-4
    * minima, sorted distinct. Row-local, codegen'd, no shuffle except the
    * final sort; the oracle replays the identical polynomial with exact
    * modular power constants. */
  def docWinnow(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.textWinnow
    Tables.documents(s, dir)
      .select(col("doc_id"), textWinnow(col("text"), 8, 4).as("fp"))
      .select(col("doc_id"),
        size(col("fp")).cast("long").as("n_fp"),
        md5(concat_ws(",", transform(col("fp"), x => x.cast("string")))).as("fp_md5"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: for every corpus doc, the overlap of its
    * shingles with the held-out eval set's shingle universe (eval docs =
    * `doc_id % 97 == 0` — stand-in for a benchmark/test corpus). Reports
    * each corpus doc sharing at least one shingle with the eval set.
    *
    * Scale design: the eval side is a benchmark — tiny relative to a
    * 100 TB corpus — so its distinct-shingle set is the build side of a
    * broadcast-able semi-join (AQE picks broadcast under the threshold;
    * no hint so a pathological eval set degrades to shuffle, not OOM).
    * The corpus side streams through one hash aggregate keyed by doc_id.
    * The local cache of the shingle stream is test-scale convenience
    * only — the three consumers (eval set, sizes, hits) each prune to
    * different columns, so at 100 TB you drop the cache and let the
    * scan run twice rather than materialize corpus-scale shingles. */
  def decontamOverlap(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir).cache()
    val evalSh = sh.filter(col("doc_id") % 97 === 0).select("s").distinct()
    val corpus = sh.filter(col("doc_id") % 97 =!= 0)
    val sizes = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val hits = corpus.join(evalSh, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    hits.join(sizes, Seq("doc_id"))
      .select(col("doc_id"), col("n_sh"), col("n_overlap"),
        round(col("n_overlap") / col("n_sh"), 6).as("frac"))
      .orderBy("doc_id")
  }

  /** Decontamination overlap against an EXTERNAL eval frame — what the
    * `decontam` corpus step gates on: for every corpus doc, the fraction
    * of its shingles that appear anywhere in the eval set (docs with no
    * overlap report 0). The eval shingle set is distinct-projected before
    * the semi-join, so when it is benchmark-sized Spark broadcasts it and
    * the corpus streams partition-parallel; a corpus-sized eval set
    * degrades gracefully to a shuffled semi-join on the uniform shingle
    * key. */
  def decontamOverlapOf(corpus: DataFrame, evalDocs: DataFrame,
                        idCol: String, textCol: String): DataFrame = {
    val csh = shinglesOf(corpus.select(col(idCol), col(textCol)),
      idCol, textCol)
    val esh = shinglesOf(
      evalDocs.select(lit(0L).as("__eid"), col(textCol)), "__eid", textCol)
      .select("s").distinct()
    val sizes = csh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val hits = csh.join(esh, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    sizes.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n_overlap"), lit(0L)) / col("n_sh"), 6).as("frac"))
  }

  private val DecontamBloomBits  = 65536
  private val DecontamBloomPrime = 2147483647L
  private val DecontamBloomHashes: Seq[(Long, Long)] =
    Seq((2654435761L, 1013904223L), (22695477L, 12345L))

  /** Bloom-PREFILTERED decontamination — the GPT-3-style scale path for
    * [[decontamOverlap]]: the eval set's shingles fold into an m-bit Bloom
    * filter (a distinct partial aggregate, ≤ m rows, BROADCAST), corpus
    * shingles probe it row-locally, and only the bloom-positive candidates
    * reach the exact semi-join. A Bloom filter has zero false negatives,
    * so the prefilter is LOSSLESS — n_overlap/frac equal the exact op's
    * answer by construction — while the expensive eval join runs on the
    * candidate subset instead of the corpus. n_cand (candidates per doc,
    * false positives included) is reported so the prefilter's measured
    * selectivity is itself oracle-checked: the md5 shingle key and the
    * CMS-family integer bit hashes replay exactly in any engine.
    *
    * At 100 TB this is the decontam plan you ship: corpus shingles never
    * shuffle for the probe (broadcast bit set), and the exact verify's
    * shuffle carries only candidates — bounded by the eval set's true
    * overlap plus the m-controlled FP rate. */
  def decontamBloom(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
      .withColumn("k",
        conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long"))
      .cache()
    def bitCols(kc: org.apache.spark.sql.Column) = DecontamBloomHashes.map {
      case (a, b) =>
        (((lit(a) * (kc % DecontamBloomPrime)) % DecontamBloomPrime + lit(b))
          % DecontamBloomPrime) % DecontamBloomBits
    }
    val evalBits = sh.filter(col("doc_id") % 97 === 0)
      .select(explode(array(bitCols(col("k")): _*)).as("bit")).distinct()
    val corpus = sh.filter(col("doc_id") % 97 =!= 0)
    val sizes = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    // a shingle is a candidate iff EVERY one of its bits is set
    val cand = corpus
      .select(col("doc_id"), col("s"),
        explode(array(bitCols(col("k")): _*)).as("bit"))
      .join(broadcast(evalBits.withColumn("__in", lit(1))), Seq("bit"), "left")
      .groupBy("doc_id", "s")
      .agg((count(lit(1)) === sum(coalesce(col("__in"), lit(0)))).as("pos"))
      .filter(col("pos")).select("doc_id", "s")
    val nCand = cand.groupBy("doc_id").agg(count(lit(1)).as("n_cand"))
    val evalSh = sh.filter(col("doc_id") % 97 === 0).select("s").distinct()
    val hits = cand.join(evalSh, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    nCand.join(sizes, Seq("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"), col("n_cand"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n_overlap"), lit(0L)) / col("n_sh"), 6).as("frac"))
      .orderBy("doc_id")
  }

  /** Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
    * Language Models", §A1.1 repetition filters): per-doc duplicate-word
    * fraction, top-word fraction, top-bigram fraction, and a keep flag.
    *
    * Scale design: two explode → hash-aggregate chains keyed by
    * (doc_id, gram) then doc_id — partial aggregation map-side, keys
    * uniform in doc_id, no window, no skew. The bigram explode is
    * row-local (array transform), never a self-join. */
  def gopherRepetition(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(s, dir).selectExpr("doc_id", "split(text, ' ') AS toks")
    val wc = t.select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val ws = wc.groupBy("doc_id").agg(
      sum("c").as("n_words"),
      (sum("c") - count(lit(1))).as("n_dup"),
      max("c").as("top_w"))
    val bc = t.filter(size(col("toks")) >= 2)
      .selectExpr("doc_id",
        """explode(transform(sequence(0, size(toks) - 2),
          |  i -> concat_ws(' ', toks[i], toks[i+1]))) AS bg""".stripMargin)
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
    val bs = bc.groupBy("doc_id").agg(sum("c").as("n_bigrams"), max("c").as("top_b"))
    ws.join(bs, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"),
        round(col("n_dup") / col("n_words"), 6).as("dup_word_frac"),
        round(col("top_w") / col("n_words"), 6).as("top_word_frac"),
        round(col("top_b") / col("n_bigrams"), 6).as("top_bigram_frac"))
      .withColumn("keep",
        (col("top_word_frac") <= 0.125 && col("top_bigram_frac") <= 0.05)
          .cast("long"))
      .orderBy("doc_id")
  }

  /** Per-source unigram KL divergence from the corpus-wide distribution —
    * the language-drift diagnostic behind source weighting (DoReMi-style
    * mixing starts from exactly this signal): KL(source ‖ corpus) =
    * Σ_w p_s(w)·ln(p_s(w)/p_c(w)), large for sources whose vocabulary
    * usage departs from the mix. Two token hash-aggregates (per (source,
    * word) and per word) + one keyed join — partial aggregation crushes
    * the shuffle to O(vocab) at any corpus size. Both distributions share
    * the same support by construction (every source word is a corpus
    * word), so no smoothing term is needed; the result rounds at 6 dp. */
  def sourceKl(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val sw = toks.groupBy("source", "w").agg(count(lit(1)).as("c"))
    val cw = sw.groupBy("w").agg(sum("c").as("cc"))
    val tot = sw.agg(sum("c").as("n_total"))
    val st = sw.groupBy("source").agg(sum("c").as("n_src"),
      count(lit(1)).as("vocab"))
    sw.join(cw, "w")
      .join(broadcast(st), "source")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_src"), col("vocab"),
        ((col("c") / col("n_src")) *
          log((col("c") / col("n_src")) / (col("cc") / col("n_total"))))
          .as("term"))
      .groupBy("source", "n_src", "vocab")
      .agg(round(sum("term"), 6).as("kl"))
      .orderBy("source")
  }

  /** Corpus novelty curve — how much genuinely NEW content each slice of
    * the ingest order contributes: a doc's novelty is the fraction of its
    * shingles whose FIRST occurrence (min doc_id) is this doc, and the
    * report is the per-decile (exact NTILE over doc_id) average. A
    * healthy growing corpus holds a high floor; a curve collapsing toward
    * 0 says later ingests are recombinations of earlier content — the
    * ordering/memorization diagnostic run before training-order decisions.
    *
    * Scale shape: one groupBy on the uniform shingle key (min doc_id — the
    * same shuffle exact dedup runs), a keyed join back, the exact global
    * NTILE from the two-pass rank machinery, and a final partial
    * aggregate. Integer counts everywhere; only the final fractions
    * divide, rounded at 6 dp. */
  def noveltyCurve(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir).cache()
    val first = sh.groupBy("s").agg(min("doc_id").as("first_doc"))
    val perDoc = sh.join(first, "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum((col("doc_id") === col("first_doc")).cast("long")).as("n_new"))
    val (tiered, tieredP) = graft.plans.GlobalRank.withNtilePersisted(
      perDoc, Seq(col("doc_id")), 10, "decile")
    graft.plans.Eager.checkpoint(
      tiered.groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_sh").as("n_shingles"),
          sum("n_new").as("n_first_seen"),
          round(sum("n_new") / sum("n_sh").cast("double"), 6)
            .as("novelty_frac"))
        .orderBy("decile")) { tieredP.unpersist() }
  }

  /** Inter-rater agreement of two independent quality gates — Cohen's κ
    * between the Gopher repetition filter and the heuristic TextQuality
    * gate, the number a training-data pipeline uses to decide whether two
    * filters are redundant (κ → 1), complementary (κ ≈ 0), or fighting
    * (κ < 0). κ = (p_o − p_e)/(1 − p_e) from the 2×2 agreement counts —
    * all integers off one doc-keyed join of the two per-doc keep flags,
    * so the statistic is engine-exact. */
  def labelAgreement(s: SparkSession, dir: String): DataFrame = {
    val a = gopherRepetition(s, dir).select(col("doc_id"),
      col("keep").cast("int").as("ka"))
    val b = graft.text.TextQuality.score(Tables.documents(s, dir), "text")
      .select(col("doc_id"), col("keep").as("kb"))
    val cells = a.join(b, "doc_id")
      .agg(count(lit(1)).as("n"),
        sum((col("ka") === 1 && col("kb") === 1).cast("long")).as("n11"),
        sum((col("ka") === 1 && col("kb") === 0).cast("long")).as("n10"),
        sum((col("ka") === 0 && col("kb") === 1).cast("long")).as("n01"),
        sum((col("ka") === 0 && col("kb") === 0).cast("long")).as("n00"))
    val po = (col("n11") + col("n00")).cast("double") / col("n")
    val pe = ((col("n11") + col("n10")) * (col("n11") + col("n01")) +
      (col("n01") + col("n00")) * (col("n10") + col("n00"))).cast("double") /
      (col("n") * col("n"))
    cells.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      round(po, 6).as("p_observed"),
      // + 0.0: normalize a rounded -0.0 to +0.0 (sign-crossing statistic;
      // Spark and DuckDB disagree on the zero's sign otherwise)
      (round((po - pe) / (lit(1.0) - pe), 6) + lit(0.0)).as("kappa"))
  }

  /** Incremental dedup — the daily-ingest pattern: dedup a NEW batch of
    * documents against the already-ingested corpus without rescanning it
    * into a full groupBy. Batch-internal dedup (min doc_id per hash) plus
    * a left-anti join against the base corpus's hash set. At 100 TB the
    * anti-join shuffles on the uniform 128-bit hash (no skew); the base
    * side is the corpus's stored hash column, not its text. Here the
    * "base" is doc_id < 250 and the "batch" doc_id >= 250 — a split of the
    * one documents table so the oracle sees identical data. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val hashed = Tables.documents(s, dir)
      .withColumn("text_hash", md5(lower(trim(col("text")))))
    val base = hashed.filter(col("doc_id") < 250).select("text_hash").distinct()
    hashed.filter(col("doc_id") >= 250)
      .join(base, Seq("text_hash"), "left_anti")
      .groupBy("text_hash")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies", "text_hash")
      .orderBy("keep_id")
  }

  /** Per-group top-k through the skew-safe two-phase operator
    * (plans.GroupTopK): the 3 longest documents per source. The salted
    * first phase bounds any single task's sort even when one source holds
    * a disproportionate share of the corpus. */
  def topkPerSource(s: SparkSession, dir: String): DataFrame =
    graft.plans.GroupTopK.topK(
        Tables.documents(s, dir).select("source", "doc_id", "n_chars"),
        Seq(col("source")),
        Seq(col("n_chars").desc, col("doc_id").asc), k = 3)
      .select("source", "rank", "doc_id", "n_chars")
      .orderBy("source", "rank")

  /** Deterministic source-mix downsampling — the pretraining "mixture
    * weights" op: each source is sampled toward a target quota
    * (rate = quota / |source|) using the same md5-derived uniform the
    * conditional split uses (SourceReader.deriveColumns), so membership is
    * a pure function of doc_id: reproducible on any cluster, no RNG state,
    * and re-runs on a grown corpus keep previously selected docs' fate
    * stable. Per-source counts are a small broadcast; the filter is
    * row-local. */
  def sourceMixSample(s: SparkSession, dir: String, quota: Double = 10.0): DataFrame = {
    val docs = Tables.documents(s, dir)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
    val rv = graft.functions.GraftFunctions.md5CoinPct(col("doc_id"))
    docs.join(broadcast(counts), "source")
      .filter(rv < lit(100.0) * lit(quota) / col("n_src"))
      .select("source", "doc_id")
      .orderBy("source", "doc_id")
  }

  /** Temperature-flattened source mixing (α-sampling — the multilingual /
    * multi-source mixing rule of XLM-R and mC4): source s is sampled with
    * probability ∝ n_s^α, which at α<1 upweights rare sources relative to
    * proportional sampling. Materialized as a per-doc deterministic
    * Bernoulli keep (same md5-of-id fraction as [[sourceMixSample]] — no
    * RNG state, re-runnable on any cluster) with per-source keep
    * probability min(1, budget·n_s^(α−1) / Σ n_t^α) — expected total =
    * budget — rounded to 6 dp so both engines compare against the
    * identical literal. Per-source counts are
    * an O(|sources|) broadcast; the keep filter is row-local; the summary
    * is one hash agg. */
  def sourceTemperatureMix(s: SparkSession, dir: String, alpha: Double = 0.5,
                           budget: Int = 200): DataFrame = {
    val docs = Tables.documents(s, dir)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
    val tot = counts.agg(sum(pow(col("n_src"), alpha)).as("tot"))
    val probs = counts.crossJoin(broadcast(tot))
      .withColumn("keep_p", round(least(lit(1.0),
        lit(budget.toDouble) * pow(col("n_src"), alpha - 1) / col("tot")), 6))
      .select("source", "n_src", "keep_p")
    val u = graft.functions.GraftFunctions.md5Coin(col("doc_id"))
    docs.join(broadcast(probs), "source")
      .filter(u < col("keep_p"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        max("n_src").as("n_src"), max("keep_p").as("keep_p"))
      .orderBy("source")
  }

  /** TOKEN-budget temperature mixing — [[sourceTemperatureMix]] with the
    * budget and shares measured in TOKENS, which is what training actually
    * consumes: source s with T_s tokens gets an α-flattened token quota
    * B·T_s^α/Σ T_t^α, i.e. per-doc keep probability
    * min(1, B·T_s^(α−1)/Σ T_t^α) (docs within a source share its token
    * distribution, so thinning docs uniformly thins tokens uniformly).
    * Same scale shape: one per-source agg (O(|sources|) broadcast), a
    * row-local deterministic coin, one summary agg. */
  def sourceTokenMix(s: SparkSession, dir: String, alpha: Double = 0.5,
                     budgetTokens: Long = 5000): DataFrame = {
    val docs = Tables.documents(s, dir)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
    val counts = docs.groupBy("source").agg(sum("n_tok").as("tok_src"))
    val tot = counts.agg(sum(pow(col("tok_src"), alpha)).as("tot"))
    val probs = counts.crossJoin(broadcast(tot))
      .withColumn("keep_p", round(least(lit(1.0),
        lit(budgetTokens.toDouble) * pow(col("tok_src"), alpha - 1) / col("tot")), 6))
      .select("source", "tok_src", "keep_p")
    val u = graft.functions.GraftFunctions.md5Coin(col("doc_id"))
    docs.join(broadcast(probs), "source")
      .filter(u < col("keep_p"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("n_tok").as("kept_tokens"),
        max("tok_src").as("tok_src"), max("keep_p").as("keep_p"))
      .orderBy("source")
  }

  /** Corpus-level duplicated-span profile (C4/CCNet-style line dedup,
    * adapted to span windows since the corpus has no line breaks): every
    * positional `w`-word window is hashed across the WHOLE corpus; a
    * window is "duplicated" when any other document contains the same
    * window. Output per doc: window count, duplicated-window count, and
    * the duplicated fraction — the signal used to drop boilerplate spans
    * or whole near-copied docs. Two shuffles at any scale: distinct
    * (doc, window) pairs → window-keyed doc-frequency agg → join back on
    * the window key (uniform md5-sized keys, no skew). */
  def dupSegments(s: SparkSession, dir: String, w: Int = 8): DataFrame =
    dupSegmentsOf(Tables.documents(s, dir), "doc_id", "text", w)
      .orderBy("doc_id")

  /** The duplicated-span profile over ANY (id, text) frame — what
    * [[graft.CorpusRunner]]'s `span_dedup` step gates on. */
  def dupSegmentsOf(docs: DataFrame, idCol: String, textCol: String,
                    w: Int): DataFrame = {
    val segs = docs
      .selectExpr(s"$idCol AS doc_id", s"split($textCol, ' ') AS toks")
      .selectExpr("doc_id",
        s"""explode(CASE WHEN size(toks) >= $w
           |  THEN transform(sequence(0, size(toks) - $w),
           |                 i -> concat_ws(' ', slice(toks, i + 1, $w)))
           |  ELSE array(concat_ws(' ', toks)) END) AS seg""".stripMargin)
      .cache() // feeds both the df-count and the join back
    val segDf = segs.distinct().groupBy("seg").agg(count(lit(1)).as("ndocs"))
    segs.join(segDf, "seg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_segs"), 6))
  }

  /** Duplicated-span REMOVAL — the C4 line-dedup made positional (the
    * corpus has no line breaks): docs are cut into consecutive `w`-token
    * blocks, every block text that occurs more than once in the WHOLE
    * corpus keeps only its first occurrence (smallest (doc_id, idx)), and
    * each document is rebuilt from its surviving blocks in order. Unlike
    * `span_dedup` (which drops whole docs over a fraction), this rewrites
    * documents — the actual C4 behavior.
    *
    * Scale design: one groupBy on the uniform block-text hash finds the
    * global first occurrence, one join back marks survivors, and the
    * rebuild is a doc-keyed collect bounded by the document's own length
    * — the same two-shuffle shape as exact dedup, never a pair join. */
  def spanScrub(s: SparkSession, dir: String): DataFrame =
    spanScrubOf(Tables.documents(s, dir), "doc_id", "text", 8)
      .select("doc_id", "n_blocks", "n_kept", "n_tokens_after", "text_md5")
      .orderBy("doc_id")

  /** The block-grain scrub over ANY (id, text) frame — returns per doc
    * the block accounting, the rebuilt text, and its md5 (what the
    * `span_scrub` corpus step rewrites with).
    *
    * First occurrence is selected with `min(struct(doc_id, block_idx))`
    * — lexicographic struct ordering, valid for ANY id range and block
    * count (an earlier doc_id·10⁶+idx BIGINT packing silently collided
    * past 10⁶ blocks or ~9.2·10¹² ids; struct min has no bounds to
    * guard). */
  def spanScrubOf(docs: DataFrame, idCol: String, textCol: String,
                  w: Int): DataFrame = {
    val blocks = docs
      .selectExpr(s"$idCol AS doc_id", s"split($textCol, ' ') AS toks")
      .selectExpr("doc_id",
        s"explode(sequence(0, cast(ceil(size(toks) / ${w}.0) AS INT) - 1)) AS k",
        "toks")
      .selectExpr("doc_id", "k",
        s"concat_ws(' ', slice(toks, k * $w + 1, $w)) AS block")
      .cache() // totals + first-occurrence agg + survivor join
    val first = blocks.groupBy("block")
      .agg(min(struct(col("doc_id"), col("k"))).as("first_key"))
    val kept = blocks.join(first, "block")
      .filter(struct(col("doc_id"), col("k")) === col("first_key"))
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      sum(size(split(col("block"), " "))).cast("long").as("n_tokens_after"),
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("k"), col("block")))),
        x => x.getField("block"))).as("rebuilt"))
    val totals = blocks.groupBy("doc_id").agg(count(lit(1)).as("n_blocks"))
    totals.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_tokens_after"), lit(0L)).as("n_tokens_after"),
        coalesce(col("rebuilt"), lit("")).as("rebuilt"),
        md5(coalesce(col("rebuilt"), lit(""))).as("text_md5"))
  }

  /** Per-source corpus report card — the one-screen health table a data
    * curator reads before mixing sources: doc/token volume plus the mean
    * row-local quality signals ([[graft.text.TextQuality]] features) and
    * the heuristic keep rate, per source. Every signal is a codegen'd
    * row-local expression, so the whole report is ONE map-side-combining
    * agg over the corpus scan — the cheapest possible full-corpus pass. */
  def sourceReport(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("mean_len",
        expr("aggregate(transform(toks, x -> length(x)), 0, (a, x) -> a + x)")
          .cast("double") / col("n_tok"))
      .withColumn("stop_ratio",
        expr("size(filter(toks, t -> t IN ('the','a','of','and','is','in','to')))")
          .cast("double") / col("n_tok"))
      .withColumn("sym_ratio",
        (length(col("text")) -
          length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", "")))
          .cast("double") / length(col("text")))
      .withColumn("keep", graft.text.TextQuality.keep("text").cast("int"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        round(avg("mean_len"), 6).as("avg_tok_len"),
        round(avg("stop_ratio"), 6).as("avg_stop_ratio"),
        round(avg("sym_ratio"), 6).as("avg_sym_ratio"),
        round(avg("keep"), 6).as("keep_rate"),
        countDistinct("lang").as("n_langs"))
      .orderBy("source")

  /** Heaps'-law vocabulary-growth profile: per source, vocabulary size V
    * vs token count N. Natural text follows V ≈ K·N^β with β ≈ 0.4–0.6;
    * a template-heavy or machine-generated slice bends the exponent, so
    * the cross-source OLS of ln V on ln N — (β, ln K, R²) — is the
    * corpus-health number that catches vocabulary collapse (over-eager
    * dedup/scrub) or explosion (encoding junk) the way [[vocabZipf]]
    * catches frequency-shape damage. One token-keyed agg per source
    * (map-side combinable, uniform keys), then an O(|sources|) moment
    * fold — nothing driver-side. */
  def vocabHeaps(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(s, dir)
      .selectExpr("source", "explode(split(text, ' ')) AS w")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), countDistinct("w").as("n_vocab"))
    val x = log(col("n_tokens").cast("double"))
    val y = log(col("n_vocab").cast("double"))
    val m = per.agg(count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
      sum(x * x).as("sxx"), sum(y * y).as("syy"))
    val cov = m("n") * m("sxy") - m("sx") * m("sy")
    val varX = m("n") * m("sxx") - m("sx") * m("sx")
    val varY = m("n") * m("syy") - m("sy") * m("sy")
    val beta = cov / varX
    m.select(col("n").as("n_sources"),
      (round(beta, 4) + lit(0.0)).as("heaps_beta"),
      (round((m("sy") - beta * m("sx")) / m("n"), 4) + lit(0.0))
        .as("heaps_lnk"),
      round(cov * cov / (varX * varY), 4).as("heaps_r2"))
  }

  /** Per-label embedding outliers — mislabeled / corrupt-vector detection
    * for embedding-curation pipelines: every vector's L2 distance to its
    * OWN label's centroid, top-3 farthest per label. Centroids are one
    * position-keyed agg (O(labels·dim) — a broadcast at any corpus size),
    * the distance is row-local, and the ranking window partitions on the
    * label. The flagged vectors are what a curation pass re-labels or
    * drops before contrastive training. */
  def embedOutliers(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .selectExpr("vec_id", "label",
        "transform(embedding, x -> cast(x AS double)) AS v")
    val cent = e.select(col("label"), posexplode(col("v")))
      .groupBy("label", "pos").agg(avg("col").as("ci"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, ci))), s -> s.ci)")
        .as("cv"))
    val d = e.join(broadcast(cent), "label")
      .withColumn("dist", round(sqrt(expr(
        "aggregate(zip_with(v, cv, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x)")), 4))
    d.withColumn("rnk", row_number().over(
        Window.partitionBy("label").orderBy(desc("dist"), asc("vec_id"))))
      .filter(col("rnk") <= 3)
      .select("label", "rnk", "vec_id", "dist")
      .orderBy("label", "rnk")
  }

  /** DSIR-style importance weights (Xie et al., NeurIPS'23 "Data Selection
    * for Language Models via Importance Resampling"): score every document
    * by the log-likelihood ratio of a target unigram LM (here: the `en`
    * slice) vs the rest-of-corpus LM, with add-one smoothing over the
    * joint vocabulary. High-weight docs "look like" the target domain and
    * get resampled into the training mix. One token-keyed agg builds both
    * LMs in a single pass, one scalar-row cross join carries the totals,
    * and the per-doc score is a token-keyed join + sum — every shuffle is
    * keyed on the token (vocab-sized, uniform); nothing is collected. */
  def dsirWeights(s: SparkSession, dir: String): DataFrame =
    dsirWeightsOf(Tables.documents(s, dir), "doc_id", "text",
      col("lang") === "en")
      .orderBy("doc_id")

  /** DSIR weights over ANY (id, text) frame with a caller-chosen target
    * indicator — what [[graft.CorpusRunner]]'s `dsir_sample` step gates
    * on. `isTarget` must be a row-local predicate over the frame. */
  def dsirWeightsOf(docs: DataFrame, idCol: String, textCol: String,
                    isTarget: org.apache.spark.sql.Column): DataFrame = {
    val toks = docs
      .withColumn("__t", isTarget)
      .selectExpr(s"$idCol AS doc_id", "__t",
        s"explode(split($textCol, ' ')) AS w")
      .cache() // feeds both the LM build and the scoring join
    val counts = toks.groupBy("w").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("cc"))
    val tot = counts.agg(sum("ct").as("nt"), sum("cc").as("nc"),
      count(lit(1)).as("vsz"))
    val wts = counts.crossJoin(broadcast(tot))
      .select(col("w"),
        (log((col("ct") + 1).cast("double") / (col("nt") + col("vsz"))) -
         log((col("cc") + 1).cast("double") / (col("nc") + col("vsz")))).as("lw"))
    toks.join(wts, "w")
      .groupBy("doc_id")
      .agg(round(sum("lw"), 6).as("dsir_w"), count(lit(1)).as("n_toks"))
  }

  /** SemDeDup (Abbas et al. 2023): semantic dedup that only compares
    * embeddings WITHIN a k-means cluster — the clustering bounds the
    * pairwise work to Σ|cluster|², the published trick that makes
    * embedding-dedup feasible at corpus scale (vs the corpus-wide
    * all-pairs join). Reuses the deterministic Lloyd assignment
    * ([[embedKmeans]]); a vector is pruned when a lower-id vector in the
    * same cluster has cosine ≥ τ. The pair join shuffles on the cluster
    * id, and clusters above `maxCluster` members are split by a
    * deterministic secondary key (vec_id mod ⌈n/maxCluster⌉ — replayable
    * in the oracle), so the per-group pair fan-out is bounded by
    * ~maxCluster² regardless of how lopsided the clustering comes out —
    * the [[neardupCapped]] treatment applied to embedding space.
    *
    * Split-key trade, made deliberately: an id-modulo split yields a HARD
    * size bound (asserted by the spec) but can sever a near-dup pair
    * across sub-groups (bounded recall loss that shrinks as maxCluster
    * grows); an LSH-signature split (`vecSig mod g`) would co-locate
    * similar vectors and preserve pairs, but identical-vector pile-ups
    * share one signature, so the size bound — the thing the cap exists
    * for — would be lost. At 100 TB prefer the guarantee. */
  def semDedup(s: SparkSession, dir: String, tau: Double = 0.3,
               maxCluster: Int = 40): DataFrame = {
    val e = semDedupKeyed(s, dir, maxCluster)
      .cache() // both sides of the within-group pair join
    e.select(col("cid"), col("sub"), col("vec_id").as("da"), col("vn").as("va"))
      .join(e.select(col("cid"), col("sub"), col("vec_id").as("db"),
        col("vn").as("vb")), Seq("cid", "sub"))
      .filter(col("da") < col("db"))
      .withColumn("cos_sim", round(vecDot(col("va"), col("vb")), 4))
      .filter(col("cos_sim") >= tau)
      .groupBy(col("db").as("pruned_id"))
      .agg(min("da").as("keeper_id"), max("cos_sim").as("max_cos"))
      .orderBy("pruned_id")
  }

  /** [[semDedup]]'s pair-join key: (cluster, sub-split) per vector, where
    * `sub` partitions clusters above `maxCluster` members into
    * ⌈n/maxCluster⌉ modulo groups. The cluster-size frame is O(k) rows →
    * broadcast join; everything else is the id-keyed joins the assignment
    * already does. */
  private def semDedupKeyed(s: SparkSession, dir: String,
                            maxCluster: Int): DataFrame = {
    val cid = kmeansAssign(s, dir).select("vec_id", "cid")
    val sizes = cid.groupBy("cid").agg(count(lit(1)).as("__n"))
    val nGroups = ceil(col("__n") / lit(maxCluster.toDouble)).cast("long")
    Tables.embeddings(s, dir)
      .select(col("vec_id"), vecNorm(col("embedding")).as("vn"))
      .join(cid, "vec_id")
      .join(broadcast(sizes), "cid")
      .withColumn("sub", when(col("__n") <= maxCluster, lit(0L))
        .otherwise(pmod(col("vec_id"), nGroups)))
      .drop("__n")
  }

  /** Audit view of [[semDedup]]'s pair-join groups: (cid, sub, members).
    * The spec asserts every group stays near `maxCluster`, bounding the
    * within-group quadratic term at any corpus size. */
  def semDedupGroups(s: SparkSession, dir: String,
                     maxCluster: Int = 40): DataFrame =
    semDedupKeyed(s, dir, maxCluster)
      .groupBy("cid", "sub").agg(count(lit(1)).as("n_members"))

  /** Corpus snapshot diff — the ingestion-ops accounting between two
    * corpus versions: per-status doc counts (added / removed / unchanged
    * by content hash) from ONE full outer join on the unique id. Both
    * "versions" are deterministic slices of the one documents table so
    * the oracle replays identical data. At 100 TB this is the id-keyed
    * shuffle join both sides already store sorted/bucketed for. */
  def corpusDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    corpusDiffOf(docs.filter(col("doc_id") < 400),
      docs.filter(col("doc_id") >= 100), "doc_id")
  }

  /** The version-accounting diff over ANY two (id, text) frames — what
    * [[graft.plans.SnapshotStore]] readers run between committed corpus
    * versions. One id-keyed full outer join, O(|a| + |b|). */
  def corpusDiffOf(a: DataFrame, b: DataFrame, idCol: String,
                   textCol: String = "text"): DataFrame = {
    val v1 = a.select(col(idCol).as("doc_id"), md5(col(textCol)).as("h1"))
    val v2 = b.select(col(idCol).as("doc_id"), md5(col(textCol)).as("h2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h1").isNull, lit("added"))
          .when(col("h2").isNull, lit("removed"))
          .when(col("h1") =!= col("h2"), lit("changed"))
          .otherwise(lit("unchanged")))
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("status")
  }

  /** CCNet-style perplexity scoring under a unigram LM fit on the corpus
    * itself (add-one smoothed): ppl(doc) = exp(−mean log p(w)). CCNet
    * buckets a crawl into head/middle/tail quality tiers by LM perplexity;
    * the unigram LM keeps the operator closed over the corpus (no external
    * model file) while exercising the identical dataflow — token-keyed LM
    * build, one scalar-total broadcast, token-keyed score join. Swap the
    * `lp` table for an external n-gram LM's scores to get the full CCNet
    * pipeline. */
  def unigramPpl(s: SparkSession, dir: String): DataFrame =
    unigramPplFrameOf(s, dir).orderBy("doc_id")

  // The unigram→bigram→trigram→4-gram perplexity ladder (and
  // quality_tiers, which ranks on unigram ppl) all start from the SAME
  // tokenized corpus — five queries re-reading the parquet and
  // re-splitting every document is pure waste. Shared per-(session, dir)
  // builds via [[graft.plans.SessionCache]] (the co-purchase-family
  // pattern): the hashed (doc_id, toks) array frame feeds every n-gram
  // explode, and the unigram ppl frame is itself shared with
  // quality_tiers.
  //
  // Tokens are HASHED to 64-bit inside the row-local split (xxhash64) —
  // the KenLM representation (Heafield 2011: n-gram keys live as 64-bit
  // hashes, strings never enter the LM tables). Every downstream agg,
  // shuffle, and scoring join then keys on fixed-width longs instead of
  // 1-4 UTF8 strings: smaller exchanges, cheaper hashing/comparison,
  // and an UnsafeRow layout with no variable-length payload. A doc's
  // perplexity depends only on n-gram COUNT EQUALITIES, which the hash
  // preserves absent collisions — and a 64-bit hash over a realistic
  // vocab is collision-free in expectation far past 1e8 types (p ≈
  // v²/2⁶⁵; the cross-engine oracle hashes would catch one instantly).
  private val pplShared = new graft.plans.SessionCache[DataFrame]

  /** Cached (doc_id, toks) token-HASH arrays of the documents corpus.
    * `.cache()` is re-asserted per access: a `catalog.clearCache()`
    * between bench attempts drops the registration, and re-caching an
    * already-cached plan is a no-op. */
  private def tokenArraysOf(s: SparkSession, dir: String): DataFrame =
    pplShared.getOrElseUpdate(s, s"toks|$dir") {
      Tables.documents(s, dir).selectExpr("doc_id",
        "transform(split(text, ' '), t -> xxhash64(t)) AS toks")
    }.cache()

  /** Cached per-doc unigram ppl frame — `unigram_ppl` orders it,
    * `quality_tiers` ranks it. */
  private def unigramPplFrameOf(s: SparkSession, dir: String): DataFrame =
    pplShared.getOrElseUpdate(s, s"uni_ppl|$dir") {
      unigramPplOfToks(tokenArraysOf(s, dir))
    }.cache()

  /** The perplexity score over ANY (id, text) frame — what
    * [[graft.CorpusRunner]]'s `ppl_gate` step ranks on. */
  def unigramPplOf(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame =
    unigramPplOfToks(docs.selectExpr(s"$idCol AS doc_id",
      s"transform(split($textCol, ' '), t -> xxhash64(t)) AS toks"))

  private def unigramPplOfToks(tokArr: DataFrame): DataFrame = {
    val toks = tokArr
      .selectExpr("doc_id", "explode(toks) AS w")
      .cache() // feeds both the LM build and the scoring join
    val cnt = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = cnt.agg(sum("c").as("n"), count(lit(1)).as("v"))
    val lp = cnt.crossJoin(broadcast(tot))
      .select(col("w"),
        log((col("c") + 1).cast("double") / (col("n") + col("v"))).as("lp"))
    toks.join(lp, "w")
      .groupBy("doc_id")
      .agg(round(exp(-sum("lp") / count(lit(1))), 4).as("ppl"),
        count(lit(1)).as("n_toks"))
  }

  /** Bigram-LM perplexity — one fidelity step toward CCNet's 5-gram
    * KenLM scoring, built with the same corpus-fit machinery as
    * [[unigramPpl]]: p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V) add-one smoothed
    * over the corpus's own bigrams, ppl(doc) = exp(−mean ln p) over the
    * doc's bigram stream. Bigrams are a ROW-LOCAL transform of the token
    * array (no positional self-join); the LM build is one bigram-keyed
    * agg + one context-keyed agg; scoring is a bigram-keyed join — all
    * uniform keys, map-side combinable. Docs shorter than 2 tokens have
    * no bigrams and get no row (same convention as a KenLM scorer
    * skipping empty input). */
  def bigramPpl(s: SparkSession, dir: String): DataFrame =
    bigramPplOfToks(tokenArraysOf(s, dir)).orderBy("doc_id")

  /** The bigram perplexity over ANY (id, text) frame. */
  def bigramPplOf(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame =
    bigramPplOfToks(docs.selectExpr(s"$idCol AS doc_id",
      s"transform(split($textCol, ' '), t -> xxhash64(t)) AS toks"))

  private def bigramPplOfToks(tokArr: DataFrame): DataFrame = {
    val bg = tokArr
      .filter("size(toks) >= 2")
      .selectExpr("doc_id",
        """explode(transform(sequence(1, size(toks) - 1),
          |  i -> struct(toks[i - 1] AS w1, toks[i] AS w2))) AS b""".stripMargin)
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .cache() // feeds the LM build and the scoring join
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = bg.select("w2").union(bg.select("w1")).distinct()
      .agg(count(lit(1)).as("v"))
    val lp = c2.join(c1, "w1").crossJoin(broadcast(v))
      .select(col("w1"), col("w2"),
        log((col("c2") + 1).cast("double") / (col("c1") + col("v"))).as("lp"))
    bg.join(lp, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(round(exp(-sum("lp") / count(lit(1))), 4).as("ppl"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Interpolated Kneser-Ney trigram perplexity — the next rung of the
    * fidelity ladder toward CCNet's 5-gram KenLM scoring ([[unigramPpl]]
    * → [[bigramPpl]] → this): absolute discount D=0.75 at the trigram
    * level, KN CONTINUATION counts (type counts, not token counts) at
    * the bigram/unigram levels, fully interpolated:
    *
    *   p(w3|w1w2) = max(c(w1w2w3)−D,0)/c(w1w2)
    *              + D·N1+(w1w2·)/c(w1w2) · p(w3|w2)
    *   p(w3|w2)   = max(N1+(·w2w3)−D,0)/N1+(·w2·)
    *              + D·N1+(w2·)/N1+(·w2·) · p_cont(w3)
    *   p_cont(w3) = N1+(·w3)/N1+(··)       (over distinct (w2,w3) types)
    *
    * This is what ranks a FLUENT document below a shuffled-token one —
    * unigram perplexity cannot separate them at all (same token
    * multiset ⇒ identical score; LlmQualitySpec proves both claims).
    *
    * Scale shape: trigrams are a row-local transform of the token array;
    * every LM table is a map-side-combining agg on uniform token keys
    * (trigram/bigram/unigram types); scoring is one trigram-keyed join.
    * The only driver/broadcast state is the 1-row N1+(··) scalar. */
  def trigramPpl(s: SparkSession, dir: String): DataFrame =
    trigramPplOfToks(tokenArraysOf(s, dir)).orderBy("doc_id")

  /** The KN trigram perplexity over ANY (id, text) frame. Docs shorter
    * than 3 tokens have no trigrams and get no row. */
  def trigramPplOf(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame =
    trigramPplOfToks(docs.selectExpr(s"$idCol AS doc_id",
      s"transform(split($textCol, ' '), t -> xxhash64(t)) AS toks"))

  private def trigramPplOfToks(tokArr: DataFrame): DataFrame = {
    val D = 0.75
    val tg = tokArr
      .filter("size(toks) >= 3")
      .selectExpr("doc_id",
        """explode(transform(sequence(2, size(toks) - 1),
          |  i -> struct(toks[i - 2] AS w1, toks[i - 1] AS w2,
          |              toks[i] AS w3))) AS g""".stripMargin)
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))
      .cache() // feeds the LM build and the scoring join
    val c3 = tg.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
      .cache() // the trigram TYPE table every KN count derives from
    val c12 = c3.groupBy("w1", "w2")
      .agg(sum("c3").as("c12"), count(lit(1)).as("nt12"))
    val m23 = c3.groupBy("w2", "w3").agg(count(lit(1)).as("n23"))
      .cache() // m23's rows ARE the distinct (w2,w3) types: every
               // lower-order continuation count derives from it below,
               // so no countDistinct/distinct expansion is ever needed
    val d2 = c3.groupBy("w2").agg(count(lit(1)).as("nd2"))
      .join(m23.groupBy("w2").agg(count(lit(1)).as("n2d")), "w2")
    val c3c = m23.groupBy("w3").agg(count(lit(1)).as("nd3"))
    val ndd = m23.agg(count(lit(1)).as("ndd"))
    val lm = c3.join(c12, Seq("w1", "w2")).join(m23, Seq("w2", "w3"))
      .join(d2, Seq("w2")).join(c3c, Seq("w3")).crossJoin(broadcast(ndd))
      .select(col("w1"), col("w2"), col("w3"),
        log(greatest(col("c3") - D, lit(0.0)) / col("c12") +
          lit(D) * col("nt12") / col("c12") *
            (greatest(col("n23") - D, lit(0.0)) / col("nd2") +
              lit(D) * col("n2d") / col("nd2") *
                (col("nd3") / col("ndd")))).as("lp"))
    graft.plans.Eager.checkpoint( // per-doc rows: tiny; frees LM caches
      tg.join(lm, Seq("w1", "w2", "w3"))
        .groupBy("doc_id")
        .agg(round(exp(-sum("lp") / count(lit(1))), 4).as("ppl"),
          count(lit(1)).as("n_trigrams"))) {
      tg.unpersist(); c3.unpersist(); m23.unpersist()
    }
  }

  /** Interpolated Kneser-Ney 4-gram perplexity with min-count PRUNING —
    * the last rung of the CCNet fidelity ladder ([[unigramPpl]] →
    * [[bigramPpl]] → [[trigramPpl]] → this). Same KN recursion as
    * [[trigramPplOf]] shifted one order up — 4-gram token counts at the
    * top, continuation (type) counts at every lower level, all derived
    * from the single 4-gram TYPE table:
    *
    *   p4(w4|w1w2w3) = max(c4−D,0)/c123 + D·nt123/c123 · p3(w4|w2w3)
    *   p3(w4|w2w3)   = max(N1+(·w2w3w4)−D,0)/N1+(·w2w3·)
    *                 + D·N1+(w2w3·)/N1+(·w2w3·) · p2(w4|w3)
    *   p2(w4|w3)     = max(N1+(··w3w4)−D,0)/N1+(··w3·)
    *                 + D·N1+(·w3·)/N1+(··w3·) · pcont(w4)
    *
    * What keeps order 4 BOUNDED where order 3 was not a concern: the
    * top-level table grows ~linearly in corpus size (most 4-grams are
    * singletons), so the model keeps only types with c4 ≥ `minCount`;
    * a scored 4-gram outside the kept table BACKS OFF to the full
    * trigram-level KN probability p3 (keyed (w2,w3,w4) — order-3 state,
    * the same scale class [[trigramPplOf]] already carries). Context
    * totals c123/nt123 come from the UNPRUNED type table (a transient
    * map-side agg, never part of the scoring artifact), so pruning
    * changes no kept probability — it only reroutes rare-type mass to
    * the backoff path, the standard drop-the-ngram/keep-the-backoff
    * pruning shape.
    *
    * LlmQualitySpec proves the fidelity claim: a doc whose trigrams are
    * all corpus-frequent but whose 4-gram is novel ties `trigram_ppl`
    * exactly and only this model separates it.
    *
    * Scale shape: 4-grams are a row-local transform of the token array;
    * every LM table is a map-side-combining agg on uniform n-gram keys;
    * scoring is one always-hit trigram-keyed join plus one left join
    * against the PRUNED 4-gram table; the only broadcast is the 1-row
    * N1+(···) scalar. */
  def fourgramPpl(s: SparkSession, dir: String): DataFrame =
    fourgramPplOfToks(tokenArraysOf(s, dir), FourgramMinCount)
      .orderBy("doc_id")

  /** Min-count prune threshold for [[fourgramPplOf]] — shared with the
    * `fourgram_ppl` oracle string so the two sides cannot drift. */
  val FourgramMinCount = 2

  /** The pruned KN 4-gram perplexity over ANY (id, text) frame. Docs
    * shorter than 4 tokens have no 4-grams and get no row. */
  def fourgramPplOf(docs: DataFrame, idCol: String, textCol: String,
                    minCount: Int = FourgramMinCount): DataFrame =
    fourgramPplOfToks(docs.selectExpr(s"$idCol AS doc_id",
      s"transform(split($textCol, ' '), t -> xxhash64(t)) AS toks"),
      minCount)

  private def fourgramPplOfToks(tokArr: DataFrame, minCount: Int): DataFrame = {
    require(minCount >= 1, s"fourgram: minCount must be >= 1, got $minCount")
    val D = 0.75
    val qg = tokArr
      .filter("size(toks) >= 4")
      .selectExpr("doc_id",
        """explode(transform(sequence(3, size(toks) - 1),
          |  i -> struct(toks[i - 3] AS w1, toks[i - 2] AS w2,
          |              toks[i - 1] AS w3, toks[i] AS w4))) AS g""".stripMargin)
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"), col("g.w4").as("w4"))
      .cache() // feeds the LM build and the scoring join
    val c4 = qg.groupBy("w1", "w2", "w3", "w4").agg(count(lit(1)).as("c4"))
      .cache() // the 4-gram TYPE table every KN count derives from
    val c123 = c4.groupBy("w1", "w2", "w3")
      .agg(sum("c4").as("c123"), count(lit(1)).as("nt123"))
    val m234 = c4.groupBy("w2", "w3", "w4").agg(count(lit(1)).as("n234"))
      .cache() // distinct (w2,w3,w4) continuation types — the backoff
               // level's own "token" table, same derivation trick as
               // trigramPplOf's m23: no countDistinct expansion anywhere
    val d23 = c4.groupBy("w2", "w3").agg(count(lit(1)).as("nd23"))
      .join(m234.groupBy("w2", "w3").agg(count(lit(1)).as("n23d")),
        Seq("w2", "w3"))
    val m34 = m234.groupBy("w3", "w4").agg(count(lit(1)).as("n34"))
      .cache()
    val d3 = m234.groupBy("w3").agg(count(lit(1)).as("nd3"))
      .join(m34.groupBy("w3").agg(count(lit(1)).as("n3d")), Seq("w3"))
    val cw4 = m34.groupBy("w4").agg(count(lit(1)).as("nw4"))
    val ndd = m34.agg(count(lit(1)).as("ndd"))
    // full trigram-level backoff LM keyed (w2,w3,w4) — always hits for a
    // self-scored corpus (every scored 4-gram's suffix is a type)
    val lm3 = m234.join(d23, Seq("w2", "w3")).join(m34, Seq("w3", "w4"))
      .join(d3, Seq("w3")).join(cw4, Seq("w4")).crossJoin(broadcast(ndd))
      .select(col("w2"), col("w3"), col("w4"),
        (greatest(col("n234") - D, lit(0.0)) / col("nd23") +
          lit(D) * col("n23d") / col("nd23") *
            (greatest(col("n34") - D, lit(0.0)) / col("nd3") +
              lit(D) * col("n3d") / col("nd3") *
                (col("nw4") / col("ndd")))).as("p3"))
    // pruned top level: ONLY types with c4 >= minCount survive into the
    // scoring artifact; their probabilities use unpruned context totals
    val lm4 = c4.filter(col("c4") >= minCount)
      .join(c123, Seq("w1", "w2", "w3")).join(lm3, Seq("w2", "w3", "w4"))
      .select(col("w1"), col("w2"), col("w3"), col("w4"),
        (greatest(col("c4") - D, lit(0.0)) / col("c123") +
          lit(D) * col("nt123") / col("c123") * col("p3")).as("p4"))
    // per-TYPE score (coalesce(pruned p4, backoff p3) on the 4-gram TYPE
    // table), then ONE corpus-sized join keyed exactly like the c4
    // groupBy — so the scoring join REUSES qg's (w1..w4) exchange
    // (ReusedExchange) instead of re-shuffling the corpus by (w2,w3,w4)
    // for lm3 and AGAIN by (w1..w4) for lm4 as two separate passes
    val sc = c4.select("w1", "w2", "w3", "w4")
      .join(lm3, Seq("w2", "w3", "w4"))
      .join(lm4, Seq("w1", "w2", "w3", "w4"), "left")
      .select(col("w1"), col("w2"), col("w3"), col("w4"),
        log(coalesce(col("p4"), col("p3"))).as("lp"))
    graft.plans.Eager.checkpoint( // per-doc rows: tiny; frees LM caches
      qg.join(sc, Seq("w1", "w2", "w3", "w4"))
        .groupBy("doc_id")
        .agg(round(exp(-sum("lp") / count(lit(1))), 4).as("ppl"),
          count(lit(1)).as("n_fourgrams"))) {
      qg.unpersist(); c4.unpersist(); m234.unpersist(); m34.unpersist()
    }
  }

  /** Okapi BM25 top-k retrieval (k1=1.2, b=0.75, Lucene's non-negative
    * idf = ln(1 + (N−df+0.5)/(df+0.5))) for a bounded query term set —
    * the retrieval primitive training-data curation leans on (find the
    * docs most "about" a probe query: eval-set decontamination by
    * retrievability, targeted domain harvesting, RAG index sanity).
    *
    * Scale shape: the token stream is a row-local explode filtered to
    * the O(|terms|) query vocabulary BEFORE any shuffle, so tf is an agg
    * over hits only, df is O(terms) rows, and the corpus-wide stats
    * (N, avgdl) are one map-side-combining agg broadcast as a 1-row
    * frame. Per-term scores land in FIXED-ORDER summed columns (not a
    * group-order-dependent float sum), keeping the score bit-reproducible
    * cross-engine; top-k is TakeOrderedAndProject on the rounded score —
    * per-partition top-k merged on the driver, no global sort. */
  def bm25TopK(s: SparkSession, dir: String): DataFrame =
    bm25TopKOf(Tables.documents(s, dir), "doc_id", "text",
      Seq("spark", "join", "window"), 10)

  /** BM25 over ANY (id, text) frame and ANY bounded term set. */
  def bm25TopKOf(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && terms.size <= 64,
      s"bm25: term set must be 1..64 terms, got ${terms.size}")
    require(terms.distinct.size == terms.size, "bm25: terms must be distinct")
    val d = docs.selectExpr(s"$idCol AS doc_id",
      s"size(split($textCol, ' ')) AS dl").cache()
    val st = d.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
    val tf = docs
      .selectExpr(s"$idCol AS doc_id", s"explode(split($textCol, ' ')) AS w")
      .filter(col("w").isin(terms.map(t => t: Any): _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val sc = tf.join(broadcast(dfq), "w").join(d, "doc_id")
      .crossJoin(broadcast(st))
      .select(col("doc_id"), col("w"),
        (log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
          .as("s"))
    val score = terms.map(t =>
      coalesce(max(when(col("w") === t, col("s"))), lit(0.0)))
      .reduceLeft(_ + _)
    sc.groupBy("doc_id")
      .agg(round(score, 6).as("score"), count(lit(1)).as("n_hit"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** PMI collocation mining — the phrase-discovery pass a corpus curator
    * runs to find multi-word expressions worth protecting from
    * tokenization/shuffling: pointwise mutual information of adjacent
    * token pairs, ln((c₂/N₂) / ((c₁(a)/N₁)·(c₁(b)/N₁))), floored at
    * `minCount` co-occurrences so rare-pair noise can't dominate.
    * Bigram/unigram counts are map-side-combining aggs on uniform token
    * keys; the two totals ride in as a broadcast 1-row frame; top-k is
    * TakeOrderedAndProject on the rounded score. */
  def pmiBigrams(s: SparkSession, dir: String): DataFrame =
    pmiBigramsOf(Tables.documents(s, dir), "doc_id", "text",
      minCount = 5, k = 20)

  /** PMI over ANY (id, text) frame. */
  def pmiBigramsOf(docs: DataFrame, idCol: String, textCol: String,
                   minCount: Long, k: Int): DataFrame = {
    val toks = docs
      .selectExpr(s"$idCol AS doc_id", s"split($textCol, ' ') AS toks")
    val uni = toks.selectExpr("explode(toks) AS w")
      .groupBy("w").agg(count(lit(1)).as("c1")).cache()
    val bg = toks.filter("size(toks) >= 2")
      .selectExpr(
        """explode(transform(sequence(1, size(toks) - 1),
          |  i -> struct(toks[i - 1] AS w1, toks[i] AS w2))) AS b""".stripMargin)
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
    val totals = uni.agg(sum("c1").as("n1")).crossJoin(
      broadcast(bg.agg(count(lit(1)).as("n2"))))
    c2.join(uni.select(col("w").as("w1"), col("c1").as("c1a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c1").as("c1b")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c2"),
        (round(log((col("c2") / col("n2")) /
          ((col("c1a") / col("n1")) * (col("c1b") / col("n1")))), 6)
          + lit(0.0)).as("pmi"))
      .orderBy(desc("pmi"), asc("w1"), asc("w2"))
      .limit(k)
  }

  /** SEMANTIC decontamination — the embedding-space member of the
    * decontamination family ([[decontamOverlap]] catches shingle/lexical
    * overlap; this catches PARAPHRASED eval leakage that shares no
    * n-grams): every corpus vector is scored by its max cosine to any
    * eval vector, and the rows clearing the threshold are the flagged
    * contamination with their nearest eval doc as evidence. This contract
    * query stages the eval set by the same `% 97` convention as the
    * shingle decontam (what the oracle replays); the production shape —
    * an EXTERNAL eval set read through scheme dispatch — is the
    * `semantic_decontam` corpus step, which routes the same
    * [[semanticDecontamOf]]. */
  def semanticDecontam(s: SparkSession, dir: String,
                       threshold: Double = 0.3): DataFrame = {
    val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
    semanticDecontamOf(
      e.filter(col("vec_id") % 97 =!= 0),
      e.filter(col("vec_id") % 97 === 0), threshold)
  }

  /** Exact semantic decontam over ANY corpus/eval (vec_id, embedding)
    * frames. The eval set broadcasts, so its size is validated against
    * `maxEvalRows` the way [[hardNegativesOf]] validates its query set —
    * a LOUD failure, not a silent executor OOM; an eval set over the
    * bound belongs on the persisted-ANN candidate path
    * ([[semanticDecontamAnn]]), which swaps in without changing the
    * output contract.
    *
    * Scale shape: the validated eval set (≤ maxEvalRows narrow rows) is
    * materialized once and broadcast; the corpus streams
    * partition-parallel with one codegen vec_dot per (corpus, eval)
    * pair, folded by min(struct(-cos, e_id)) — max cosine with a
    * deterministic min-id tie-break, no value buffer, one
    * partial-aggregating shuffle. */
  def semanticDecontamOf(corpus: DataFrame, evalVecs: DataFrame,
                         threshold: Double,
                         maxEvalRows: Long = 4096): DataFrame = {
    val ev0 = evalVecs.select(col("vec_id").as("e_id"),
      vecNorm(col("embedding")).as("evn"))
    // ONE bounded materialization answers "empty?", "over the broadcast
    // bound?", AND stages the broadcast rows: limit(max+1) caps the scan,
    // and when the count clears the bound the limit dropped nothing, so
    // the checkpointed frame IS the eval set — the source is never read
    // a second time for the broadcast.
    val ev = ev0.limit(math.min(maxEvalRows + 1, Int.MaxValue.toLong).toInt)
      .localCheckpoint(true)
    val ne = ev.count()
    require(ne > 0, "semantic_decontam: eval set is empty")
    require(ne <= maxEvalRows,
      s"semantic_decontam: eval set has more than $maxEvalRows rows (the " +
        "broadcast bound) — use the persisted-ANN candidate path " +
        "(semanticDecontamAnn) for large eval sets")
    val best = corpus
      .select(col("vec_id"), vecNorm(col("embedding")).as("vn"))
      .crossJoin(broadcast(ev))
      .select(col("vec_id"),
        struct((-round(vecDot(col("vn"), col("evn")), 4)).as("nc"),
          col("e_id")).as("s"))
      .groupBy("vec_id").agg(min("s").as("f"))
    best.select(col("vec_id"), col("f.e_id").as("near_eval"),
        (-col("f.nc")).as("max_cos"))
      .filter(col("max_cos") >= threshold)
      .orderBy("vec_id")
  }

  /** The persisted-ANN candidate path of semantic decontam — the shape
    * an UNBOUNDED eval suite (or a 100 TB corpus re-scan) ships: instead
    * of corpus × eval, each eval vector probes its `nprobe` nearest
    * coarse cells of the PUBLISHED IVF index ([[ivfIndexPublish]] — the
    * committed centroids ride in as an O(k·dim) literal, the inverted
    * lists are one parquet scan joined on the cell id), and only list
    * members of probed cells are cosine-scored. Candidate volume is
    * bounded by |eval|·(corpus/k)·nprobe instead of |eval|·corpus; a
    * corpus vector in no probed cell is reported clean (the standard
    * ANN recall trade, tunable via nprobe). Same output contract as
    * [[semanticDecontam]]. */
  def semanticDecontamAnn(s: SparkSession, dir: String,
                          threshold: Double = 0.3): DataFrame = {
    val root = ivfIndexPublish(s, dir)
    val cents: Seq[(Long, Array[Double])] =
      graft.plans.SnapshotStore.readLatest(s, s"$root/centroids")
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).toSeq
    val np = adaptiveNprobe(cents.size)
    val probes = Tables.embeddings(s, dir)
      .filter(col("vec_id") % 97 === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("x2", vecDot(col("v"), col("v")))
      .withColumn("pr", slice(array_sort(transform(centArrOf(cents), c =>
        struct(round(centD2(c), 6).as("rd2"), c("cid").as("cid")))), 1, np))
      .select(col("vec_id").as("e_id"), explode(col("pr")).as("p"))
      .select(col("e_id"), col("p.cid").as("cent_id"))
    val lists = graft.plans.SnapshotStore.readLatest(s, s"$root/lists")
      .filter(col("c_id") % 97 =!= 0) // eval members are not corpus rows
    val qv = Tables.embeddings(s, dir).filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("e_id"), vecNorm(col("embedding")).as("evn"))
    val best = probes.join(lists, "cent_id")
      .join(broadcast(qv), "e_id")
      .select(col("c_id").as("vec_id"),
        struct((-round(vecDot(col("evn"), col("cvn")), 4)).as("nc"),
          col("e_id")).as("s"))
      .groupBy("vec_id").agg(min("s").as("f"))
    best.select(col("vec_id"), col("f.e_id").as("near_eval"),
        (-col("f.nc")).as("max_cos"))
      .filter(col("max_cos") >= threshold)
      .orderBy("vec_id")
  }

  /** Per-source rank normalization of a quality signal — the step that
    * makes one quality THRESHOLD comparable across sources (a web crawl
    * and a books corpus have incomparable raw score scales; their
    * percentile ranks are comparable by construction). pct_rank =
    * (in-source 0-based rank)/(n−1) under a deterministic total order.
    *
    * Scale shape: same machinery as [[graft.queries.EventOpsPack]]'s
    * gap percentiles — one global two-pass range-sort rank over
    * (source, score, id), per-source offsets from an O(sources)
    * broadcast agg; NO per-source window sort, no per-group state. */
  def scoreRankNorm(s: SparkSession, dir: String): DataFrame =
    scoreRankNormOf(
      Tables.documents(s, dir).select("doc_id", "source", "n_chars"),
      "doc_id", "source", "n_chars")
      .select(col("doc_id"), col("source"), col("n_chars"),
        round(col("pct_rank"), 6).as("pct_rank"))
      .orderBy("doc_id")

  /** The per-group rank normalization over ANY (id, group, score) frame —
    * also what the `rank_gate` corpus step thresholds on. Deterministic
    * total order (score, id); pct_rank ∈ [0,1], 0 for singleton groups. */
  def scoreRankNormOf(d: DataFrame, idCol: String, groupCol: String,
                      scoreCol: String): DataFrame = {
    val (ranked, rankedP) = graft.plans.GlobalRank.withRowNumberPersisted(
      d.select(col(idCol), col(groupCol), col(scoreCol)),
      Seq(col(groupCol), col(scoreCol), col(idCol)), "rn")
    val stats = ranked.groupBy(groupCol)
      .agg(min("rn").as("rn0"), count(lit(1)).as("n"))
    // the output is corpus-sized, so the eager checkpoint IS a full
    // materialization — but it replaces (not adds to) the range-sort
    // persist it releases: same write volume, and the cache entry is
    // freed on the exact persisted handle instead of leaking all session
    graft.plans.Eager.checkpoint(
      ranked.join(broadcast(stats), groupCol)
        .select(col(idCol), col(groupCol), col(scoreCol),
          when(col("n") > 1,
            (col("rn") - col("rn0")).cast("double") / (col("n") - 1))
            .otherwise(lit(0.0)).as("pct_rank"))) { rankedP.unpersist() }
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES,
    * deterministic): each doc draws the reproducible md5 coin u and gets
    * key = ln(u)/w — the top-k keys ARE a weight-proportional sample
    * without replacement. Here w = token count, i.e. "sample long docs
    * preferentially" — the quality-weighted corpus subsample a curation
    * pipeline draws without materializing the whole corpus.
    *
    * Scale shape: the key is a row-local expression; top-k is
    * TakeOrderedAndProject (per-partition top-k, O(k) driver merge) on
    * the 6-dp-rounded key with an id tie-break, so selection is
    * deterministic cross-engine despite last-ulp ln() differences. */
  def weightedSample(s: SparkSession, dir: String, k: Int = 50): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("w"))
      .withColumn("u", greatest(
        graft.functions.GraftFunctions.md5Coin(col("doc_id")), lit(1e-12)))
      .select(col("doc_id"), col("source"), col("w"),
        // strictly-negative statistic whose top-k sits nearest zero: the
        // max key CAN round to ±0.0, so normalize the zero's sign
        (round(log(col("u")) / col("w"), 6) + lit(0.0)).as("key"))
      .orderBy(desc("key"), asc("doc_id"))
      .limit(k)

  /** CCNet's head/middle/tail split: equi-depth perplexity tiers over the
    * corpus (tier 1 = lowest-perplexity "head" kept for training, tier 3 =
    * "tail" dropped or down-weighted). Exact tiering via the two-pass
    * range-sort ntile (plans.GlobalRank) — no single-partition window at
    * any scale. */
  def qualityTiers(s: SparkSession, dir: String): DataFrame = {
    // rides the SAME cached per-doc unigram ppl frame as `unigram_ppl`
    val ppl = unigramPplFrameOf(s, dir).select("doc_id", "ppl")
    val (tiered, tieredP) = graft.plans.GlobalRank
      .withNtilePersisted(ppl, Seq(col("ppl"), col("doc_id")), 3, "tier")
    graft.plans.Eager.checkpoint( // 3 rows; frees the ntile sort cache
      tiered
        .groupBy("tier")
        .agg(count(lit(1)).as("n_docs"),
          round(min("ppl"), 4).as("min_ppl"),
          round(max("ppl"), 4).as("max_ppl"))
        .orderBy("tier")) { tieredP.unpersist() }
  }

  /** Deterministic global training-order shuffle: every document gets a
    * reproducible pseudo-random position (md5 of a salted id — change the
    * salt to re-shuffle per epoch) and a round-robin shard assignment.
    * The naive `orderBy(rand())` is both non-reproducible and, with a
    * window row_number, single-task; this uses the two-pass range-sort
    * global row number (plans.GlobalRank), so the sort is
    * partition-parallel at any scale and the shard layout is a pure
    * function of the corpus — rerunnable on any cluster size. */
  def corpusShuffle(s: SparkSession, dir: String, shards: Int = 16): DataFrame =
    corpusShuffleOf(Tables.documents(s, dir), "doc_id", shards)
      .orderBy("pos")

  /** The shuffle/shard assignment over ANY id-keyed frame — run it on the
    * CLEANED corpus (positions dense, shards balanced), not on a superset
    * that later gets filtered. */
  def corpusShuffleOf(docs: DataFrame, idCol: String,
                      shards: Int): DataFrame = {
    val key = md5(concat(lit("shuf|"), col(idCol).cast("string")))
    val (ranked, rankedP) = graft.plans.GlobalRank.withRowNumberPersisted(
      docs.selectExpr(s"$idCol AS doc_id"), Seq(key, col("doc_id")), "pos")
    // corpus-sized output: the eager checkpoint replaces the range-sort
    // persist it releases (narrow id/pos/shard rows — smaller than the
    // sorted md5-keyed frame it frees)
    graft.plans.Eager.checkpoint(
      ranked
        .withColumn("shard", (col("pos") - 1) % shards)
        .select("doc_id", "pos", "shard")) { rankedP.unpersist() }
  }

  /** Curriculum training order: tier the corpus by a difficulty score
    * (easy → hard), then shuffle WITHIN each tier with the deterministic
    * md5 coin — the curriculum-learning layout (Bengio et al. 2009): the
    * model sees easy examples first, but inside a difficulty band the
    * order is still random (a raw score sort would feed pathologically
    * correlated neighbors). Both passes ride the two-pass range-sort
    * machinery: exact global NTILE for the tiers, exact global row number
    * for the final order — partition-parallel at any scale, reproducible
    * on any cluster size. `salt` re-deals the in-tier permutation per
    * epoch (each epoch's coin is md5("curr|<salt>|id")): tiers are a pure
    * function of the scores, so every epoch sees the same easy → hard
    * bands in a fresh within-band order — the curriculum-learning epoch
    * contract. The default (empty) salt keeps the original coin. */
  def curriculumOrderOf(docs: DataFrame, idCol: String, scoreCol: String,
                        tiers: Int, salt: String = ""): DataFrame = {
    val (tiered, tieredP) = graft.plans.GlobalRank.withNtilePersisted(
      docs.select(col(idCol).as("doc_id"),
        col(scoreCol).cast("double").as("__s")),
      Seq(col("__s"), col("doc_id")), tiers, "tier")
    val coinPrefix = if (salt.isEmpty) "curr|" else s"curr|$salt|"
    val keyed = tiered.select(col("doc_id"), col("tier").cast("long").as("tier"),
      md5(concat(lit(coinPrefix), col("doc_id").cast("string"))).as("__c"))
    val (ordered, orderedP) = graft.plans.GlobalRank.withRowNumberPersisted(
      keyed, Seq(col("tier"), col("__c"), col("doc_id")), "ord")
    graft.plans.Eager.checkpoint(
      ordered.select("doc_id", "tier", "ord")) {
      tieredP.unpersist(); orderedP.unpersist()
    }
  }

  /** Driver query: curriculum order over documents with char count as the
    * difficulty proxy (short first), 10 tiers. */
  def curriculumOrder(s: SparkSession, dir: String): DataFrame =
    curriculumOrderOf(Tables.documents(s, dir), "doc_id", "n_chars", 10)
      .orderBy("ord")

  /** Corpus profile per (lang, source). */
  def langProfile(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        round(avg("n_chars"), 2).as("avg_chars"))
      .orderBy("lang", "source")

  /** Scalar-quantized (SQ8) ANN — the memory-bandwidth scale path
    * (FAISS's `ScalarQuantizer` QT_8bit): each dimension of the normalized
    * vector is affinely coded into 0..255 against the corpus-wide
    * per-dimension [min, max], the shortlist is ranked on the DEQUANTIZED
    * approximate cosine, and the exact float vectors re-rank only the
    * shortlist. At 100 TB the scan reads uint8 codes — 8× fewer bytes than
    * float64 — while the [min,max] codebook is O(dim) (a 2×64-double
    * broadcast literal here), and re-ranking touches `shortlist` rows per
    * query instead of the corpus.
    *
    * Determinism across engines: quantization runs on the normalized
    * vector ROUNDED to 1e-6 (both engines then see identical decimal
    * inputs, so min/max/codes match bit-for-bit), and the shortlist ranks
    * on round(approx, 4) with a c_id tie-break. */
  def annSq8(s: SparkSession, dir: String,
             topk: Int = 3, shortlist: Int = 12): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), vecNorm(col("embedding")).as("vn"))
      .withColumn("vq", expr("transform(vn, x -> round(x, 6))"))
      .cache() // read by the min/max agg + both sides of the score join
    // per-dimension [min,max]: one narrow agg to O(dim) rows — the SQ
    // "codebook", collected and re-broadcast as literals (like an IVF
    // centroid set, it is O(dim), never O(N))
    val mm = e.select(posexplode(col("vq")).as(Seq("i", "x")))
      .groupBy("i").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("i").collect()
    val mnA = array(mm.map(r => lit(r.getDouble(1))).toIndexedSeq: _*)
    val mxA = array(mm.map(r => lit(r.getDouble(2))).toIndexedSeq: _*)
    val coded = e
      .withColumn("mn", mnA).withColumn("mx", mxA)
      // code = round(255·(x−mn)/(mx−mn)) ∈ 0..255; constant dims code to 0
      .withColumn("dq", expr(
        """transform(transform(vq, (x, i) ->
          |   CASE WHEN mx[i] = mn[i] THEN 0.0D
          |        ELSE round(255 * (x - mn[i]) / (mx[i] - mn[i])) END),
          | (c, i) -> mn[i] + c * (mx[i] - mn[i]) / 255)""".stripMargin))
      .select("vec_id", "vn", "dq")
    val q = coded.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("vn").as("qv"), col("dq").as("qd"))
    // broadcast the BOUNDED query set explicitly: left to its size
    // estimates Spark broadcasts the corpus side (both sides read the same
    // scan, so the stats tie) — correct at test SF, impossible at 100 TB
    val short = broadcast(q).crossJoin(coded.select(col("vec_id").as("c_id"),
        col("vn").as("cv"), col("dq").as("cd")))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("approx", round(vecDot(col("qd"), col("cd")), 4))
      .withColumn("srnk", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("approx"), asc("c_id"))))
      .filter(col("srnk") <= shortlist)
    short
      .withColumn("cos_sim", round(vecDot(col("qv"), col("cv")), 4))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("cos_sim"), asc("c_id"))))
      .filter(col("rnk") <= topk)
      .select("q_id", "rnk", "c_id", "cos_sim")
      .orderBy("q_id", "rnk")
  }

  /** MinHash estimator calibration: for every VERIFIED near-dup pair, the
    * Jaccard ESTIMATE from the 12-permutation signature (matching-slot
    * fraction — the unbiased MinHash estimator) next to the exact Jaccard
    * the verify join computed. The per-pair |error| is the "measure, don't
    * guess" number behind trusting `dedup_minhash` at scales where the
    * exact verify is the expensive step: estimator cost is O(perms) per
    * pair on the already-aggregated signatures (one doc-keyed join), no
    * shingle re-scan. */
  def minhashEstErr(s: SparkSession, dir: String): DataFrame = {
    val seeds = 0 until 12
    val sh = shingles(s, dir).cache()
    val mh = minhashSigsFrom(sh).cache() // read by banding + both join sides
    // the `D` suffix keeps the division DOUBLE (a bare 12.0 parses as
    // DECIMAL(3,1) in Spark SQL — DuckDB's /12.0 is already double)
    val est = expr(seeds.map(k => s"CASE WHEN a_mh$k = b_mh$k THEN 1 ELSE 0 END")
      .mkString("(", " + ", s") / ${seeds.size}.0D"))
    val a = mh.toDF(mh.columns.map(c => if (c == "doc_id") "da" else s"a_$c").toIndexedSeq: _*)
    val b = mh.toDF(mh.columns.map(c => if (c == "doc_id") "db" else s"b_$c").toIndexedSeq: _*)
    minhashPairsFrom(sh, mh, 0.7)
      .join(a, "da").join(b, "db")
      .withColumn("jac_est", round(est, 6))
      .withColumn("abs_err", round(abs(col("jac") - est), 6))
      .select("da", "db", "jac", "jac_est", "abs_err")
      .orderBy("da", "db")
  }

  /** Cross-source contamination: where the VERIFIED near-dup pairs live in
    * the source matrix — the train/eval leakage check run before mixing
    * sources into one training corpus (a cluster spanning two sources
    * means "deduplicate across sources, not just within"). Cost is two
    * id-keyed joins on the ALREADY-BOUNDED pair graph (orders of magnitude
    * smaller than the corpus — the same observation that lets
    * [[dedupClusters]] solve components), then an O(sources²)-row agg. */
  def sourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    minhashPairs(s, dir)
      .join(src.select(col("doc_id").as("da"), col("source").as("sa")), "da")
      .join(src.select(col("doc_id").as("db"), col("source").as("sb")), "db")
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("src_a", "src_b")
  }

  /** Per-document unigram (Shannon) entropy in bits — the information-
    * density quality signal: near-zero entropy flags degenerate repetition
    * (boilerplate, keyword stuffing) that length/stopword ratios miss.
    * H = log₂ n − (Σ c·log₂ c)/n over per-token counts c; computed from
    * ln via one token-keyed agg + one doc-keyed agg — two keyed shuffles,
    * map-side combinable, at any corpus size. */
  def docEntropy(s: SparkSession, dir: String): DataFrame =
    docEntropyOf(Tables.documents(s, dir), "doc_id", "text")

  /** The entropy profile over ANY (id, text) frame. */
  def docEntropyOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .selectExpr(s"$idCol AS doc_id", s"explode(split($textCol, ' ')) AS w")
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_toks"), count(lit(1)).as("n_distinct"),
        round((log(sum("c")) - sum(col("c") * log("c")) / sum("c")) / log(lit(2.0)), 6)
          .as("entropy_bits"))
      .orderBy("doc_id")

  /** Corpus Zipf profile: OLS fit of ln(frequency) against ln(rank) over
    * the whole vocabulary — natural text tracks slope ≈ −1 (Zipf's law);
    * machine-generated or template-heavy corpora deviate, making the
    * (slope, R²) pair a cheap whole-corpus health number.
    *
    * Scale design: one token-keyed count agg (map-side combinable), an
    * exact global frequency rank via the two-pass range sort
    * ([[graft.plans.GlobalRank]] — no single-partition window even with a
    * 100 B-token vocabulary), then a single algebraic agg of the five OLS
    * moments. Nothing driver-side beyond O(partitions) offsets. */
  def vocabZipf(s: SparkSession, dir: String): DataFrame = {
    val freq = Tables.documents(s, dir)
      .selectExpr("explode(split(text, ' ')) AS w")
      .groupBy("w").agg(count(lit(1)).as("f"))
    graft.plans.GlobalRank
      .rowNumbered(freq, Seq(col("f").desc, col("w")), "r") { ranked =>
        val x = log(col("r").cast("double"))
        val y = log(col("f").cast("double"))
        val m = ranked.agg(
          count(lit(1)).as("n"), sum("f").as("n_tokens"),
          sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"))
        val cov = m("n") * m("sxy") - m("sx") * m("sy")
        val varX = m("n") * m("sxx") - m("sx") * m("sx")
        val varY = m("n") * m("syy") - m("sy") * m("sy")
        m.select(col("n").as("n_vocab"), col("n_tokens"),
          (round(cov / varX, 4) + lit(0.0)).as("zipf_slope"),
          round(cov * cov / (varX * varY), 4).as("zipf_r2"))
      }
  }

  /** Semantic-dedup threshold calibration: pair counts of the
    * sign-projection candidate set at a ladder of cosine thresholds — the
    * curve a user reads to pick the [[semDedup]]/[[neardupCosine]] cutoff
    * instead of guessing it. One pass over the already-bucketed candidates
    * (same plan shape as `neardup_cosine`) feeding a single conditional
    * agg — the sweep adds no joins and no extra shuffles. */
  def neardupSweep(s: SparkSession, dir: String): DataFrame = {
    val ts = Seq(0.35, 0.5, 0.6, 0.7, 0.8, 0.9)
    val sigs = Tables.embeddings(s, dir)
      .select(col("vec_id"), vecNorm(col("embedding")).as("vn"),
        vecSig(col("embedding"), 4, 64).as("sig"))
      .cache()
    val scored = sigs.selectExpr("sig", "vec_id AS da", "vn AS va")
      .join(sigs.selectExpr("sig", "vec_id AS db", "vn AS vb"), "sig")
      .filter(col("da") < col("db"))
      .select(round(vecDot(col("va"), col("vb")), 4).as("cos_sim"))
    val aggs = ts.map(t => sum(when(col("cos_sim") >= t, 1L).otherwise(0L))
      .as(s"n_${(t * 100).toInt}"))
    val counts = scored.agg(aggs.head, aggs.tail: _*)
    counts.selectExpr(s"stack(${ts.size}, " +
        ts.map(t => s"${t}D, n_${(t * 100).toInt}").mkString(", ") +
        ") AS (threshold, n_pairs)")
      .orderBy("threshold")
  }

  /** Packing-efficiency report over the [[docPack]] token-budget bins:
    * how full the bins actually are (mean/min/max fill fraction and the
    * share ≥ 90% full) — the number that tells a user whether the packing
    * budget wastes context-window tokens. The ≥90% test is computed in
    * integers (10·fill ≥ 9·budget) so it is exact in any engine. */
  def packStats(s: SparkSession, dir: String, budget: Int = 256): DataFrame = {
    val bins = docPackOf(Tables.documents(s, dir), "doc_id", "text", budget)
      .groupBy("bin_id").agg(sum("n_tokens").as("fill"))
    bins.agg(
      count(lit(1)).as("n_bins"),
      sum("fill").as("n_tokens"),
      round(avg(col("fill") / budget.toDouble), 6).as("avg_fill"),
      round(min(col("fill") / budget.toDouble), 6).as("min_fill"),
      round(max(col("fill") / budget.toDouble), 6).as("max_fill"),
      sum(when(col("fill") * 10 >= lit(9L * budget), 1L).otherwise(0L))
        .as("n_full90"))
  }

  /** Incremental NEAR-dup dedup: a new ingest batch (doc_id ≥ `split`,
    * mirroring [[corpusDiff]]'s version convention) probed against the
    * EXISTING corpus's LSH band index — the continuous-ingest twin of
    * [[dedupMinhash]], which [[dedupIncremental]] already provides for
    * exact hashes. Only new×old band collisions become candidates (the
    * new batch is not deduped against itself here), and only candidates
    * pay the exact-Jaccard verify, so per-batch cost scales with the batch
    * and its collision set — never with corpus². At 100 TB the old-side
    * band index is a materialized table keyed on (band, sig); the probe is
    * the same equi-join. Output: every new doc that near-duplicates an
    * existing doc, with the matched old doc and verified Jaccard. */
  def dedupMinhashIncr(s: SparkSession, dir: String,
                       split: Long = 400, threshold: Double = 0.7): DataFrame = {
    val sh = shingles(s, dir).cache()
    val bands = minhashBandsFrom(minhashSigsFrom(sh)).cache()
    val cand = bands.filter(col("doc_id") >= split)
      .select(col("band"), col("sig"), col("doc_id").as("new_id"))
      .join(bands.filter(col("doc_id") < split)
        .select(col("band"), col("sig"), col("doc_id").as("old_id")),
        Seq("band", "sig"))
      .select("new_id", "old_id").distinct()
      .cache() // candidate-doc semi-join + pair-driven verify
    val candDocs = cand
      .select(explode(array(col("new_id"), col("old_id"))).as("doc_id")).distinct()
    val shC = sh.join(candDocs, Seq("doc_id"), "left_semi").cache()
    val sizes = shC.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(shC.select(col("doc_id").as("new_id"), col("s")), "new_id")
      .join(shC.select(col("doc_id").as("old_id"), col("s")), Seq("old_id", "s"))
      .groupBy("new_id", "old_id").agg(count(lit(1)).as("ni"))
    inter
      .join(sizes.select(col("doc_id").as("new_id"), col("n").as("na")), "new_id")
      .join(sizes.select(col("doc_id").as("old_id"), col("n").as("nb")), "old_id")
      .withColumn("jac", round(col("ni") / (col("na") + col("nb") - col("ni")), 6))
      .filter(col("jac") >= threshold)
      .select("new_id", "old_id", "jac")
      .orderBy("new_id", "old_id")
  }

  // ------------------------------------------------------------- contract

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact,
    "soft_dedup_weights" -> softDedupWeights,
    "label_agreement" -> labelAgreement,
    "embed_corr" -> embedCorr,
    "novelty_curve" -> noveltyCurve,
    "source_kl" -> sourceKl,
    "dedup_normalized" -> dedupNormalized,
    "fuzzy_pairs" -> ((s, d) => fuzzyPairs(s, d)),
    "doc_chunk" -> docChunk,
    "dedup_canonical" -> dedupCanonical,
    "cluster_safe_split" -> ((s, d) => clusterSafeSplit(s, d)),
    "hard_negatives" -> hardNegatives,
    "neardup_pairs" -> neardupPairs,
    "neardup_capped" -> neardupCapped,
    "containment_pairs" -> ((s, d) => containmentPairs(s, d)),
    "dedup_minhash" -> dedupMinhash,
    "dedup_clusters" -> dedupClusters,
    "simhash_sig" -> simhashSig,
    "ann_topk" -> annTopK,
    "ann_ndcg" -> annNdcg,
    "ann_mmr" -> ((s, d) => annMmr(s, d)),
    "ann_lsh" -> annLsh,
    "ann_ivf" -> ((s, d) => annIvf(s, d)),
    "neardup_cosine" -> neardupCosine,
    "quality_filter" -> qualityFilter,
    "embed_stats" -> embedStats,
    "embed_rp" -> embedRp,
    "curriculum_order" -> curriculumOrder,
    "text_stats" -> textStats,
    "token_bpe" -> tokenBpe,
    "bpe_train" -> bpeTrain,
    "unigram_lm_train" -> unigramLmTrain,
    "unigram_lm_apply" -> unigramLmApply,
    "unigram_lm_apply_persisted" -> unigramLmApplyPersisted,
    "bpe_apply" -> bpeApply,
    "bpe_apply_persisted" -> bpeApplyPersisted,
    "langid_markers" -> langidMarkers,
    "doc_fingerprint" -> docFingerprint,
    "doc_winnow" -> docWinnow,
    "lang_profile" -> langProfile,
    "decontam_overlap" -> decontamOverlap,
    "decontam_bloom" -> decontamBloom,
    "gopher_repetition" -> gopherRepetition,
    "embed_kmeans" -> embedKmeans,
    "embed_pq" -> ((s, d) => embedPq(s, d)),
    "embed_pq_trained" -> ((s, d) => embedPqTrained(s, d)),
    "ann_ivfpq" -> ((s, d) => annIvfPq(s, d)),
    "ann_ivf_trained" -> ((s, d) => annIvfTrained(s, d)),
    "ann_probe_persisted" -> annIvfProbePersisted,
    "ann_probe_pq" -> ((s, d) => annIvfPqProbePersisted(s, d)),
    "merge_upsert" -> mergeUpsert,
    "text_normalize" -> textNormalize,
    "kmeans_balance" -> ((s, d) => kmeansBalance(s, d)),
    "doc_pack" -> ((s, d) => docPack(s, d)),
    "dedup_incremental" -> dedupIncremental,
    "topk_per_source" -> topkPerSource,
    "source_mix_sample" -> ((s, d) => sourceMixSample(s, d)),
    "source_temp_mix" -> ((s, d) => sourceTemperatureMix(s, d)),
    "source_token_mix" -> ((s, d) => sourceTokenMix(s, d)),
    "dup_segments" -> ((s, d) => dupSegments(s, d)),
    "span_scrub" -> spanScrub,
    "dsir_weights" -> dsirWeights,
    "semdedup" -> ((s, d) => semDedup(s, d)),
    "corpus_shuffle" -> ((s, d) => corpusShuffle(s, d)),
    "unigram_ppl" -> unigramPpl,
    "bigram_ppl" -> bigramPpl,
    "trigram_ppl" -> trigramPpl,
    "fourgram_ppl" -> fourgramPpl,
    "bm25_topk" -> bm25TopK,
    "pmi_bigrams" -> pmiBigrams,
    "score_rank_norm" -> scoreRankNorm,
    "weighted_sample" -> ((s, d) => weightedSample(s, d)),
    "semantic_decontam" -> ((s, d) => semanticDecontam(s, d)),
    "semantic_decontam_ann" -> ((s, d) => semanticDecontamAnn(s, d)),
    "quality_tiers" -> qualityTiers,
    "corpus_diff" -> corpusDiff,
    "ann_sq8" -> ((s, d) => annSq8(s, d)),
    "minhash_est_err" -> minhashEstErr,
    "source_overlap" -> sourceOverlap,
    "doc_entropy" -> docEntropy,
    "vocab_zipf" -> vocabZipf,
    "vocab_heaps" -> vocabHeaps,
    "source_report" -> sourceReport,
    "embed_outliers" -> embedOutliers,
    "neardup_sweep" -> neardupSweep,
    "pack_stats" -> ((s, d) => packStats(s, d)),
    "dedup_minhash_incr" -> ((s, d) => dedupMinhashIncr(s, d)),
    "simhash_neardup" -> simhashNeardupProfile)

  /** DuckDB replay of the 3-round deterministic k-means ([[embedKmeans]]):
    * CTE chain c0 -> a1 -> c1 -> a2 -> c2 -> a3, ending at the final
    * assignment `a3(vec_id, v, cid, d2)`. */
  /** The shared Lloyd-fit CTE chain. `limitSql` is the seed-count (a
    * literal for the clustering queries, `(SELECT k FROM kk)` for the
    * adaptive trained-IVF); `pre` prepends extra CTEs (the adaptive `kk`)
    * ahead of `e`. */
  private def kmeansCtesWith(limitSql: String, pre: String = ""): String = {
    def assignCte(a: String, c: String) =
      s"""$a AS (SELECT vec_id, v, cid, d2
         |  FROM (SELECT e.vec_id, e.v, c.cid,
         |          e.x2 + list_dot_product(c.cv, c.cv)
         |            - 2 * list_dot_product(e.v, c.cv) AS d2
         |        FROM e, $c c)
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY round(d2, 6), cid) = 1)""".stripMargin
    def updateCte(u: String, a: String, cPrev: String, c: String) =
      s"""$u AS (SELECT cid, i, round(avg(v[i]), 6) AS m
         |  FROM $a, unnest(generate_series(1, len(v))) AS t(i)
         |  GROUP BY cid, i),
         | ${c}raw AS (SELECT cid, list(m ORDER BY i) AS cv FROM $u GROUP BY cid),
         | $c AS (SELECT $cPrev.cid, coalesce(${c}raw.cv, $cPrev.cv) AS cv
         |   FROM $cPrev LEFT JOIN ${c}raw USING (cid))""".stripMargin
    s"""WITH ${pre}e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       |   list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS x2
       |  FROM embeddings),
       | c0 AS (SELECT vec_id AS cid, list_transform(v, x -> round(x, 6)) AS cv
       |   FROM (SELECT * FROM e ORDER BY $seedOrderSql LIMIT $limitSql)),
       | ${assignCte("a1", "c0")},
       | ${updateCte("u1", "a1", "c0", "c1")},
       | ${assignCte("a2", "c1")},
       | ${updateCte("u2", "a2", "c1", "c2")},
       | ${assignCte("a3", "c2")}""".stripMargin
  }

  /** Fixed-k chain for the clustering queries (k is the [[KmeansK]]
    * hyperparameter, not corpus-derived). */
  private val kmeansCtes: String = kmeansCtesWith(KmeansK.toString)

  /** Shared by `ann_ivf_trained` (inline build+probe) and
    * `ann_probe_persisted` (probe over the published SnapshotStore
    * index): the serving path must be byte-identical to the inline one,
    * so one oracle checks both. */
  private val annIvfTrainedOracle: String =
    s"""${kmeansCtesWith("(SELECT k FROM kk)", pre = s"$adaptiveKCte,\n ")},
      | sq AS (SELECT e.vec_id, c.cid,
      |     e.x2 + list_dot_product(c.cv, c.cv)
      |       - 2 * list_dot_product(e.v, c.cv) AS d2
      |   FROM e, c2 c WHERE e.vec_id < 8),
      | probes AS (SELECT vec_id AS q_id, cid AS cent_id FROM (
      |     SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
      |       ORDER BY round(d2, 6), cid) AS rn FROM sq)
      |   WHERE rn <= (SELECT np FROM kk)),
      | lists AS (SELECT vec_id AS c_id, cid AS cent_id FROM a3),
      | nrm AS (SELECT vec_id,
      |     list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
      | pairs AS (SELECT p.q_id, l.c_id,
      |     round(list_dot_product(a.vn, b.vn), 4) AS cos_sim
      |   FROM probes p JOIN lists l USING (cent_id)
      |     JOIN nrm a ON a.vec_id = p.q_id JOIN nrm b ON b.vec_id = l.c_id
      |   WHERE p.q_id <> l.c_id)
      |SELECT q_id, rnk, c_id, cos_sim FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos_sim DESC, c_id) AS rnk FROM pairs)
      |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin

  /** DuckDB replay of [[annMmrOf]]'s greedy loop, UNROLLED: round r's
    * CTE computes each unpicked candidate's penalty (max pairwise sim to
    * the union of rounds 1..r−1) and takes the per-query argmax — the
    * same join + window argmax the Spark side runs. λ and (1−λ) are
    * interpolated from the one constant (and 1−λ computed as a DOUBLE
    * subtraction in BOTH engines, so the IEEE bits match exactly). */
  private def mmrOracleSql(k: Int, lam: Double, nCand: Int): String = {
    val w = s"$lam::DOUBLE"
    val mu = s"(1.0::DOUBLE - $lam::DOUBLE)"
    val rounds = (2 to k).map { r =>
      val prev = (1 until r).map(i => s"SELECT q_id, c_id FROM s$i")
        .mkString(" UNION ALL ")
      s""",
         | sel$r AS ($prev),
         | pen$r AS (SELECT ps.q_id, ps.a AS c_id, max(ps.sim) AS pen
         |   FROM ps JOIN sel$r sv ON ps.q_id = sv.q_id AND ps.b = sv.c_id
         |   GROUP BY 1, 2),
         | s$r AS (SELECT q_id, $r AS rnk, c_id, rel, round(score, 5) AS score FROM (
         |   SELECT c.q_id, c.c_id, c.rel,
         |     $w * c.rel - $mu * coalesce(p.pen, 0.0) AS score,
         |     row_number() OVER (PARTITION BY c.q_id
         |       ORDER BY $w * c.rel - $mu * coalesce(p.pen, 0.0) DESC,
         |         c.c_id) AS rn
         |   FROM cand c
         |   LEFT JOIN pen$r p ON p.q_id = c.q_id AND p.c_id = c.c_id
         |   LEFT JOIN sel$r sv ON sv.q_id = c.q_id AND sv.c_id = c.c_id
         |   WHERE sv.c_id IS NULL) WHERE rn = 1)""".stripMargin
    }.mkString
    val union = (1 to k).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    s"""WITH e AS (SELECT vec_id,
       |   list_transform(embedding::DOUBLE[],
       |     x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS vn
       |  FROM embeddings),
       | sc AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |   round(list_dot_product(q.vn, c.vn), 4) AS rel, c.vn AS cv
       |   FROM e q, e c WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id),
       | cand AS (SELECT q_id, c_id, rel, cv FROM (
       |   SELECT *, row_number() OVER (PARTITION BY q_id
       |     ORDER BY rel DESC, c_id) AS rk FROM sc) WHERE rk <= $nCand),
       | ps AS (SELECT a.q_id, a.c_id AS a, b.c_id AS b,
       |   round(list_dot_product(a.cv, b.cv), 4) AS sim
       |   FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.c_id <> b.c_id),
       | s1 AS (SELECT q_id, 1 AS rnk, c_id, rel,
       |   round($w * rel, 5) AS score FROM (
       |   SELECT *, row_number() OVER (PARTITION BY q_id
       |     ORDER BY rel DESC, c_id) AS rn FROM cand) WHERE rn = 1)$rounds
       |SELECT q_id, rnk, c_id, rel, score FROM ($union)
       |ORDER BY q_id, rnk""".stripMargin
  }

  /** Shared ANN oracle blocks — `ann_ndcg` composes them as CTEs so the
    * eval's gold standard and system ranking are THE SAME SQL the
    * individual queries are checked against (no drift possible). */
  private val annTopKSql: String =
    """WITH e AS (SELECT vec_id,
      |   list_transform(embedding::DOUBLE[],
      |     x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS vn
      |  FROM embeddings),
      | sc AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
      |   round(list_dot_product(q.vn, c.vn), 4) AS cos_sim
      |   FROM e q, e c WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id)
      |SELECT q_id, rnk, c_id, cos_sim FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk
      |  FROM sc)
      |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  private val annLshSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      | w AS (SELECT j, list_transform(generate_series(1, 64), i ->
      |     CASE WHEN ('0x' || substr(md5(CAST(i - 1 AS VARCHAR)), j + 1, 1))::INT % 2 = 0
      |          THEN 1.0 ELSE -1.0 END) AS wv
      |   FROM generate_series(0, 31) AS t(j)),
      | sigv AS (SELECT vec_id, j // 4 AS band,
      |     sum(CASE WHEN list_dot_product(v, wv) >= 0 THEN (1 << (j % 4)) ELSE 0 END)::BIGINT AS sig
      |   FROM e, w GROUP BY vec_id, j // 4),
      | nrm AS (SELECT vec_id,
      |     list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn FROM e),
      | cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
      |   FROM sigv q JOIN sigv c ON q.band = c.band AND q.sig = c.sig
      |     AND q.vec_id <> c.vec_id
      |   WHERE q.vec_id < 8),
      | sc AS (SELECT cand.q_id, cand.c_id,
      |     round(list_dot_product(a.vn, b.vn), 4) AS cos_sim
      |   FROM cand JOIN nrm a ON cand.q_id = a.vec_id
      |             JOIN nrm b ON cand.c_id = b.vec_id)
      |SELECT q_id, rnk, c_id, cos_sim FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk
      |  FROM sc)
      |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin

  val oracle: Map[String, String] = Map(
    "ann_mmr" -> mmrOracleSql(k = 5, lam = 0.7, nCand = 12),
    "dedup_incremental" ->
      """WITH h AS (SELECT doc_id, md5(lower(trim(text))) AS text_hash FROM documents),
        | base AS (SELECT DISTINCT text_hash FROM h WHERE doc_id < 250)
        |SELECT min(doc_id) AS keep_id, count(*) AS n_copies, text_hash
        |FROM h WHERE doc_id >= 250
        | AND text_hash NOT IN (SELECT text_hash FROM base)
        |GROUP BY text_hash ORDER BY keep_id""".stripMargin,
    "topk_per_source" ->
      """SELECT source, rank, doc_id, n_chars FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents)
        |WHERE rank <= 3 ORDER BY source, rank""".stripMargin,
    "source_mix_sample" ->
      """WITH c AS (SELECT source, count(*) AS n_src FROM documents GROUP BY source)
        |SELECT d.source, d.doc_id
        |FROM documents d JOIN c ON d.source = c.source
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |    * 100.0 / 4294967296.0 < 100.0 * 10.0 / c.n_src
        |ORDER BY d.source, d.doc_id""".stripMargin,
    "source_temp_mix" ->
      """WITH c AS (SELECT source, count(*) AS n_src FROM documents GROUP BY source),
        | t AS (SELECT sum(pow(n_src, 0.5)) AS tot FROM c),
        | p AS (SELECT source, n_src,
        |     round(least(1.0, 200.0 * pow(n_src, -0.5) / tot), 6) AS keep_p
        |   FROM c, t),
        | kept AS (SELECT d.source, d.doc_id, p.n_src, p.keep_p
        |   FROM documents d JOIN p USING (source)
        |   WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |       / 4294967296.0 < p.keep_p)
        |SELECT source, count(*) AS n_kept, max(n_src) AS n_src,
        | max(keep_p) AS keep_p
        |FROM kept GROUP BY source ORDER BY source""".stripMargin,
    "source_token_mix" ->
      """WITH d AS (SELECT source, doc_id,
        |     len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
        | c AS (SELECT source, sum(n_tok)::BIGINT AS tok_src FROM d GROUP BY source),
        | t AS (SELECT sum(pow(tok_src, 0.5)) AS tot FROM c),
        | p AS (SELECT source, tok_src,
        |     round(least(1.0, 5000.0 * pow(tok_src, -0.5) / tot), 6) AS keep_p
        |   FROM c, t),
        | kept AS (SELECT d.source, d.n_tok, p.tok_src, p.keep_p
        |   FROM d JOIN p USING (source)
        |   WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |       / 4294967296.0 < p.keep_p)
        |SELECT source, count(*) AS n_kept, sum(n_tok)::BIGINT AS kept_tokens,
        | max(tok_src) AS tok_src, max(keep_p) AS keep_p
        |FROM kept GROUP BY source ORDER BY source""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        | md5(lower(trim(text))) AS text_hash
        |FROM documents GROUP BY 3 ORDER BY keep_id""".stripMargin,
    "source_kl" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w
        |   FROM documents),
        | sw AS (SELECT source, w, count(*)::BIGINT AS c FROM t GROUP BY 1, 2),
        | cw AS (SELECT w, sum(c)::BIGINT AS cc FROM sw GROUP BY w),
        | tot AS (SELECT sum(c)::BIGINT AS n_total FROM sw),
        | st AS (SELECT source, sum(c)::BIGINT AS n_src,
        |   count(*)::BIGINT AS vocab FROM sw GROUP BY source)
        |SELECT sw.source, st.n_src, st.vocab,
        | round(sum((sw.c::DOUBLE / st.n_src) *
        |   ln((sw.c::DOUBLE / st.n_src) / (cw.cc::DOUBLE / tot.n_total))), 6)
        |   AS kl
        |FROM sw JOIN cw USING (w) JOIN st USING (source), tot
        |GROUP BY sw.source, st.n_src, st.vocab ORDER BY sw.source""".stripMargin,
    "novelty_curve" ->
      s"""WITH $shinglesSql,
        | first AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s),
        | pd AS (SELECT sh.doc_id, count(*)::BIGINT AS n_sh,
        |   sum(CASE WHEN sh.doc_id = first.first_doc THEN 1 ELSE 0 END)::BIGINT AS n_new
        |  FROM sh JOIN first USING (s) GROUP BY sh.doc_id),
        | t AS (SELECT n_sh, n_new,
        |   CAST(ntile(10) OVER (ORDER BY doc_id) AS BIGINT) AS decile FROM pd)
        |SELECT decile, count(*)::BIGINT AS n_docs,
        | sum(n_sh)::BIGINT AS n_shingles, sum(n_new)::BIGINT AS n_first_seen,
        | round(sum(n_new)::DOUBLE / sum(n_sh), 6) AS novelty_frac
        |FROM t GROUP BY decile ORDER BY decile""".stripMargin,
    "label_agreement" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        | wc AS (SELECT doc_id, w, count(*) AS c FROM
        |   (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY doc_id, w),
        | ws AS (SELECT doc_id, sum(c)::BIGINT AS n_words, max(c) AS top_w
        |   FROM wc GROUP BY doc_id),
        | bc AS (SELECT doc_id, bg, count(*) AS c FROM
        |   (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1])) AS bg
        |    FROM t WHERE len(toks) >= 2) GROUP BY doc_id, bg),
        | bs AS (SELECT doc_id, sum(c)::BIGINT AS n_bigrams, max(c) AS top_b
        |   FROM bc GROUP BY doc_id),
        | ga AS (SELECT ws.doc_id, CASE WHEN
        |     round(top_w::DOUBLE / n_words, 6) <= 0.125
        |     AND round(top_b::DOUBLE / n_bigrams, 6) <= 0.05
        |   THEN 1 ELSE 0 END AS ka FROM ws JOIN bs USING (doc_id)),
        | q AS (SELECT doc_id,
        |   len(string_split(text, ' ')) AS n_tokens,
        |   list_sum(list_transform(string_split(text, ' '), x -> length(x)))::DOUBLE
        |     / len(string_split(text, ' ')) AS mean_tok_len,
        |   len(list_filter(string_split(text, ' '),
        |       x -> x IN ('the', 'a', 'of', 'and', 'is', 'in', 'to')))::DOUBLE
        |     / len(string_split(text, ' ')) AS stop_ratio,
        |   (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE
        |     / length(text) AS symbol_ratio
        |  FROM documents),
        | qb AS (SELECT doc_id, CASE WHEN n_tokens BETWEEN 5 AND 100000
        |     AND mean_tok_len BETWEEN 2.0 AND 12.0
        |     AND stop_ratio >= 0.01 AND symbol_ratio <= 0.2
        |   THEN 1 ELSE 0 END AS kb FROM q),
        | cells AS (SELECT count(*)::BIGINT AS n,
        |   sum(CASE WHEN ka = 1 AND kb = 1 THEN 1 ELSE 0 END)::BIGINT AS n11,
        |   sum(CASE WHEN ka = 1 AND kb = 0 THEN 1 ELSE 0 END)::BIGINT AS n10,
        |   sum(CASE WHEN ka = 0 AND kb = 1 THEN 1 ELSE 0 END)::BIGINT AS n01,
        |   sum(CASE WHEN ka = 0 AND kb = 0 THEN 1 ELSE 0 END)::BIGINT AS n00
        |  FROM ga JOIN qb USING (doc_id))
        |SELECT n, n11, n10, n01, n00,
        | round((n11 + n00)::DOUBLE / n, 6) AS p_observed,
        | round(((n11 + n00)::DOUBLE / n
        |     - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))::DOUBLE / (n * n))
        |   / (1.0 - ((n11 + n10) * (n11 + n01)
        |     + (n01 + n00) * (n10 + n00))::DOUBLE / (n * n)), 6) + 0.0 AS kappa
        |FROM cells""".stripMargin,
    "soft_dedup_weights" ->
      """WITH d AS (SELECT doc_id, source, n_chars,
        |   md5(lower(trim(text))) AS h FROM documents),
        | g AS (SELECT h, count(*)::BIGINT AS n_copies FROM d GROUP BY h)
        |SELECT source, count(*)::BIGINT AS n_docs,
        | sum(n_chars)::BIGINT AS raw_chars,
        | round(sum(n_chars::DOUBLE / n_copies), 4) AS eff_chars,
        | round(round(sum(n_chars::DOUBLE / n_copies), 4)
        |   / sum(n_chars), 6) AS eff_ratio
        |FROM d JOIN g USING (h) GROUP BY source ORDER BY source""".stripMargin,
    "dedup_normalized" ->
      """WITH all_docs AS (
        |   SELECT doc_id, text FROM documents
        |   UNION ALL
        |   SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id,
        |     replace(upper(text), ' ', '  ') || ' !!' AS text FROM documents),
        | n AS (SELECT doc_id, md5(trim(regexp_replace(regexp_replace(
        |     lower(text), '[^\p{L}\p{N} ]', '', 'g'), ' +', ' ', 'g'))) AS norm_md5
        |   FROM all_docs)
        |SELECT min(doc_id) AS keep_id, count(*)::BIGINT AS n_copies, norm_md5
        |FROM n GROUP BY norm_md5 HAVING count(*) > 1
        |ORDER BY keep_id""".stripMargin,
    "fuzzy_pairs" ->
      """WITH all_docs AS (
        |   SELECT doc_id AS id, text AS t FROM documents
        |   UNION ALL
        |   SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
        |     text || ' near duplicate tail' FROM documents WHERE doc_id % 37 = 0
        |   UNION ALL
        |   SELECT doc_id + 2 * (SELECT max(doc_id) + 1 FROM documents),
        |     'copy: ' || text FROM documents WHERE doc_id % 41 = 0),
        | base AS (SELECT id, t, length(t) AS len FROM all_docs),
        | cand AS (
        |   SELECT a.id AS id_a, b.id AS id_b, a.t AS ta, b.t AS tb,
        |     a.len AS la, b.len AS lb
        |   FROM base a JOIN base b ON left(a.t, 24) = left(b.t, 24)
        |   WHERE a.id < b.id
        |   UNION
        |   SELECT a.id, b.id, a.t, b.t, a.len, b.len
        |   FROM base a JOIN base b ON right(a.t, 24) = right(b.t, 24)
        |   WHERE a.id < b.id)
        |SELECT id_a, id_b, levenshtein(ta, tb)::INTEGER AS dist
        |FROM cand
        |WHERE abs(la - lb) <= 24 AND levenshtein(ta, tb) <= 24
        |ORDER BY id_a, id_b""".stripMargin,
    "doc_chunk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        | s AS (SELECT doc_id, toks,
        |   unnest(generate_series(0,
        |     CAST(ceil(greatest(len(toks) - 32, 0) / 24.0) AS INT))) AS i
        |   FROM t)
        |SELECT doc_id, (i + 1)::INTEGER AS chunk_id,
        | (i * 24 + 1)::INTEGER AS start_tok,
        | len(toks[(i * 24 + 1):(i * 24 + 32)])::INTEGER AS n_chunk_tokens,
        | md5(array_to_string(toks[(i * 24 + 1):(i * 24 + 32)], ' ')) AS chunk_md5
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    "dedup_canonical" ->
      s"""WITH RECURSIVE $shinglesSql,
        | hh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS h1
        |   FROM sh),
        | mh AS (SELECT doc_id, seed,
        |   min(((2 * seed + 1) * h1 + (seed * 2654435761) % 2147483647) % 2147483647) AS mh
        |   FROM hh, unnest(generate_series(0, 11)) AS u(seed) GROUP BY doc_id, seed),
        | bands AS (SELECT doc_id, seed % 4 AS band,
        |   md5(string_agg(seed || ':' || mh, '|' ORDER BY seed)) AS sig
        |   FROM mh GROUP BY doc_id, seed % 4),
        | cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |   FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        |   WHERE a.doc_id < b.doc_id),
        | sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        | inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
        |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        | p AS (SELECT c.da, c.db
        |   FROM cand c JOIN inter i ON c.da = i.da AND c.db = i.db
        |    JOIN sizes sa ON c.da = sa.doc_id JOIN sizes sb ON c.db = sb.doc_id
        |   WHERE round(ni::DOUBLE / (sa.n + sb.n - ni), 6) >= 0.7),
        | e AS (SELECT da AS a, db AS b FROM p UNION ALL SELECT db, da FROM p),
        | r(d, m) AS (
        |   SELECT DISTINCT a, a FROM e
        |   UNION
        |   SELECT r.d, e.b FROM r JOIN e ON r.m = e.a),
        | lbl AS (SELECT d, min(m) AS cluster_id FROM r GROUP BY d),
        | j AS (SELECT l.cluster_id, dd.doc_id, dd.n_chars,
        |     row_number() OVER (PARTITION BY l.cluster_id
        |       ORDER BY dd.n_chars DESC, dd.doc_id) AS rn
        |   FROM lbl l JOIN documents dd ON l.d = dd.doc_id)
        |SELECT cluster_id,
        | max(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc,
        | max(CASE WHEN rn = 1 THEN n_chars END) AS keep_chars,
        | (count(*) - 1)::BIGINT AS n_dropped
        |FROM j GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,
    "cluster_safe_split" ->
      s"""WITH RECURSIVE $shinglesSql,
        | hh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS h1
        |   FROM sh),
        | mh AS (SELECT doc_id, seed,
        |   min(((2 * seed + 1) * h1 + (seed * 2654435761) % 2147483647) % 2147483647) AS mh
        |   FROM hh, unnest(generate_series(0, 11)) AS u(seed) GROUP BY doc_id, seed),
        | bands AS (SELECT doc_id, seed % 4 AS band,
        |   md5(string_agg(seed || ':' || mh, '|' ORDER BY seed)) AS sig
        |   FROM mh GROUP BY doc_id, seed % 4),
        | cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |   FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        |   WHERE a.doc_id < b.doc_id),
        | sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        | inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
        |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        | p AS (SELECT c.da, c.db
        |   FROM cand c JOIN inter i ON c.da = i.da AND c.db = i.db
        |    JOIN sizes sa ON c.da = sa.doc_id JOIN sizes sb ON c.db = sb.doc_id
        |   WHERE round(ni::DOUBLE / (sa.n + sb.n - ni), 6) >= 0.7),
        | e AS (SELECT da AS a, db AS b FROM p UNION ALL SELECT db, da FROM p),
        | r(d, m) AS (
        |   SELECT DISTINCT a, a FROM e
        |   UNION
        |   SELECT r.d, e.b FROM r JOIN e ON r.m = e.a),
        | lab AS (SELECT d, min(m) AS lbl FROM r GROUP BY d),
        | full_lbl AS (SELECT dd.doc_id, coalesce(lab.lbl, dd.doc_id) AS lbl
        |   FROM documents dd LEFT JOIN lab ON dd.doc_id = lab.d),
        | sided AS (SELECT doc_id, lbl,
        |   CASE WHEN ('0x' || substr(md5(lbl::VARCHAR), 1, 8))::BIGINT
        |       / 4294967296.0 < 0.8 THEN 'train' ELSE 'eval' END AS side
        |   FROM full_lbl),
        | sides AS (SELECT side, count(*)::BIGINT AS n_docs,
        |   count(DISTINCT lbl)::BIGINT AS n_clusters FROM sided GROUP BY side),
        | cr AS (SELECT coalesce(sum(CASE WHEN sa.side <> sb.side THEN 1
        |     ELSE 0 END), 0)::BIGINT AS cross_pairs
        |   FROM p JOIN sided sa ON p.da = sa.doc_id
        |     JOIN sided sb ON p.db = sb.doc_id)
        |SELECT side, n_docs, n_clusters, cross_pairs
        |FROM sides, cr ORDER BY side""".stripMargin,
    "neardup_pairs" ->
      s"""WITH $shinglesSql,
        | sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        | inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
        |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT da, db, round(ni::DOUBLE / (sa.n + sb.n - ni), 6) AS jac
        |FROM inter JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
        |WHERE round(ni::DOUBLE / (sa.n + sb.n - ni), 6) >= 0.8
        |ORDER BY da, db""".stripMargin,
    "neardup_capped" ->
      s"""WITH $shinglesSql,
        | rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 50),
        | shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)),
        | sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
        | inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
        |   FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT da, db, round(ni::DOUBLE / (sa.n + sb.n - ni), 6) AS jac
        |FROM inter JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
        |WHERE round(ni::DOUBLE / (sa.n + sb.n - ni), 6) >= 0.8
        |ORDER BY da, db""".stripMargin,
    "containment_pairs" ->
      s"""WITH $shinglesSql,
        | rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 50),
        | shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)),
        | sizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
        | inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
        |   FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id <> b.doc_id GROUP BY 1, 2)
        |SELECT da, db, ni, round(ni::DOUBLE / sa.n, 6) AS cont
        |FROM inter JOIN sizes sa ON da = sa.doc_id
        |WHERE round(ni::DOUBLE / sa.n, 6) >= 0.5
        |ORDER BY da, db""".stripMargin,
    "dedup_minhash" ->
      s"""WITH $shinglesSql,
        | hh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS h1
        |   FROM sh),
        | mh AS (SELECT doc_id, seed,
        |   min(((2 * seed + 1) * h1 + (seed * 2654435761) % 2147483647) % 2147483647) AS mh
        |   FROM hh, unnest(generate_series(0, 11)) AS u(seed) GROUP BY doc_id, seed),
        | bands AS (SELECT doc_id, seed % 4 AS band,
        |   md5(string_agg(seed || ':' || mh, '|' ORDER BY seed)) AS sig
        |   FROM mh GROUP BY doc_id, seed % 4),
        | cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |   FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        |   WHERE a.doc_id < b.doc_id),
        | sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        | inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
        |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT c.da, c.db, round(ni::DOUBLE / (sa.n + sb.n - ni), 6) AS jac
        |FROM cand c JOIN inter i ON c.da = i.da AND c.db = i.db
        | JOIN sizes sa ON c.da = sa.doc_id JOIN sizes sb ON c.db = sb.doc_id
        |WHERE round(ni::DOUBLE / (sa.n + sb.n - ni), 6) >= 0.7
        |ORDER BY c.da, c.db""".stripMargin,
    "dedup_clusters" ->
      s"""WITH RECURSIVE $shinglesSql,
        | hh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS h1
        |   FROM sh),
        | mh AS (SELECT doc_id, seed,
        |   min(((2 * seed + 1) * h1 + (seed * 2654435761) % 2147483647) % 2147483647) AS mh
        |   FROM hh, unnest(generate_series(0, 11)) AS u(seed) GROUP BY doc_id, seed),
        | bands AS (SELECT doc_id, seed % 4 AS band,
        |   md5(string_agg(seed || ':' || mh, '|' ORDER BY seed)) AS sig
        |   FROM mh GROUP BY doc_id, seed % 4),
        | cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |   FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        |   WHERE a.doc_id < b.doc_id),
        | sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        | inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
        |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        | p AS (SELECT c.da, c.db
        |   FROM cand c JOIN inter i ON c.da = i.da AND c.db = i.db
        |    JOIN sizes sa ON c.da = sa.doc_id JOIN sizes sb ON c.db = sb.doc_id
        |   WHERE round(ni::DOUBLE / (sa.n + sb.n - ni), 6) >= 0.7),
        | e AS (SELECT da AS a, db AS b FROM p UNION ALL SELECT db, da FROM p),
        | r(d, m) AS (
        |   SELECT DISTINCT a, a FROM e
        |   UNION
        |   SELECT r.d, e.b FROM r JOIN e ON r.m = e.a),
        | lbl AS (SELECT d, min(m) AS cluster_id FROM r GROUP BY d)
        |SELECT cluster_id, count(*) AS n_docs, max(d) AS max_doc
        |FROM lbl GROUP BY 1 ORDER BY cluster_id""".stripMargin,
    "simhash_sig" ->
      """WITH tok AS (SELECT DISTINCT doc_id, t FROM (
        |   SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)),
        | th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
        | bits AS (SELECT doc_id, b,
        |   sum(CASE WHEN (h // (1::BIGINT << b)) % 2 = 1 THEN 1 ELSE -1 END) AS vs
        |   FROM th, unnest(generate_series(0, 59)) AS u(b) GROUP BY doc_id, b)
        |SELECT doc_id,
        | sum(CASE WHEN vs > 0 THEN 1::BIGINT << b ELSE 0 END)::BIGINT AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "simhash_neardup" ->
      """WITH tok AS (SELECT DISTINCT doc_id, t FROM (
        |   SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)),
        | th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
        | bits AS (SELECT doc_id, b,
        |   sum(CASE WHEN (h // (1::BIGINT << b)) % 2 = 1 THEN 1 ELSE -1 END) AS vs
        |   FROM th, unnest(generate_series(0, 59)) AS u(b) GROUP BY doc_id, b),
        | sh2 AS (SELECT doc_id,
        |   sum(CASE WHEN vs > 0 THEN 1::BIGINT << b ELSE 0 END)::BIGINT AS simhash
        |   FROM bits GROUP BY doc_id),
        | banded AS (SELECT doc_id, simhash, b AS band,
        |   (simhash // (1::BIGINT << (b * 15))) % 32768 AS bsig
        |   FROM sh2, unnest(generate_series(0, 3)) AS u(b)),
        | cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
        |   a.simhash AS ha, b.simhash AS hb
        |   FROM banded a JOIN banded b ON a.band = b.band AND a.bsig = b.bsig
        |   WHERE a.doc_id < b.doc_id),
        | p AS (SELECT da, db, bit_count(xor(ha, hb))::INT AS hamming
        |   FROM cand WHERE bit_count(xor(ha, hb)) <= 3),
        | np AS (SELECT hamming, count(*)::BIGINT AS n_pairs FROM p GROUP BY hamming),
        | nd AS (SELECT hamming, count(DISTINCT d)::BIGINT AS n_docs FROM (
        |   SELECT hamming, da AS d FROM p UNION ALL SELECT hamming, db FROM p)
        |   GROUP BY hamming)
        |SELECT hamming, n_pairs, n_docs FROM np JOIN nd USING (hamming)
        |ORDER BY hamming""".stripMargin,
    "ann_topk" -> annTopKSql,
    "ann_ndcg" ->
      s"""WITH sys AS ($annLshSql),
         | gold AS (SELECT q_id, c_id FROM ($annTopKSql) WHERE rnk <= 3),
         | per AS (SELECT g.q_id,
         |   sum(CASE WHEN s.rnk IS NOT NULL THEN 1 ELSE 0 END) / 3.0 AS recall,
         |   coalesce(max(CASE WHEN s.rnk IS NOT NULL
         |     THEN 1.0 / s.rnk END), 0.0) AS rr,
         |   coalesce(sum(CASE WHEN s.rnk IS NOT NULL
         |     THEN 1.0 / log2(s.rnk + 1.0) END), 0.0) AS dcg
         |  FROM gold g LEFT JOIN sys s ON s.q_id = g.q_id AND s.c_id = g.c_id
         |  GROUP BY g.q_id)
         |SELECT count(*)::BIGINT AS n_queries,
         | round(avg(recall), 6) AS recall_at_3,
         | round(avg(rr), 6) AS mrr,
         | round(avg(dcg / (1.0 / log2(2.0) + 1.0 / log2(3.0) + 1.0 / log2(4.0))), 6)
         |   AS ndcg_at_3
         |FROM per""".stripMargin,
    "hard_negatives" ->
      """WITH e AS (SELECT vec_id, label,
        |   list_transform(embedding::DOUBLE[],
        |     x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS vn
        |  FROM embeddings),
        | sc AS (SELECT q.vec_id AS q_id, q.label AS ql, c.vec_id AS c_id,
        |   c.label AS cl, round(list_dot_product(q.vn, c.vn), 4) AS cos_sim
        |   FROM e q, e c WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id),
        | pos AS (SELECT q_id, c_id AS pos_id, cos_sim AS pos_cos FROM (
        |   SELECT *, row_number() OVER (PARTITION BY q_id
        |     ORDER BY cos_sim DESC, c_id) AS rnk FROM sc WHERE ql = cl)
        |   WHERE rnk = 1),
        | neg AS (SELECT q_id, c_id AS neg_id, cos_sim AS neg_cos FROM (
        |   SELECT *, row_number() OVER (PARTITION BY q_id
        |     ORDER BY cos_sim DESC, c_id) AS rnk FROM sc WHERE ql <> cl)
        |   WHERE rnk = 1)
        |SELECT q_id, pos_id, pos_cos, neg_id, neg_cos
        |FROM pos JOIN neg USING (q_id) ORDER BY q_id""".stripMargin,
    "ann_lsh" -> annLshSql,
    "ann_ivf" ->
      s"""WITH $adaptiveKCte,
        | e AS (SELECT vec_id,
        |   list_transform(embedding::DOUBLE[],
        |     x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS vn
        |  FROM embeddings),
        | c AS (SELECT vec_id AS cent_id, vn AS cv
        |   FROM (SELECT * FROM e ORDER BY $seedOrderSql LIMIT (SELECT k FROM kk))),
        | sc AS (SELECT e.vec_id, c.cent_id,
        |     round(list_dot_product(e.vn, c.cv), 6) AS d FROM e, c),
        | a AS (SELECT vec_id, cent_id,
        |     row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cent_id) AS rn
        |   FROM sc),
        | lists AS (SELECT vec_id AS c_id, cent_id FROM a WHERE rn = 1),
        | probes AS (SELECT vec_id AS q_id, cent_id FROM a
        |   WHERE vec_id < 8 AND rn <= (SELECT np FROM kk)),
        | pairs AS (SELECT p.q_id, l.c_id,
        |     round(list_dot_product(q.vn, cand.vn), 4) AS cos_sim
        |   FROM probes p JOIN lists l USING (cent_id)
        |     JOIN e q ON q.vec_id = p.q_id JOIN e cand ON cand.vec_id = l.c_id
        |   WHERE p.q_id <> l.c_id)
        |SELECT q_id, rnk, c_id, cos_sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk
        |  FROM pairs)
        |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin,
    "neardup_cosine" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        | w AS (SELECT j, list_transform(generate_series(1, 64), i ->
        |     CASE WHEN ('0x' || substr(md5(CAST(i - 1 AS VARCHAR)), j + 1, 1))::INT % 2 = 0
        |          THEN 1.0 ELSE -1.0 END) AS wv
        |   FROM generate_series(0, 3) AS t(j)),
        | sigv AS (SELECT vec_id,
        |     sum(CASE WHEN list_dot_product(v, wv) >= 0 THEN (1 << j) ELSE 0 END)::BIGINT AS sig
        |   FROM e, w GROUP BY vec_id),
        | sigs AS (SELECT e.vec_id,
        |     list_transform(e.v, x -> x / sqrt(list_dot_product(e.v, e.v))) AS vn,
        |     sigv.sig
        |   FROM e JOIN sigv USING (vec_id)),
        | pairs AS (SELECT a.vec_id AS da, b.vec_id AS db,
        |     round(list_dot_product(a.vn, b.vn), 4) AS cos_sim
        |   FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id)
        |SELECT da, db, cos_sim FROM pairs WHERE cos_sim >= 0.35 ORDER BY da, db""".stripMargin,
    "quality_filter" ->
      """WITH q AS (SELECT source,
        |   len(string_split(text, ' ')) AS n_tokens,
        |   list_sum(list_transform(string_split(text, ' '), x -> length(x)))::DOUBLE
        |     / len(string_split(text, ' ')) AS mean_tok_len,
        |   len(list_filter(string_split(text, ' '),
        |       x -> x IN ('the', 'a', 'of', 'and', 'is', 'in', 'to')))::DOUBLE
        |     / len(string_split(text, ' ')) AS stop_ratio,
        |   (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE
        |     / length(text) AS symbol_ratio
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        | sum(CASE WHEN n_tokens BETWEEN 5 AND 100000 AND mean_tok_len BETWEEN 2.0 AND 12.0
        |     AND stop_ratio >= 0.01 AND symbol_ratio <= 0.2 THEN 1 ELSE 0 END)::BIGINT AS n_keep,
        | round(avg(stop_ratio), 6) AS avg_stop_ratio,
        | round(avg(mean_tok_len), 6) AS avg_tok_len
        |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "curriculum_order" ->
      """WITH t AS (SELECT doc_id, n_chars::DOUBLE AS s FROM documents),
        | tt AS (SELECT doc_id,
        |   CAST(ntile(10) OVER (ORDER BY s, doc_id) AS BIGINT) AS tier FROM t),
        | o AS (SELECT doc_id, tier, row_number() OVER
        |   (ORDER BY tier, md5('curr|' || doc_id::VARCHAR), doc_id) AS ord
        |  FROM tt)
        |SELECT doc_id, tier, ord FROM o ORDER BY ord""".stripMargin,
    "embed_corr" ->
      """WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
        | p AS (SELECT i, j, v[i + 1] AS xi, v[j + 1] AS xj FROM e,
        |   unnest(generate_series(0, 62)) AS a(i),
        |   unnest(generate_series(0, 63)) AS b(j)
        |   WHERE j > i),
        | g AS (SELECT i, j, count(*)::BIGINT AS n, sum(xi) AS sx,
        |   sum(xj) AS sy, sum(xi * xj) AS sxy, sum(xi * xi) AS sxx,
        |   sum(xj * xj) AS syy FROM p GROUP BY i, j)
        |SELECT i::BIGINT AS i, j::BIGINT AS j,
        | round((n * sxy - sx * sy) /
        |   sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0 AS corr
        |FROM g ORDER BY abs(round((n * sxy - sx * sy) /
        |   sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)) DESC, i, j
        |LIMIT 10""".stripMargin,
    "embed_rp" ->
      s"""WITH x AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         | p AS (SELECT vec_id,
         |   list_transform(range(0, $RpDim), j ->
         |     list_reduce(list_transform(e, (v, i) ->
         |       (1 - 2 * (((j * 1315423911 + (i - 1) * 2654435761 + 97)
         |          % 2147483647) % 2)) * v), (a, b) -> a + b)) AS y,
         |   list_reduce(list_transform(e, (v, i) -> v * v), (a, b) -> a + b) AS nx
         |  FROM x),
         | r AS (SELECT vec_id,
         |   list_reduce(list_transform(y, v -> v * v), (a, b) -> a + b)
         |     / $RpDim.0 / nx AS ratio FROM p)
         |SELECT count(*)::BIGINT AS n, round(avg(ratio), 6) AS mean_ratio,
         | round(min(ratio), 6) AS min_ratio, round(max(ratio), 6) AS max_ratio
         |FROM r""".stripMargin,
    "embed_stats" ->
      """SELECT label, count(*) AS n,
        | round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4) AS avg_norm
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "text_stats" ->
      """SELECT doc_id,
        | len(string_split(text, ' ')) AS n_tokens,
        | len(list_distinct(string_split(text, ' '))) AS n_uniq,
        | len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe,
        | round(list_sum(list_transform(string_split(text, ' '), x -> length(x)))::DOUBLE
        |   / len(string_split(text, ' ')), 6) AS avg_tok_len,
        | round(len(list_filter(string_split(text, ' '),
        |     x -> x IN ('the', 'a', 'of', 'and', 'is', 'in', 'to')))::DOUBLE
        |   / len(string_split(text, ' ')), 6) AS stop_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "token_bpe" ->
      """WITH t AS (SELECT doc_id,
        |   regexp_extract_all(lower(text),
        |     '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+|\s+') AS bpe,
        |   list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0) AS ws
        | FROM documents)
        |SELECT doc_id, len(ws)::BIGINT AS n_ws, len(bpe)::BIGINT AS n_bpe,
        | md5(array_to_string(bpe, '|')) AS bpe_md5
        |FROM t ORDER BY doc_id""".stripMargin,
    "bpe_train" -> bpeTrainSql,
    "unigram_lm_train" -> unigramLmTrainSql,
    "unigram_lm_apply" -> unigramLmApplySql,
    "unigram_lm_apply_persisted" -> unigramLmApplySql,
    "bpe_apply" -> bpeApplySql,
    // the persisted path is byte-identical to the inline path BY CONTRACT,
    // so it faces the very same oracle
    "bpe_apply_persisted" -> bpeApplySql,
    "langid_markers" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        | sc AS (SELECT doc_id,
        |   len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS s_en,
        |   len(list_filter(toks, x -> x IN ('el', 'la', 'de', 'y', 'es'))) AS s_es,
        |   len(list_filter(toks, x -> x IN ('der', 'die', 'das', 'und', 'ist'))) AS s_de,
        |   len(list_filter(toks, x -> x IN ('le', 'un', 'et', 'est', 'les'))) AS s_fr
        |  FROM t)
        |SELECT doc_id, s_en, s_es, s_de, s_fr,
        | CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |      WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |      WHEN s_de >= s_fr THEN 'de'
        |      ELSE 'fr' END AS pred_lang
        |FROM sc ORDER BY doc_id""".stripMargin,
    "doc_fingerprint" ->
      s"""WITH $shinglesSql,
        | hs AS (SELECT doc_id, md5(s) AS h FROM sh)
        |SELECT doc_id,
        | md5(array_to_string(list_sort(list(h))[1:3], '')) AS fingerprint
        |FROM hs GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "doc_winnow" ->
      // exact modular powers 257^(7-j) mod 2^31-1 (floating pow would lose
      // precision past 2^53); per-gram hash = Σ c_j·p_j mod P — the same
      // residue the engine's rolling recurrence produces
      """WITH pw AS (SELECT [623063367, 336663071, 168429323, 67503107,
        |                   16974593, 66049, 257, 1] AS p),
        | g AS (SELECT doc_id, CASE WHEN length(text) >= 8 THEN
        |     list_transform(generate_series(1, length(text) - 7),
        |       i -> list_aggregate(list_transform(generate_series(0, 7),
        |              j -> CAST(ord(substr(text, i + j, 1)) AS BIGINT) * p[j + 1]
        |                   % 2147483647), 'sum') % 2147483647)
        |   ELSE [] END AS hashes FROM documents, pw),
        | wn AS (SELECT doc_id, CASE
        |     WHEN len(hashes) = 0 THEN []
        |     WHEN len(hashes) < 4 THEN [list_min(hashes)]
        |     ELSE list_sort(list_distinct(list_transform(
        |       generate_series(1, len(hashes) - 3), i -> list_min(hashes[i:i+3]))))
        |   END AS fp FROM g)
        |SELECT doc_id, len(fp)::BIGINT AS n_fp,
        | md5(array_to_string(fp, ',')) AS fp_md5
        |FROM wn ORDER BY doc_id""".stripMargin,
    "lang_profile" ->
      """SELECT lang, source, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
        | round(avg(n_chars), 2) AS avg_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "embed_kmeans" ->
      s"""$kmeansCtes
         |SELECT cid AS cluster_id, count(*)::BIGINT AS n,
         | round(avg(sqrt(greatest(d2, 0))), 4) AS avg_dist
         |FROM a3 GROUP BY cid ORDER BY cluster_id""".stripMargin,
    "kmeans_balance" ->
      s"""$kmeansCtes,
         | r AS (SELECT cid, vec_id, d2,
         |   row_number() OVER (PARTITION BY cid
         |     ORDER BY round(d2, 6), vec_id) AS rnk FROM a3)
         |SELECT cid AS cluster_id, rnk::INTEGER AS rnk, vec_id,
         | round(sqrt(greatest(d2, 0)), 4) AS dist
         |FROM r WHERE rnk <= 3 ORDER BY cluster_id, rnk""".stripMargin,
    "doc_pack" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        |   FROM documents),
        | c AS (SELECT doc_id, n_tokens,
        |   sum(n_tokens) OVER (ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
        |SELECT ((cum - n_tokens) // 256 + 1)::BIGINT AS bin_id,
        | count(*) AS n_docs, sum(n_tokens)::BIGINT AS sum_tokens,
        | min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY bin_id""".stripMargin,
    "decontam_overlap" ->
      s"""WITH $shinglesSql,
        | ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
        | corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0),
        | sizes AS (SELECT doc_id, count(*) AS n_sh FROM corpus GROUP BY doc_id),
        | hits AS (SELECT doc_id, count(*) AS n_overlap
        |   FROM corpus JOIN ev USING (s) GROUP BY doc_id)
        |SELECT doc_id, n_sh, n_overlap,
        | round(n_overlap::DOUBLE / n_sh, 6) AS frac
        |FROM hits JOIN sizes USING (doc_id) ORDER BY doc_id""".stripMargin,
    "decontam_bloom" ->
      s"""WITH $shinglesSql,
        | kk AS (SELECT doc_id, s,
        |   ('0x' || substr(md5(s), 1, 8))::BIGINT AS k FROM sh),
        | hs(a, b) AS (VALUES
        |   (${DecontamBloomHashes(0)._1}, ${DecontamBloomHashes(0)._2}),
        |   (${DecontamBloomHashes(1)._1}, ${DecontamBloomHashes(1)._2})),
        | eb AS (SELECT DISTINCT
        |     (((a * (k % $DecontamBloomPrime)) % $DecontamBloomPrime + b)
        |       % $DecontamBloomPrime) % $DecontamBloomBits AS bit
        |   FROM kk CROSS JOIN hs WHERE doc_id % 97 = 0),
        | corpus AS (SELECT doc_id, s, k FROM kk WHERE doc_id % 97 <> 0),
        | sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM corpus GROUP BY doc_id),
        | pb AS (SELECT doc_id, s,
        |     (((a * (k % $DecontamBloomPrime)) % $DecontamBloomPrime + b)
        |       % $DecontamBloomPrime) % $DecontamBloomBits AS bit
        |   FROM corpus CROSS JOIN hs),
        | cand AS (SELECT doc_id, s FROM pb GROUP BY doc_id, s
        |   HAVING count(*) = sum(
        |     CASE WHEN bit IN (SELECT bit FROM eb) THEN 1 ELSE 0 END)),
        | nc AS (SELECT doc_id, count(*)::BIGINT AS n_cand FROM cand GROUP BY doc_id),
        | ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
        | hits AS (SELECT doc_id, count(*)::BIGINT AS n_overlap
        |   FROM cand JOIN ev USING (s) GROUP BY doc_id)
        |SELECT nc.doc_id, n_sh, n_cand,
        | coalesce(n_overlap, 0)::BIGINT AS n_overlap,
        | round(coalesce(n_overlap, 0)::DOUBLE / n_sh, 6) AS frac
        |FROM nc JOIN sizes USING (doc_id) LEFT JOIN hits USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "gopher_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        | wc AS (SELECT doc_id, w, count(*) AS c FROM
        |   (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY doc_id, w),
        | ws AS (SELECT doc_id, sum(c)::BIGINT AS n_words,
        |   (sum(c) - count(*))::BIGINT AS n_dup, max(c) AS top_w
        |   FROM wc GROUP BY doc_id),
        | bc AS (SELECT doc_id, bg, count(*) AS c FROM
        |   (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1])) AS bg
        |    FROM t WHERE len(toks) >= 2) GROUP BY doc_id, bg),
        | bs AS (SELECT doc_id, sum(c)::BIGINT AS n_bigrams, max(c) AS top_b
        |   FROM bc GROUP BY doc_id)
        |SELECT ws.doc_id, n_words,
        | round(n_dup::DOUBLE / n_words, 6) AS dup_word_frac,
        | round(top_w::DOUBLE / n_words, 6) AS top_word_frac,
        | round(top_b::DOUBLE / n_bigrams, 6) AS top_bigram_frac,
        | (CASE WHEN round(top_w::DOUBLE / n_words, 6) <= 0.125
        |       AND round(top_b::DOUBLE / n_bigrams, 6) <= 0.05
        |  THEN 1 ELSE 0 END)::BIGINT AS keep
        |FROM ws JOIN bs ON ws.doc_id = bs.doc_id ORDER BY ws.doc_id""".stripMargin,
    "ann_ivfpq" -> {
      val sub = 16
      // per-subspace code-assignment CTE (on NORMALIZED vectors)
      val codeCtes = (0 until 4).map { j =>
        val lo = j * sub + 1
        val hi = (j + 1) * sub
        s"""p$j AS (SELECT vec_id, cid AS c$j FROM (
           |   SELECT s.vec_id, b.cid,
           |     list_dot_product(s.sv, s.sv) + list_dot_product(b.sc, b.sc)
           |       - 2 * list_dot_product(s.sv, b.sc) AS d2
           |   FROM (SELECT vec_id, list_slice(vn, $lo, $hi) AS sv FROM en) s,
           |        (SELECT cid, list_slice(vn, $lo, $hi) AS sc FROM cb) b)
           | QUALIFY row_number() OVER (PARTITION BY vec_id
           |   ORDER BY round(d2, 6), cid) = 1)""".stripMargin
      }.mkString(",\n ")
      val adcTerms = (0 until 4).map { j =>
        val lo = j * sub + 1
        val hi = (j + 1) * sub
        s"""(list_dot_product(list_slice(q.vn, $lo, $hi), list_slice(q.vn, $lo, $hi))
           |   + list_dot_product(list_slice(b$j.vn, $lo, $hi), list_slice(b$j.vn, $lo, $hi))
           |   - 2 * list_dot_product(list_slice(q.vn, $lo, $hi), list_slice(b$j.vn, $lo, $hi)))""".stripMargin
      }.mkString(" + ")
      val cbJoins = (0 until 4)
        .map(j => s"JOIN cb b$j ON b$j.cid = codes.c$j").mkString(" ")
      s"""WITH $adaptiveKCte,
         | en AS (SELECT vec_id,
         |   list_transform(embedding::DOUBLE[],
         |     x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS vn
         |  FROM embeddings),
         | c AS (SELECT vec_id AS cent_id, vn AS cv
         |   FROM (SELECT * FROM en ORDER BY $seedOrderSql LIMIT (SELECT k FROM kk))),
         | sc AS (SELECT en.vec_id, c.cent_id,
         |     round(list_dot_product(en.vn, c.cv), 6) AS d FROM en, c),
         | a AS (SELECT vec_id, cent_id,
         |     row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cent_id) AS rn
         |   FROM sc),
         | cb AS (SELECT vec_id AS cid, vn FROM en WHERE vec_id < 8),
         | $codeCtes,
         | codes AS (SELECT vec_id AS c_id, c0, c1, c2, c3
         |   FROM p0 JOIN p1 USING (vec_id) JOIN p2 USING (vec_id)
         |     JOIN p3 USING (vec_id)),
         | lists AS (SELECT vec_id AS c_id, cent_id FROM a WHERE rn = 1),
         | probes AS (SELECT vec_id AS q_id, cent_id FROM a
         |   WHERE vec_id < 8 AND rn <= (SELECT np FROM kk)),
         | cand AS (SELECT p.q_id, l.c_id FROM probes p JOIN lists l
         |   USING (cent_id) WHERE p.q_id <> l.c_id),
         | adc AS (SELECT cand.q_id, cand.c_id, $adcTerms AS adc
         |   FROM cand JOIN codes USING (c_id)
         |     JOIN en q ON q.vec_id = cand.q_id $cbJoins),
         | short AS (SELECT q_id, c_id FROM (
         |     SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
         |       ORDER BY round(adc, 6), c_id) AS srn FROM adc)
         |   WHERE srn <= 50),
         | rer AS (SELECT s.q_id, s.c_id,
         |     round(list_dot_product(q.vn, cv.vn), 4) AS cos_sim
         |   FROM short s JOIN en q ON q.vec_id = s.q_id
         |     JOIN en cv ON cv.vec_id = s.c_id)
         |SELECT q_id, rnk, c_id, cos_sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos_sim DESC, c_id) AS rnk FROM rer)
         |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin
    },
    "ann_ivf_trained" -> annIvfTrainedOracle,
    // the persisted probe must return byte-identical rows to the inline
    // trained IVF — ONE oracle checks both, which is the whole point
    "ann_probe_persisted" -> annIvfTrainedOracle,
    "ann_probe_pq" -> {
      // trained-coarse cells (the published index's kmeans CTEs) + the
      // raw-first-8 PQ codebook on UNIT vectors: ADC shortlist, exact
      // cosine re-rank — replays the committed codes/codebook/lists
      // artifact end to end
      val sub = 16
      val codeCtes = (0 until 4).map { j =>
        val lo = j * sub + 1
        val hi = (j + 1) * sub
        s"""p$j AS (SELECT vec_id, cid AS c$j FROM (
           |   SELECT s.vec_id, b.cid,
           |     list_dot_product(s.sv, s.sv) + list_dot_product(b.sc, b.sc)
           |       - 2 * list_dot_product(s.sv, b.sc) AS d2
           |   FROM (SELECT vec_id, list_slice(vn, $lo, $hi) AS sv FROM en) s,
           |        (SELECT cid, list_slice(vn, $lo, $hi) AS sc FROM cb) b)
           | QUALIFY row_number() OVER (PARTITION BY vec_id
           |   ORDER BY round(d2, 6), cid) = 1)""".stripMargin
      }.mkString(",\n ")
      val adcTerms = (0 until 4).map { j =>
        val lo = j * sub + 1
        val hi = (j + 1) * sub
        s"""(list_dot_product(list_slice(q.vn, $lo, $hi), list_slice(q.vn, $lo, $hi))
           |   + list_dot_product(list_slice(b$j.vn, $lo, $hi), list_slice(b$j.vn, $lo, $hi))
           |   - 2 * list_dot_product(list_slice(q.vn, $lo, $hi), list_slice(b$j.vn, $lo, $hi)))""".stripMargin
      }.mkString(" + ")
      val cbJoins = (0 until 4)
        .map(j => s"JOIN cb b$j ON b$j.cid = codes.c$j").mkString(" ")
      s"""${kmeansCtesWith("(SELECT k FROM kk)", pre = s"$adaptiveKCte,\n ")},
         | en AS (SELECT vec_id,
         |   list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn
         |  FROM e),
         | sq AS (SELECT e.vec_id, c.cid,
         |     e.x2 + list_dot_product(c.cv, c.cv)
         |       - 2 * list_dot_product(e.v, c.cv) AS d2
         |   FROM e, c2 c WHERE e.vec_id < 8),
         | probes AS (SELECT vec_id AS q_id, cid AS cent_id FROM (
         |     SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |       ORDER BY round(d2, 6), cid) AS rn FROM sq)
         |   WHERE rn <= (SELECT np FROM kk)),
         | lists AS (SELECT vec_id AS c_id, cid AS cent_id FROM a3),
         | cb AS (SELECT vec_id AS cid, vn FROM en WHERE vec_id < 8),
         | $codeCtes,
         | codes AS (SELECT vec_id AS c_id, c0, c1, c2, c3
         |   FROM p0 JOIN p1 USING (vec_id) JOIN p2 USING (vec_id)
         |     JOIN p3 USING (vec_id)),
         | cand AS (SELECT p.q_id, l.c_id FROM probes p JOIN lists l
         |   USING (cent_id) WHERE p.q_id <> l.c_id),
         | adc AS (SELECT cand.q_id, cand.c_id, $adcTerms AS adc
         |   FROM cand JOIN codes USING (c_id)
         |     JOIN en q ON q.vec_id = cand.q_id $cbJoins),
         | short AS (SELECT q_id, c_id FROM (
         |     SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
         |       ORDER BY round(adc, 6), c_id) AS srn FROM adc)
         |   WHERE srn <= 50),
         | rer AS (SELECT s.q_id, s.c_id,
         |     round(list_dot_product(q.vn, cv.vn), 4) AS cos_sim
         |   FROM short s JOIN en q ON q.vec_id = s.q_id
         |     JOIN en cv ON cv.vec_id = s.c_id)
         |SELECT q_id, rnk, c_id, cos_sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos_sim DESC, c_id) AS rnk FROM rer)
         |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin
    },
    "merge_upsert" ->
      """WITH base AS (SELECT doc_id, n_chars FROM documents WHERE doc_id < 400),
        | ch AS (SELECT doc_id, n_chars FROM documents WHERE doc_id >= 100)
        |SELECT doc_id, n_chars, 'changes' AS origin FROM ch
        |UNION ALL
        |SELECT b.doc_id, b.n_chars, 'base' AS origin FROM base b
        |WHERE NOT EXISTS (SELECT 1 FROM ch WHERE ch.doc_id = b.doc_id)
        |ORDER BY doc_id""".stripMargin,
    "text_normalize" ->
      """WITH n AS (SELECT doc_id, text,
        |   trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS norm_hash,
        | length(norm)::INT AS n_chars_norm,
        | (length(text) - length(norm))::INT AS chars_removed
        |FROM n ORDER BY doc_id""".stripMargin,
    "embed_pq" -> {
      // one assignment CTE per subspace: slice both sides, nearest codeword
      // by (round(d2, 6), cid) — identical tie rule to the Spark argmin
      val sub = 16
      val perSub = (0 until 4).map { j =>
        val lo = j * sub + 1
        val hi = (j + 1) * sub
        s"""a$j AS (SELECT vec_id, cid, d2 FROM (
           |   SELECT s.vec_id, c.cid,
           |     list_dot_product(s.sv, s.sv) + list_dot_product(c.sc, c.sc)
           |       - 2 * list_dot_product(s.sv, c.sc) AS d2
           |   FROM (SELECT vec_id, list_slice(v, $lo, $hi) AS sv FROM e) s,
           |        (SELECT cid, list_slice(v, $lo, $hi) AS sc FROM cb) c)
           | QUALIFY row_number() OVER (PARTITION BY vec_id
           |   ORDER BY round(d2, 6), cid) = 1)""".stripMargin
      }.mkString(",\n ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | cb AS (SELECT vec_id AS cid, v FROM e WHERE vec_id < 8),
         | $perSub
         |SELECT e.vec_id, a0.cid AS c0, a1.cid AS c1, a2.cid AS c2, a3.cid AS c3,
         | round(a0.d2 + a1.d2 + a2.d2 + a3.d2, 4) AS err
         |FROM e JOIN a0 USING (vec_id) JOIN a1 USING (vec_id)
         | JOIN a2 USING (vec_id) JOIN a3 USING (vec_id)
         |ORDER BY vec_id""".stripMargin
    },
    "embed_pq_trained" -> {
      // one full Lloyd chain per subspace (c0 -> a1 -> c1 -> a2 -> c2 ->
      // a3), each over the SLICED vectors — the per-subspace twin of the
      // embed_kmeans replay, same tie rule / rounding / empty-cluster
      // coalesce
      val sub = 16
      val k = 8
      def assign(a: String, e: String, c: String) =
        s"""$a AS (SELECT vec_id, v, cid, d2 FROM (
           |   SELECT e.vec_id, e.v, c.cid,
           |     e.x2 + list_dot_product(c.cv, c.cv)
           |       - 2 * list_dot_product(e.v, c.cv) AS d2
           |   FROM $e e, $c c)
           |  QUALIFY row_number() OVER (PARTITION BY vec_id
           |    ORDER BY round(d2, 6), cid) = 1)""".stripMargin
      def update(u: String, a: String, cPrev: String, cNew: String) =
        s"""$u AS (SELECT cid, i, round(avg(v[i]), 6) AS m
           |   FROM $a, unnest(generate_series(1, len(v))) AS t(i)
           |   GROUP BY cid, i),
           | ${cNew}raw AS (SELECT cid, list(m ORDER BY i) AS cv
           |   FROM $u GROUP BY cid),
           | $cNew AS (SELECT $cPrev.cid, coalesce(${cNew}raw.cv, $cPrev.cv) AS cv
           |   FROM $cPrev LEFT JOIN ${cNew}raw USING (cid))""".stripMargin
      def chain(j: Int): String = {
        val lo = j * sub + 1
        val hi = (j + 1) * sub
        Seq(
          s"""e$j AS (SELECT vec_id, list_slice(v, $lo, $hi) AS v,
             |   list_dot_product(list_slice(v, $lo, $hi),
             |                    list_slice(v, $lo, $hi)) AS x2
             |  FROM eb)""".stripMargin,
          s"""c0_$j AS (SELECT vec_id AS cid,
             |   list_transform(v, x -> round(x, 6)) AS cv
             |  FROM (SELECT * FROM e$j ORDER BY $seedOrderSql LIMIT $k))""".stripMargin,
          assign(s"a1_$j", s"e$j", s"c0_$j"),
          update(s"u1_$j", s"a1_$j", s"c0_$j", s"c1_$j"),
          assign(s"a2_$j", s"e$j", s"c1_$j"),
          update(s"u2_$j", s"a2_$j", s"c1_$j", s"c2_$j"),
          assign(s"a3_$j", s"e$j", s"c2_$j")).mkString(",\n ")
      }
      s"""WITH eb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | ${(0 until 4).map(chain).mkString(",\n ")}
         |SELECT eb.vec_id, a3_0.cid AS c0, a3_1.cid AS c1, a3_2.cid AS c2,
         | a3_3.cid AS c3,
         | round(a3_0.d2 + a3_1.d2 + a3_2.d2 + a3_3.d2, 4) AS err
         |FROM eb JOIN a3_0 USING (vec_id) JOIN a3_1 USING (vec_id)
         | JOIN a3_2 USING (vec_id) JOIN a3_3 USING (vec_id)
         |ORDER BY vec_id""".stripMargin
    },
    "dup_segments" ->
      """WITH segs AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 8
        |    THEN list_transform(generate_series(1, len(toks) - 7),
        |                        i -> array_to_string(list_slice(toks, i, i + 7), ' '))
        |    ELSE [array_to_string(toks, ' ')] END) AS seg
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        | sdf AS (SELECT seg, count(*) AS ndocs
        |   FROM (SELECT DISTINCT doc_id, seg FROM segs) GROUP BY seg)
        |SELECT s.doc_id, count(*)::BIGINT AS n_segs,
        | sum(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup,
        | round(sum(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
        |   AS dup_frac
        |FROM segs s JOIN sdf USING (seg) GROUP BY s.doc_id ORDER BY doc_id""".stripMargin,
    "span_scrub" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        | b AS (SELECT doc_id, k,
        |     array_to_string(toks[k*8+1 : k*8+8], ' ') AS block
        |   FROM t, unnest(generate_series(0,
        |     ceil(len(toks) / 8.0)::INT - 1)) AS u(k)),
        | f AS (SELECT block, min(ROW(doc_id, k)) AS first_key
        |   FROM b GROUP BY block),
        | kept AS (SELECT b.doc_id, b.k, b.block
        |   FROM b JOIN f ON b.block = f.block
        |   WHERE ROW(b.doc_id, b.k) = f.first_key),
        | reb AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
        |     sum(len(string_split(block, ' ')))::BIGINT AS n_tokens_after,
        |     string_agg(block, ' ' ORDER BY k) AS rebuilt
        |   FROM kept GROUP BY doc_id),
        | tot AS (SELECT doc_id, count(*)::BIGINT AS n_blocks
        |   FROM b GROUP BY doc_id)
        |SELECT tot.doc_id AS doc_id, n_blocks, coalesce(n_kept, 0) AS n_kept,
        | coalesce(n_tokens_after, 0) AS n_tokens_after,
        | md5(coalesce(rebuilt, '')) AS text_md5
        |FROM tot LEFT JOIN reb ON tot.doc_id = reb.doc_id
        |ORDER BY tot.doc_id""".stripMargin,
    "dsir_weights" ->
      """WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |   FROM documents),
        | counts AS (SELECT w,
        |   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS ct,
        |   sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)::BIGINT AS cc
        |   FROM toks GROUP BY w),
        | tot AS (SELECT sum(ct)::BIGINT AS nt, sum(cc)::BIGINT AS nc,
        |   count(*)::BIGINT AS vsz FROM counts),
        | wts AS (SELECT w, ln((ct + 1.0) / (nt + vsz)) - ln((cc + 1.0) / (nc + vsz)) AS lw
        |   FROM counts, tot)
        |SELECT doc_id, round(sum(lw), 6) AS dsir_w, count(*)::BIGINT AS n_toks
        |FROM toks JOIN wts USING (w) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "semdedup" ->
      s"""$kmeansCtes,
        | sz AS (SELECT cid, count(*) AS n FROM a3 GROUP BY cid),
        | sd AS (SELECT a3.vec_id, a3.cid,
        |     CASE WHEN n <= 40 THEN 0
        |          ELSE a3.vec_id % CAST(ceil(n / 40.0) AS BIGINT) END AS sub,
        |     list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn
        |   FROM a3 JOIN sz USING (cid)),
        | pr AS (SELECT a.vec_id AS da, b.vec_id AS db,
        |     round(list_dot_product(a.vn, b.vn), 4) AS cos_sim
        |   FROM sd a JOIN sd b ON a.cid = b.cid AND a.sub = b.sub
        |     AND a.vec_id < b.vec_id)
        |SELECT db AS pruned_id, min(da) AS keeper_id, max(cos_sim) AS max_cos
        |FROM pr WHERE cos_sim >= 0.3 GROUP BY db ORDER BY pruned_id""".stripMargin,
    "unigram_ppl" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |   FROM documents),
        | cnt AS (SELECT w, count(*)::BIGINT AS c FROM toks GROUP BY w),
        | tot AS (SELECT sum(c)::BIGINT AS n, count(*)::BIGINT AS v FROM cnt),
        | lp AS (SELECT w, ln((c + 1.0) / (n + v)) AS lp FROM cnt, tot)
        |SELECT doc_id, round(exp(-sum(lp) / count(*)), 4) AS ppl,
        | count(*)::BIGINT AS n_toks
        |FROM toks JOIN lp USING (w) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "corpus_diff" ->
      """WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
        | v1 AS (SELECT doc_id, h AS h1 FROM h WHERE doc_id < 400),
        | v2 AS (SELECT doc_id, h AS h2 FROM h WHERE doc_id >= 100),
        | d AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |   CASE WHEN h1 IS NULL THEN 'added'
        |        WHEN h2 IS NULL THEN 'removed'
        |        WHEN h1 <> h2 THEN 'changed'
        |        ELSE 'unchanged' END AS status
        |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT status, count(*)::BIGINT AS n_docs,
        | min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM d GROUP BY status ORDER BY status""".stripMargin,
    "quality_tiers" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |   FROM documents),
        | cnt AS (SELECT w, count(*)::BIGINT AS c FROM toks GROUP BY w),
        | tot AS (SELECT sum(c)::BIGINT AS n, count(*)::BIGINT AS v FROM cnt),
        | lp AS (SELECT w, ln((c + 1.0) / (n + v)) AS lp FROM cnt, tot),
        | ppl AS (SELECT doc_id, round(exp(-sum(lp) / count(*)), 4) AS ppl
        |   FROM toks JOIN lp USING (w) GROUP BY doc_id),
        | tiers AS (SELECT doc_id, ppl,
        |   ntile(3) OVER (ORDER BY ppl, doc_id) AS tier FROM ppl)
        |SELECT tier, count(*)::BIGINT AS n_docs,
        | round(min(ppl), 4) AS min_ppl, round(max(ppl), 4) AS max_ppl
        |FROM tiers GROUP BY tier ORDER BY tier""".stripMargin,
    "corpus_shuffle" ->
      """WITH pos AS (SELECT doc_id,
        |   row_number() OVER (ORDER BY md5('shuf|' || CAST(doc_id AS VARCHAR)),
        |                      doc_id) AS pos
        |  FROM documents)
        |SELECT doc_id, pos, (pos - 1) % 16 AS shard FROM pos ORDER BY pos""".stripMargin,
    "ann_sq8" ->
      """WITH e AS (SELECT vec_id,
        |   list_transform(embedding::DOUBLE[],
        |     x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS vn
        |  FROM embeddings),
        | eq AS (SELECT vec_id, vn, list_transform(vn, x -> round(x, 6)) AS vq FROM e),
        | dims AS (SELECT i, min(vq[i]) AS mn, max(vq[i]) AS mx
        |   FROM eq, unnest(generate_series(1, len(vq))) AS t(i) GROUP BY i),
        | mm AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM dims),
        | dq AS (SELECT vec_id, vn,
        |   list_transform(generate_series(1, len(vq)), i ->
        |     mns[i] + (CASE WHEN mxs[i] = mns[i] THEN 0.0
        |               ELSE round(255 * (vq[i] - mns[i]) / (mxs[i] - mns[i])) END)
        |              * (mxs[i] - mns[i]) / 255) AS dq
        |   FROM eq, mm),
        | sl AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id, q.vn AS qv, c.vn AS cv,
        |    round(list_dot_product(q.dq, c.dq), 4) AS approx
        |   FROM dq q, dq c WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id
        |   QUALIFY row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY approx DESC, c.vec_id) <= 12)
        |SELECT q_id, rnk, c_id, cos_sim FROM (
        |  SELECT q_id, c_id, round(list_dot_product(qv, cv), 4) AS cos_sim,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY round(list_dot_product(qv, cv), 4) DESC, c_id) AS rnk
        |  FROM sl)
        |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin,
    "minhash_est_err" ->
      s"""WITH $shinglesSql,
        | hh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS h1
        |   FROM sh),
        | mh AS (SELECT doc_id, seed,
        |   min(((2 * seed + 1) * h1 + (seed * 2654435761) % 2147483647) % 2147483647) AS mh
        |   FROM hh, unnest(generate_series(0, 11)) AS u(seed) GROUP BY doc_id, seed),
        | bands AS (SELECT doc_id, seed % 4 AS band,
        |   md5(string_agg(seed || ':' || mh, '|' ORDER BY seed)) AS sig
        |   FROM mh GROUP BY doc_id, seed % 4),
        | cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |   FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        |   WHERE a.doc_id < b.doc_id),
        | sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        | inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
        |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        | p AS (SELECT c.da, c.db, round(ni::DOUBLE / (sa.n + sb.n - ni), 6) AS jac
        |   FROM cand c JOIN inter i ON c.da = i.da AND c.db = i.db
        |    JOIN sizes sa ON c.da = sa.doc_id JOIN sizes sb ON c.db = sb.doc_id
        |   WHERE round(ni::DOUBLE / (sa.n + sb.n - ni), 6) >= 0.7),
        | est AS (SELECT p.da, p.db, p.jac,
        |    sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) / 12.0 AS e
        |   FROM p JOIN mh ma ON ma.doc_id = p.da
        |     JOIN mh mb ON mb.doc_id = p.db AND mb.seed = ma.seed
        |   GROUP BY p.da, p.db, p.jac)
        |SELECT da, db, jac, round(e, 6) AS jac_est, round(abs(jac - e), 6) AS abs_err
        |FROM est ORDER BY da, db""".stripMargin,
    "source_overlap" ->
      s"""WITH $shinglesSql,
        | hh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS h1
        |   FROM sh),
        | mh AS (SELECT doc_id, seed,
        |   min(((2 * seed + 1) * h1 + (seed * 2654435761) % 2147483647) % 2147483647) AS mh
        |   FROM hh, unnest(generate_series(0, 11)) AS u(seed) GROUP BY doc_id, seed),
        | bands AS (SELECT doc_id, seed % 4 AS band,
        |   md5(string_agg(seed || ':' || mh, '|' ORDER BY seed)) AS sig
        |   FROM mh GROUP BY doc_id, seed % 4),
        | cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |   FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        |   WHERE a.doc_id < b.doc_id),
        | sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        | inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
        |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        | p AS (SELECT c.da, c.db
        |   FROM cand c JOIN inter i ON c.da = i.da AND c.db = i.db
        |    JOIN sizes sa ON c.da = sa.doc_id JOIN sizes sb ON c.db = sb.doc_id
        |   WHERE round(ni::DOUBLE / (sa.n + sb.n - ni), 6) >= 0.7)
        |SELECT least(a.source, b.source) AS src_a,
        |  greatest(a.source, b.source) AS src_b, count(*)::BIGINT AS n_pairs
        |FROM p JOIN documents a ON p.da = a.doc_id
        |  JOIN documents b ON p.db = b.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "doc_entropy" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        | c AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM t GROUP BY doc_id, w)
        |SELECT doc_id, sum(c)::BIGINT AS n_toks, count(*)::BIGINT AS n_distinct,
        |  round((ln(sum(c)) - sum(c * ln(c)) / sum(c)) / ln(2.0), 6) AS entropy_bits
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_minhash_incr" ->
      s"""WITH $shinglesSql,
        | hh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS h1
        |   FROM sh),
        | mh AS (SELECT doc_id, seed,
        |   min(((2 * seed + 1) * h1 + (seed * 2654435761) % 2147483647) % 2147483647) AS mh
        |   FROM hh, unnest(generate_series(0, 11)) AS u(seed) GROUP BY doc_id, seed),
        | bands AS (SELECT doc_id, seed % 4 AS band,
        |   md5(string_agg(seed || ':' || mh, '|' ORDER BY seed)) AS sig
        |   FROM mh GROUP BY doc_id, seed % 4),
        | cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
        |   FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        |   WHERE a.doc_id >= 400 AND b.doc_id < 400),
        | sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        | inter AS (SELECT c.new_id, c.old_id, count(*) AS ni
        |   FROM cand c JOIN sh a ON a.doc_id = c.new_id
        |    JOIN sh b ON b.doc_id = c.old_id AND b.s = a.s
        |   GROUP BY 1, 2)
        |SELECT new_id, old_id, round(ni::DOUBLE / (sa.n + sb.n - ni), 6) AS jac
        |FROM inter JOIN sizes sa ON new_id = sa.doc_id
        |  JOIN sizes sb ON old_id = sb.doc_id
        |WHERE round(ni::DOUBLE / (sa.n + sb.n - ni), 6) >= 0.7
        |ORDER BY new_id, old_id""".stripMargin,
    "vocab_zipf" ->
      """WITH f AS (SELECT w, count(*)::BIGINT AS f
        |   FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |   GROUP BY w),
        | r AS (SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r FROM f),
        | s AS (SELECT count(*)::BIGINT AS n, sum(f)::BIGINT AS n_tokens,
        |   sum(ln(r)) AS sx, sum(ln(f)) AS sy, sum(ln(r) * ln(f)) AS sxy,
        |   sum(ln(r) * ln(r)) AS sxx, sum(ln(f) * ln(f)) AS syy FROM r)
        |SELECT n AS n_vocab, n_tokens,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) + 0.0
        |    AS zipf_slope,
        |  round((n * sxy - sx * sy) * (n * sxy - sx * sy)
        |        / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS zipf_r2
        |FROM s""".stripMargin,
    "bigram_ppl" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |   FROM documents WHERE len(string_split(text, ' ')) >= 2),
        | bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        |   FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)),
        | c2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM bg GROUP BY w1, w2),
        | c1 AS (SELECT w1, count(*)::BIGINT AS c1 FROM bg GROUP BY w1),
        | v AS (SELECT count(*)::BIGINT AS v FROM
        |   (SELECT w1 AS w FROM bg UNION SELECT w2 FROM bg)),
        | lp AS (SELECT c2.w1, c2.w2,
        |     ln((c2.c2 + 1)::DOUBLE / (c1.c1 + v.v)) AS lp
        |   FROM c2 JOIN c1 USING (w1), v)
        |SELECT doc_id, round(exp(-sum(lp) / count(*)), 4) AS ppl,
        | count(*)::BIGINT AS n_bigrams
        |FROM bg JOIN lp USING (w1, w2) GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "bm25_topk" ->
      """WITH d AS (SELECT doc_id,
        |     len(string_split(text, ' '))::BIGINT AS dl FROM documents),
        | st AS (SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM d),
        | tf AS (SELECT doc_id, w, count(*)::BIGINT AS tf FROM (
        |     SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |     FROM documents)
        |   WHERE w IN ('spark', 'join', 'window') GROUP BY doc_id, w),
        | dfq AS (SELECT w, count(*)::BIGINT AS df FROM tf GROUP BY w),
        | sc AS (SELECT tf.doc_id, tf.w,
        |     ln(1.0 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5))
        |       * (tf.tf * 2.2)
        |       / (tf.tf + 1.2 * (0.25 + 0.75 * d.dl / st.avgdl)) AS s
        |   FROM tf JOIN dfq USING (w) JOIN d USING (doc_id), st),
        | agg AS (SELECT doc_id,
        |     coalesce(max(CASE WHEN w = 'spark' THEN s END), 0.0)
        |     + coalesce(max(CASE WHEN w = 'join' THEN s END), 0.0)
        |     + coalesce(max(CASE WHEN w = 'window' THEN s END), 0.0) AS score,
        |     count(*)::BIGINT AS n_hit
        |   FROM sc GROUP BY doc_id)
        |SELECT doc_id, round(score, 6) AS score, n_hit FROM agg
        |ORDER BY round(score, 6) DESC, doc_id LIMIT 10""".stripMargin,
    "pmi_bigrams" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |   FROM documents),
        | uni AS (SELECT w, count(*)::BIGINT AS c1 FROM (
        |     SELECT unnest(toks) AS w FROM t) GROUP BY w),
        | bg AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
        |   FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        |   WHERE len(toks) >= 2),
        | c2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM bg
        |   GROUP BY w1, w2 HAVING count(*) >= 5),
        | tot AS (SELECT (SELECT sum(c1)::BIGINT FROM uni) AS n1,
        |   (SELECT count(*)::BIGINT FROM bg) AS n2)
        |SELECT c2.w1, c2.w2, c2.c2,
        | round(ln((c2.c2 / tot.n2) / ((a.c1 / tot.n1) * (b.c1 / tot.n1))), 6)
        |   + 0.0 AS pmi
        |FROM c2 JOIN uni a ON a.w = c2.w1 JOIN uni b ON b.w = c2.w2, tot
        |ORDER BY pmi DESC, c2.w1, c2.w2 LIMIT 20""".stripMargin,
    "semantic_decontam" ->
      """WITH e AS (SELECT vec_id,
        |     list_transform(embedding::DOUBLE[], x -> x) AS v
        |   FROM embeddings),
        | n AS (SELECT vec_id,
        |     list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn
        |   FROM e),
        | ev AS (SELECT vec_id AS e_id, vn AS evn FROM n
        |   WHERE vec_id % 97 = 0),
        | c AS (SELECT vec_id, vn FROM n WHERE vec_id % 97 <> 0),
        | p AS (SELECT c.vec_id, ev.e_id,
        |     round(list_dot_product(c.vn, ev.evn), 4) AS cos
        |   FROM c, ev),
        | m AS (SELECT vec_id,
        |     min(struct_pack(nc := -cos, e_id := e_id)) AS f FROM p
        |   GROUP BY vec_id)
        |SELECT vec_id, f.e_id AS near_eval, -f.nc AS max_cos
        |FROM m WHERE -f.nc >= 0.3 ORDER BY vec_id""".stripMargin,
    "semantic_decontam_ann" ->
      s"""${kmeansCtesWith("(SELECT k FROM kk)", pre = s"$adaptiveKCte,\n ")},
        | sq AS (SELECT e.vec_id, c.cid,
        |     e.x2 + list_dot_product(c.cv, c.cv)
        |       - 2 * list_dot_product(e.v, c.cv) AS d2
        |   FROM e, c2 c WHERE e.vec_id % 97 = 0),
        | probes AS (SELECT vec_id AS e_id, cid AS cent_id FROM (
        |     SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |       ORDER BY round(d2, 6), cid) AS rn FROM sq)
        |   WHERE rn <= (SELECT np FROM kk)),
        | lists AS (SELECT vec_id AS c_id, cid AS cent_id FROM a3
        |   WHERE vec_id % 97 <> 0),
        | nrm AS (SELECT vec_id,
        |     list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS vn
        |   FROM e),
        | cand AS (SELECT l.c_id AS vec_id,
        |     min(struct_pack(nc := -round(list_dot_product(a.vn, b.vn), 4),
        |                     e_id := p.e_id)) AS f
        |   FROM probes p JOIN lists l USING (cent_id)
        |     JOIN nrm a ON a.vec_id = p.e_id JOIN nrm b ON b.vec_id = l.c_id
        |   GROUP BY l.c_id)
        |SELECT vec_id, f.e_id AS near_eval, -f.nc AS max_cos
        |FROM cand WHERE -f.nc >= 0.3 ORDER BY vec_id""".stripMargin,
    "score_rank_norm" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
        |   row_number() OVER (PARTITION BY source
        |     ORDER BY n_chars, doc_id) AS rg,
        |   count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT doc_id, source, n_chars,
        | CASE WHEN n > 1 THEN round((rg - 1.0) / (n - 1), 6)
        |      ELSE 0.0 END AS pct_rank
        |FROM r ORDER BY doc_id""".stripMargin,
    "weighted_sample" ->
      """WITH d AS (SELECT doc_id, source,
        |   len(string_split(text, ' '))::BIGINT AS w,
        |   greatest(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
        |     / 4294967296.0, 1e-12) AS u
        |  FROM documents)
        |SELECT doc_id, source, w, round(ln(u) / w, 6) + 0.0 AS key
        |FROM d ORDER BY key DESC, doc_id LIMIT 50""".stripMargin,
    "trigram_ppl" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |   FROM documents WHERE len(string_split(text, ' ')) >= 3),
        | tg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2,
        |     toks[i + 2] AS w3
        |   FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(i)),
        | c3 AS (SELECT w1, w2, w3, count(*)::BIGINT AS c3
        |   FROM tg GROUP BY w1, w2, w3),
        | c12 AS (SELECT w1, w2, sum(c3)::BIGINT AS c12,
        |     count(*)::BIGINT AS nt12 FROM c3 GROUP BY w1, w2),
        | m23 AS (SELECT w2, w3, count(*)::BIGINT AS n23
        |   FROM c3 GROUP BY w2, w3),
        | d2 AS (SELECT w2, count(*)::BIGINT AS nd2,
        |     count(DISTINCT w3)::BIGINT AS n2d FROM c3 GROUP BY w2),
        | c3c AS (SELECT w3, count(*)::BIGINT AS nd3
        |   FROM (SELECT DISTINCT w2, w3 FROM c3) GROUP BY w3),
        | ndd AS (SELECT count(*)::BIGINT AS ndd
        |   FROM (SELECT DISTINCT w2, w3 FROM c3)),
        | lm AS (SELECT c3.w1, c3.w2, c3.w3,
        |     ln(greatest(c3.c3 - 0.75, 0.0) / c12.c12
        |        + 0.75 * c12.nt12 / c12.c12 *
        |          (greatest(m23.n23 - 0.75, 0.0) / d2.nd2
        |           + 0.75 * d2.n2d / d2.nd2 *
        |             (c3c.nd3 / ndd.ndd))) AS lp
        |   FROM c3
        |     JOIN c12 ON c12.w1 = c3.w1 AND c12.w2 = c3.w2
        |     JOIN m23 ON m23.w2 = c3.w2 AND m23.w3 = c3.w3
        |     JOIN d2 ON d2.w2 = c3.w2
        |     JOIN c3c ON c3c.w3 = c3.w3, ndd)
        |SELECT doc_id, round(exp(-sum(lp) / count(*)), 4) AS ppl,
        | count(*)::BIGINT AS n_trigrams
        |FROM tg JOIN lm USING (w1, w2, w3) GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "fourgram_ppl" ->
      // pruned interpolated KN at order 4: kept types (c4 >= minCount)
      // score the full recursion, everything else backs off to the
      // trigram-level continuation LM — p3 computed ONCE in its CTE and
      // reused by both branches, exactly like the Spark plan
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |   FROM documents WHERE len(string_split(text, ' ')) >= 4),
        | qg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2,
        |     toks[i + 2] AS w3, toks[i + 3] AS w4
        |   FROM t, unnest(generate_series(1, len(toks) - 3)) AS u(i)),
        | c4 AS (SELECT w1, w2, w3, w4, count(*)::BIGINT AS c4
        |   FROM qg GROUP BY w1, w2, w3, w4),
        | c123 AS (SELECT w1, w2, w3, sum(c4)::BIGINT AS c123,
        |     count(*)::BIGINT AS nt123 FROM c4 GROUP BY w1, w2, w3),
        | m234 AS (SELECT w2, w3, w4, count(*)::BIGINT AS n234
        |   FROM c4 GROUP BY w2, w3, w4),
        | d23 AS (SELECT w2, w3, count(*)::BIGINT AS nd23,
        |     count(DISTINCT w4)::BIGINT AS n23d FROM c4 GROUP BY w2, w3),
        | m34 AS (SELECT w3, w4, count(*)::BIGINT AS n34
        |   FROM m234 GROUP BY w3, w4),
        | d3 AS (SELECT w3, count(*)::BIGINT AS nd3,
        |     count(DISTINCT w4)::BIGINT AS n3d FROM m234 GROUP BY w3),
        | cw4 AS (SELECT w4, count(*)::BIGINT AS nw4
        |   FROM (SELECT DISTINCT w3, w4 FROM m234) GROUP BY w4),
        | ndd AS (SELECT count(*)::BIGINT AS ndd
        |   FROM (SELECT DISTINCT w3, w4 FROM m234)),
        | lm3 AS (SELECT m234.w2, m234.w3, m234.w4,
        |     greatest(m234.n234 - 0.75, 0.0) / d23.nd23
        |       + 0.75 * d23.n23d / d23.nd23 *
        |         (greatest(m34.n34 - 0.75, 0.0) / d3.nd3
        |          + 0.75 * d3.n3d / d3.nd3 *
        |            (cw4.nw4 / ndd.ndd)) AS p3
        |   FROM m234
        |     JOIN d23 ON d23.w2 = m234.w2 AND d23.w3 = m234.w3
        |     JOIN m34 ON m34.w3 = m234.w3 AND m34.w4 = m234.w4
        |     JOIN d3 ON d3.w3 = m234.w3
        |     JOIN cw4 ON cw4.w4 = m234.w4, ndd),
        | lm4 AS (SELECT c4.w1, c4.w2, c4.w3, c4.w4,
        |     greatest(c4.c4 - 0.75, 0.0) / c123.c123
        |       + 0.75 * c123.nt123 / c123.c123 * lm3.p3 AS p4
        |   FROM c4
        |     JOIN c123 ON c123.w1 = c4.w1 AND c123.w2 = c4.w2
        |       AND c123.w3 = c4.w3
        |     JOIN lm3 ON lm3.w2 = c4.w2 AND lm3.w3 = c4.w3
        |       AND lm3.w4 = c4.w4
        |   WHERE c4.c4 >= $FourgramMinCount)
        |SELECT doc_id, round(exp(-sum(ln(coalesce(lm4.p4, lm3.p3)))
        |   / count(*)), 4) AS ppl,
        | count(*)::BIGINT AS n_fourgrams
        |FROM qg JOIN lm3 USING (w2, w3, w4)
        |  LEFT JOIN lm4 USING (w1, w2, w3, w4)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "source_report" ->
      """WITH d AS (SELECT source, lang, text,
        |     string_split(text, ' ') AS toks FROM documents),
        | f AS (SELECT source, lang,
        |   len(toks)::BIGINT AS n_tok,
        |   list_sum(list_transform(toks, x -> length(x)))::DOUBLE
        |     / len(toks) AS mean_len,
        |   len(list_filter(toks,
        |     t -> t IN ('the','a','of','and','is','in','to')))::DOUBLE
        |     / len(toks) AS stop_ratio,
        |   (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE
        |     / length(text) AS sym_ratio
        |   FROM d)
        |SELECT source, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
        | round(avg(mean_len), 6) AS avg_tok_len,
        | round(avg(stop_ratio), 6) AS avg_stop_ratio,
        | round(avg(sym_ratio), 6) AS avg_sym_ratio,
        | round(avg(CASE WHEN n_tok BETWEEN 5 AND 100000
        |     AND mean_len BETWEEN 2 AND 12
        |     AND stop_ratio >= 0.01 AND sym_ratio <= 0.2
        |   THEN 1 ELSE 0 END), 6) AS keep_rate,
        | count(DISTINCT lang)::BIGINT AS n_langs
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    "vocab_heaps" ->
      """WITH per AS (SELECT source, count(*)::BIGINT AS n_tokens,
        |     count(DISTINCT w)::BIGINT AS n_vocab
        |   FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |         FROM documents) GROUP BY source),
        | m AS (SELECT count(*)::BIGINT AS n,
        |   sum(ln(n_tokens)) AS sx, sum(ln(n_vocab)) AS sy,
        |   sum(ln(n_tokens) * ln(n_vocab)) AS sxy,
        |   sum(ln(n_tokens) * ln(n_tokens)) AS sxx,
        |   sum(ln(n_vocab) * ln(n_vocab)) AS syy FROM per)
        |SELECT n AS n_sources,
        | round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) + 0.0
        |   AS heaps_beta,
        | round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4)
        |   + 0.0 AS heaps_lnk,
        | round((n * sxy - sx * sy) * (n * sxy - sx * sy)
        |       / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS heaps_r2
        |FROM m""".stripMargin,
    "embed_outliers" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |   FROM embeddings),
        | c AS (SELECT label, i, avg(v[i]) AS ci
        |   FROM e, unnest(generate_series(1, 64)) AS u(i) GROUP BY label, i),
        | cent AS (SELECT label, list(ci ORDER BY i) AS cv FROM c GROUP BY label),
        | d AS (SELECT e.vec_id, e.label,
        |   round(sqrt(list_sum(list_transform(generate_series(1, 64),
        |     i -> (v[i] - cv[i]) * (v[i] - cv[i])))), 4) AS dist
        |   FROM e JOIN cent USING (label)),
        | r AS (SELECT *, row_number() OVER (PARTITION BY label
        |     ORDER BY dist DESC, vec_id) AS rnk FROM d)
        |SELECT label, rnk, vec_id, dist FROM r WHERE rnk <= 3
        |ORDER BY label, rnk""".stripMargin,
    "neardup_sweep" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        | w AS (SELECT j, list_transform(generate_series(1, 64), i ->
        |     CASE WHEN ('0x' || substr(md5(CAST(i - 1 AS VARCHAR)), j + 1, 1))::INT % 2 = 0
        |          THEN 1.0 ELSE -1.0 END) AS wv
        |   FROM generate_series(0, 3) AS t(j)),
        | sigv AS (SELECT vec_id,
        |     sum(CASE WHEN list_dot_product(v, wv) >= 0 THEN (1 << j) ELSE 0 END)::BIGINT AS sig
        |   FROM e, w GROUP BY vec_id),
        | sigs AS (SELECT e.vec_id,
        |     list_transform(e.v, x -> x / sqrt(list_dot_product(e.v, e.v))) AS vn,
        |     sigv.sig
        |   FROM e JOIN sigv USING (vec_id)),
        | pairs AS (SELECT round(list_dot_product(a.vn, b.vn), 4) AS cos_sim
        |   FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id)
        |SELECT threshold, sum(CASE WHEN cos_sim >= threshold THEN 1 ELSE 0 END)::BIGINT AS n_pairs
        |FROM pairs, (SELECT unnest([0.35, 0.5, 0.6, 0.7, 0.8, 0.9]::DOUBLE[]) AS threshold) t
        |GROUP BY threshold ORDER BY threshold""".stripMargin,
    "pack_stats" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        |   FROM documents),
        | c AS (SELECT doc_id, n_tokens,
        |   sum(n_tokens) OVER (ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t),
        | b AS (SELECT ((cum - n_tokens) // 256 + 1)::BIGINT AS bin_id,
        |   sum(n_tokens)::BIGINT AS fill FROM c GROUP BY 1)
        |SELECT count(*)::BIGINT AS n_bins, sum(fill)::BIGINT AS n_tokens,
        |  round(avg(fill / 256.0), 6) AS avg_fill,
        |  round(min(fill / 256.0), 6) AS min_fill,
        |  round(max(fill / 256.0), 6) AS max_fill,
        |  sum(CASE WHEN fill * 10 >= 2304 THEN 1 ELSE 0 END)::BIGINT AS n_full90
        |FROM b""".stripMargin)
}
