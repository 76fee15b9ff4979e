package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared primitives of the LLM-data packs (word-trigram shingles, the
  * coarse-quantization constants and deterministic seed order, and
  * their DuckDB oracle fragments). Mixed into [[LlmData]]. */
trait LlmCore {

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

  protected def shingles(s: SparkSession, dir: String): DataFrame =
    shinglesOf(Tables.documents(s, dir), "doc_id", "text")


  /** DuckDB fragment matching [[shingles]] (1-based list indexing). */
  protected val shinglesSql =
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
  protected val KmeansK = 8


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
  protected def seedOrder(id: org.apache.spark.sql.Column) =
    Seq(pmod(pmod(id, lit(1000003L)) * lit(2654435761L), lit(1000003L)), id)


  /** The k seed rows of `e` (any frame carrying `vec_id`).
    * Plans as TakeOrderedAndProject — per-partition top-k merged on the
    * driver, so the seed set is O(k) at ANY corpus size. This replaces the
    * former corpus-fraction seeding (`vec_id % 97`) whose cell count — and
    * therefore the broadcast size and the per-row argmin work — grew O(N). */
  private[queries] def coarseSeeds(e: DataFrame, k: Int): DataFrame =
    e.orderBy(seedOrder(col("vec_id")): _*).limit(k)


  /** DuckDB twin of [[coarseSeeds]]: `ORDER BY $seedOrderSql LIMIT k`. */
  protected val seedOrderSql = "((vec_id % 1000003) * 2654435761) % 1000003, vec_id"


  /** DuckDB twin of [[adaptiveCoarseK]]/[[adaptiveNprobe]], as a CTE the
    * ANN oracles prepend: `LIMIT (SELECT k FROM kk)` replays the exact k
    * the Spark side computed from its own `count()` of the same table. */
  protected val adaptiveKCte =
    """kk AS (SELECT
      |   greatest(8, least(65536, CAST(ceil(sqrt(count(*))) AS BIGINT))) AS k,
      |   greatest(3, CAST(ceil(sqrt(
      |     greatest(8, least(65536, ceil(sqrt(count(*))))))) AS BIGINT)) AS np
      |  FROM embeddings)""".stripMargin

  // ---------------------------------------------------------------- dedup

  /** File-level corpus signature: (name, length, mtime) of a table's
    * files, hashed. O(files) driver-side metadata listing — the same
    * scheme-dispatched Hadoop FS the read itself uses, so it works on
    * any store a cluster would read from. Keys every persisted-artifact
    * cache (IVF index, tokenizer models) on corpus CONTENT metadata, so
    * a rewritten corpus at the same path invalidates instead of serving
    * a stale artifact. */
  protected def embeddingsSignature(s: SparkSession, dir: String): String =
    fileSignature(s, s"$dir/embeddings.parquet")

  protected def documentsSignature(s: SparkSession, dir: String): String =
    fileSignature(s, s"$dir/documents.parquet")

  protected def fileSignature(s: SparkSession, path: String): String = {
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
}
