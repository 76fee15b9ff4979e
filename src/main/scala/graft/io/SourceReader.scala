package graft.io

import graft.config.{ColumnsConf, DataConf}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source dispatch + SQL view chain + input shaping.
  *
  * Semantics from the reference's DAL (dal/DataReaderFactory.scala:36-50,
  * dal/HDFSFileReader.scala:20-61, dal/DataReader.scala:105-167), rebuilt
  * Spark-first: the format dispatch is a match on the URI scheme, the "view
  * chain" is `spark.sql` + `createOrReplaceTempView` in a fold (Spark SQL IS
  * the user-facing ad-hoc query surface — full Catalyst underneath), and all
  * derived columns are built-in expressions (codegen, pushdown-friendly).
  *
  * Scale: the reader never collects; csv/json infer schema from a sample, and
  * parquet keeps predicate pushdown + column pruning through the view chain.
  */
object SourceReader {

  /** Read `<format>://<path>` into a DataFrame (columnar formats — parquet,
    * orc — keep predicate pushdown + column pruning). `views://` skips the load —
    * the SQL chain alone defines the input (caller must have registered the
    * views, e.g. via Tables.registerAll). `jdbc://<jdbc-url>` consumes
    * `firstQuery` as a database-side subquery — `( q ) first_table` — so the
    * source engine does the heavy lifting before rows reach Spark
    * (ref: dal/VerticaReader.scala:35-60). */
  def readSource(spark: SparkSession, source: String,
                 firstQuery: Option[String] = None): Option[DataFrame] = {
    val (scheme, path) = source.span(_ != ':') match {
      case (s, rest) => (s, rest.stripPrefix("://"))
    }
    scheme match {
      case "parquet" => Some(spark.read.parquet(path))
      case "orc"     => Some(spark.read.orc(path))
      case "csv" =>
        Some(spark.read.option("header", "true").option("inferSchema", "true").csv(path))
      case "tsv" =>
        Some(spark.read.option("header", "true").option("inferSchema", "true")
          .option("sep", "\t").csv(path))
      case "json" => Some(spark.read.json(path))
      case "jdbc" =>
        val q = firstQuery.getOrElse(throw new IllegalArgumentException(
          "jdbc:// source requires data.queries[0] as the database-side query"))
        Some(spark.read.format("jdbc")
          .option("url", path)
          .option("dbtable", s"( $q ) first_table")
          .load())
      case "hive" =>
        // `hive://db.table` (ref: dal/HiveReader.scala:19-51) — resolve
        // through the session catalog: a real metastore table when the
        // session was built with Hive support, or a temp/global view in
        // metastore-less deployments (Tables.registerAll). Same semantics
        // as the reference's `select * from <db.table>`.
        Some(spark.table(path))
      case "views" => None
      case other => throw new IllegalArgumentException(s"unknown source format '$other'")
    }
  }

  /** Execute the user's SQL view chain: each query's result is registered as
    * `<prefix><i>`; the final result is the pipeline input
    * (ref: dal/DataReader.scala:105-120 processSQLViewsRec). */
  def runViewChain(spark: SparkSession, queries: Seq[String], prefix: String,
                   base: Option[DataFrame]): DataFrame = {
    base.foreach(_.createOrReplaceTempView(s"${prefix}0"))
    val last = queries.zipWithIndex.foldLeft(base) { case (_, (q, i)) =>
      val df = spark.sql(q)
      df.createOrReplaceTempView(s"$prefix${i + 1}")
      Some(df)
    }
    last.getOrElse(throw new IllegalArgumentException(
      "no input: source was views:// and data.queries is empty"))
  }

  /** Full read: source → view chain → customFilter → derived columns.
    * The filter is applied before any derivation so it reaches the scan. */
  def read(spark: SparkSession, data: DataConf, cols: ColumnsConf): DataFrame = {
    val isJdbc = data.source.startsWith("jdbc")
    val base = readSource(spark, data.source, data.queries.headOption.filter(_ => isJdbc))
    // jdbc consumed queries[0] database-side; the rest run as Spark views
    val chainQueries = if (isJdbc) data.queries.drop(1) else data.queries
    val afterViews =
      if (chainQueries.isEmpty)
        base.getOrElse(throw new IllegalArgumentException("views:// source requires queries"))
      else runViewChain(spark, chainQueries, data.tempViewPrefix, base)
    val filtered = data.customFilter match {
      case Some(f) => afterViews.filter(f)
      case None =>
        if (afterViews.columns.contains(cols.response))
          afterViews.filter(col(cols.response).isNotNull)
        else afterViews
    }
    deriveColumns(filtered, cols)
  }

  /** Derived columns (ref: dal/DataReader.scala:34-78,143-156):
    *  - random variable: first 8 hex chars of the concatenated primary key's
    *    md5 → uniform double in [0,100). Row-local, codegen'd — the basis for
    *    deterministic conditional splits at any scale.
    *  - time-on-page: lead(dateVariable) - dateVariable per primary key,
    *    ordered by the page column — keyed window, no global sort. */
  def deriveColumns(df: DataFrame, cols: ColumnsConf): DataFrame = {
    val withRv = cols.randomVariable match {
      case Some(rv) if !df.columns.contains(rv) && cols.primaryKey.nonEmpty =>
        val key = md5(concat_ws("§", cols.primaryKey.map(col): _*))
        df.withColumn(rv,
          conv(substring(key, 1, 8), 16, 10).cast("double") * 100.0 / 4294967296.0)
      case _ => df
    }
    (cols.dateVariable, cols.page) match {
      case (Some(dt), Some(pg)) if withRv.columns.contains(dt) &&
          withRv.columns.contains(pg) && cols.primaryKey.nonEmpty =>
        val w = Window.partitionBy(cols.primaryKey.map(col): _*).orderBy(col(pg))
        withRv.withColumn("time_on_page",
          lead(col(dt), 1).over(w).cast("double") - col(dt).cast("double"))
      case _ => withRv
    }
  }

  /** Page-level split (ref: PipelineSteps.scala:298-327): page k holds
    * `page == k` rows; the LAST page accumulates `page >= numPages`. */
  def splitPages(df: DataFrame, pageCol: String, numPages: Int): Seq[DataFrame] =
    if (numPages <= 1) Seq(df)
    else (1 to numPages).map { k =>
      if (k == numPages) df.filter(col(pageCol) >= k) else df.filter(col(pageCol) === k)
    }
}
