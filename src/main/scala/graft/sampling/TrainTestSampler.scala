package graft.sampling

import graft.config.SamplingConf
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Train/test sampling strategies
  * (ref: core/sampling/TrainTestSampler.scala:59-300).
  *
  * All strategies return one DataFrame per split, train first. Scale notes:
  *  - random: `randomSplit` — narrow, no shuffle.
  *  - conditional: one pushdown-friendly filter per split; with a derived
  *    random variable (SourceReader) this is the deterministic-at-scale path.
  *  - stratified: exact per-class sampling via `sampleByKeyExact` (the one
  *    deliberate RDD use — DataFrame `stat.sampleBy` is approximate and the
  *    class-balance contract here is exactness); test = anti-join on the
  *    primary key when available, else `except`.
  */
object TrainTestSampler {

  def sample(df: DataFrame, conf: SamplingConf,
             responseCol: String, primaryKey: Seq[String] = Nil): Seq[DataFrame] = {
    val stabilized =
      if (conf.minimumClassSupport > 0)
        stabilizeRareClasses(df, responseCol, conf.minimumClassSupport, conf.otherClassValue)
      else df
    val splits = conf.samplingType match {
      case "random" =>
        stabilized.randomSplit(conf.split.map(_ / 100.0).toArray, conf.seed).toSeq
      case "conditional" =>
        conf.conditions.map(stabilized.filter)
      case "stratified" =>
        stratifiedSplit(stabilized, responseCol, conf.split.head / 100.0, conf.seed, primaryKey)
      case other => throw new IllegalArgumentException(s"unknown samplingType '$other'")
    }
    conf.rebalance match {
      case Some(r) =>
        rebalance(splits.head, responseCol, r.targetRatio, r.mode, conf.seed) +: splits.tail
      case None => splits
    }
  }

  /** Classes with support below `minSupport` are renamed to `otherValue`
    * (ref: TrainTestSampler.scala:72-105 — RDD reduceByKey+join there;
    * here a groupBy + broadcast join: the class-frequency table is tiny). */
  def stabilizeRareClasses(df: DataFrame, responseCol: String,
                           minSupport: Long, otherValue: String): DataFrame = {
    val counts = df.groupBy(responseCol).agg(count(lit(1)).as("__support"))
    df.join(broadcast(counts), Seq(responseCol))
      .withColumn(responseCol,
        when(col("__support") < minSupport, lit(otherValue)).otherwise(col(responseCol)))
      .drop("__support")
  }

  /** Exact stratified split: identical `trainFraction` per response class. */
  def stratifiedSplit(df: DataFrame, responseCol: String, trainFraction: Double,
                      seed: Long, primaryKey: Seq[String]): Seq[DataFrame] = {
    val spark = df.sparkSession
    val classes = df.select(responseCol).distinct().collect().map(_.get(0))
    val fractions = classes.map(_ -> trainFraction).toMap
    val schema = df.schema
    val respIdx = schema.fieldIndex(responseCol)
    val trainRdd = df.rdd.keyBy((r: Row) => r.get(respIdx))
      .sampleByKeyExact(withReplacement = false, fractions = fractions, seed = seed)
      .values
    val train = spark.createDataFrame(trainRdd, schema)
    val test =
      if (primaryKey.nonEmpty) df.join(train.select(primaryKey.map(col): _*),
        primaryKey, "left_anti")
      else df.except(train)
    Seq(train, test)
  }

  /** Class rebalance toward `targetRatio` minority share
    * (ref: TrainTestSampler.scala:205-283). Binary-label semantics:
    * undersample the majority or oversample (with replacement) the minority. */
  def rebalance(df: DataFrame, responseCol: String, targetRatio: Double,
                mode: String, seed: Long): DataFrame = {
    val ordered = labelFrequencies(df, responseCol).collect()
    require(ordered.length >= 2, s"rebalance needs >= 2 classes in $responseCol")
    val (minLabel, nMin) = (ordered.head.get(0), ordered.head.getLong(1))
    val (majLabel, nMaj) = (ordered.last.get(0), ordered.last.getLong(1))
    val minority = df.filter(col(responseCol) === minLabel)
    val majority = df.filter(col(responseCol) === majLabel)
    val rest = df.filter(col(responseCol) =!= minLabel && col(responseCol) =!= majLabel)
    mode match {
      case "undersample" =>
        // shrink majority so nMin / (nMin + nMaj') = targetRatio
        val targetMaj = (nMin * (1 - targetRatio) / targetRatio).toLong
        val frac = (targetMaj.toDouble / nMaj).min(1.0)
        minority.union(majority.sample(withReplacement = false, frac, seed)).union(rest)
      case "oversample" =>
        val targetMin = (nMaj * targetRatio / (1 - targetRatio)).toLong
        val frac = targetMin.toDouble / nMin
        majority.union(minority.sample(withReplacement = frac > 1.0, frac, seed)).union(rest)
      case other => throw new IllegalArgumentException(s"unknown rebalance mode '$other'")
    }
  }

  /** Label frequencies ascending — head is the minority class
    * (ref: TrainTestSampler.scala:291-300). */
  def labelFrequencies(df: DataFrame, responseCol: String): DataFrame =
    df.groupBy(responseCol).agg(count(lit(1)).as("n"))
      .orderBy(asc("n"), col(responseCol).cast("string"))

  /** Minority-share audit (ref: TrainTestSampler.scala:169-192): share of
    * the rarest class; callers warn below `threshold` (default 0.2%). */
  def minorityShare(df: DataFrame, responseCol: String): Double = {
    val ordered = labelFrequencies(df, responseCol).collect()
    if (ordered.isEmpty) 0.0
    else ordered.head.getLong(1).toDouble / ordered.map(_.getLong(1)).sum
  }
}
