package graft.sampling

import graft.SparkSpec
import graft.config.{RebalanceConf, SamplingConf}
import org.apache.spark.sql.functions._

class TrainTestSamplerSpec extends SparkSpec {
  import spark.implicits._

  private def labeled(nA: Int, nB: Int, nC: Int = 0) =
    ((1 to nA).map(i => (i, "a")) ++ (1 to nB).map(i => (nA + i, "b")) ++
      (1 to nC).map(i => (nA + nB + i, "c"))).toDF("id", "y")

  behavior of "TrainTestSampler"

  it should "random-split deterministically for a fixed seed" in {
    val df = labeled(500, 500)
    val conf = SamplingConf(samplingType = "random", split = Seq(80, 20), seed = 20)
    val s1 = TrainTestSampler.sample(df, conf, "y").map(_.count())
    val s2 = TrainTestSampler.sample(df, conf, "y").map(_.count())
    s1 shouldBe s2
    s1.sum shouldBe 1000
    s1.head.toDouble shouldBe 800.0 +- 60.0
  }

  it should "conditional-split by filter expressions" in {
    val df = labeled(100, 100).withColumn("rv", col("id") % 100)
    val conf = SamplingConf(samplingType = "conditional",
      conditions = Seq("rv < 80", "rv >= 80"))
    val Seq(train, test) = TrainTestSampler.sample(df, conf, "y")
    train.count() + test.count() shouldBe 200
    train.filter("rv >= 80").count() shouldBe 0
    test.filter("rv < 80").count() shouldBe 0
  }

  it should "stratified-split with exact per-class fractions" in {
    val df = labeled(400, 100)
    val conf = SamplingConf(samplingType = "stratified", split = Seq(80, 20), seed = 20)
    val Seq(train, test) = TrainTestSampler.sample(df, conf, "y", primaryKey = Seq("id"))
    // sampleByKeyExact: exact to ±1 per class
    train.filter("y = 'a'").count().toDouble shouldBe 320.0 +- 1.0
    train.filter("y = 'b'").count().toDouble shouldBe 80.0 +- 1.0
    train.count() + test.count() shouldBe 500
    // disjoint on pk
    train.join(test, "id").count() shouldBe 0
  }

  it should "rename rare classes to the other-class value" in {
    val df = labeled(100, 100, 3)
    val out = TrainTestSampler.stabilizeRareClasses(df, "y", minSupport = 10, "other")
    out.filter("y = 'c'").count() shouldBe 0
    out.filter("y = 'other'").count() shouldBe 3
    out.count() shouldBe 203
  }

  it should "undersample the majority class toward the target ratio" in {
    val df = labeled(900, 100)
    val out = TrainTestSampler.rebalance(df, "y", targetRatio = 0.4,
      mode = "undersample", seed = 20)
    val nMin = out.filter("y = 'b'").count()
    val nMaj = out.filter("y = 'a'").count()
    nMin shouldBe 100
    (nMin.toDouble / (nMin + nMaj)) shouldBe 0.4 +- 0.08
  }

  it should "oversample the minority class toward the target ratio" in {
    val df = labeled(900, 100)
    val out = TrainTestSampler.rebalance(df, "y", targetRatio = 0.3,
      mode = "oversample", seed = 20)
    val nMin = out.filter("y = 'b'").count()
    val nMaj = out.filter("y = 'a'").count()
    nMaj shouldBe 900
    (nMin.toDouble / (nMin + nMaj)) shouldBe 0.3 +- 0.08
  }

  it should "report minority share for the audit" in {
    val df = labeled(990, 10)
    TrainTestSampler.minorityShare(df, "y") shouldBe 0.01 +- 1e-9
  }
}
