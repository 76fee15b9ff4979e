package graft.features

import graft.SparkSpec
import graft.config.BinningConf

class FeatureSpec extends SparkSpec {
  import spark.implicits._

  behavior of "SkipGramGenerator"

  it should "emit first-&-last pairs for every window in [3, W]" in {
    val df = Seq(Seq("a", "b", "c", "d")).toDF("toks")
    val out = new SkipGramGenerator().setInputCol("toks").setOutputCol("sg")
      .setWindowSize(4).transform(df)
    // w=3: (a,c),(b,d); w=4: (a,d)
    out.select("sg").as[Seq[String]].head() shouldBe
      Seq("a & c", "b & d", "a & d")
  }

  it should "emit nothing for docs shorter than the smallest window" in {
    val df = Seq(Seq("a", "b")).toDF("toks")
    val out = new SkipGramGenerator().setInputCol("toks").setOutputCol("sg")
      .setWindowSize(5).transform(df)
    out.select("sg").as[Seq[String]].head() shouldBe Seq.empty
  }

  behavior of "GramAssembler"

  it should "union token and gram arrays preserving order" in {
    val df = Seq((Seq("a", "b"), Seq("a b"))).toDF("toks", "g2")
    val out = new GramAssembler().setInputCols(Array("toks", "g2"))
      .setOutputCol("all").transform(df)
    out.select("all").as[Seq[String]].head() shouldBe Seq("a", "b", "a b")
  }

  behavior of "CategoricalAssembler"

  it should "pack categorical values as col_value tokens" in {
    val df = Seq(("chrome", 7)).toDF("browser", "os")
    val out = new CategoricalAssembler().setInputCols(Array("browser", "os"))
      .setOutputCol("cats").transform(df)
    out.select("cats").as[Seq[String]].head() shouldBe Seq("browser_chrome", "os_7")
  }

  behavior of "Binning"

  it should "bin equidistant into k equal-width buckets" in {
    val df = (0 until 100).map(_.toDouble).toDF("x")
    val stage = Binning.buildStage(df, BinningConf("x", "equidistant", buckets = 4))
    val out = stage.asInstanceOf[org.apache.spark.ml.feature.Bucketizer].transform(df)
    val counts = out.groupBy("x_binned").count().orderBy("x_binned")
      .as[(Double, Long)].collect().toSeq
    counts.map(_._2).sum shouldBe 100
    counts.size shouldBe 4
    all(counts.map(_._2)) shouldBe 25L +- 1
  }

  it should "bin equiarea into quantile buckets" in {
    val df = (0 until 1000).map(i => math.pow(i, 2).toDouble).toDF("x")
    val stage = Binning.buildStage(df, BinningConf("x", "equiarea", buckets = 5))
    val model = stage.asInstanceOf[org.apache.spark.ml.feature.QuantileDiscretizer].fit(df)
    val counts = model.transform(df).groupBy("x_binned").count()
      .as[(Double, Long)].collect().toMap
    counts.values.sum shouldBe 1000
    all(counts.values) shouldBe 200L +- 30
  }

  it should "bin explicit intervals" in {
    val df = Seq(-5.0, 1.0, 15.0, 150.0).toDF("x")
    val stage = Binning.buildStage(df, BinningConf("x", "intervals",
      intervals = Seq(0.0, 10.0, 100.0)))
    val out = stage.asInstanceOf[org.apache.spark.ml.feature.Bucketizer].transform(df)
    out.select("x_binned").as[Double].collect().toSeq shouldBe Seq(0.0, 1.0, 2.0, 3.0)
  }
}
