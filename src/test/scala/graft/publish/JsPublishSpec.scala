package graft.publish

import graft.SparkSpec
import graft.config.GraftConf
import graft.PipelineRunner
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.functions._

/** The generated JS scorer must carry the exact fitted parameters and
  * reproduce the Spark pipeline's probabilities. There is no JS engine in
  * this environment, so the spec (a) parses the embedded JSON parameter
  * blocks back out of the generated source and checks them against the
  * fitted model objects, and (b) executes the same algorithm the JS
  * performs — tokenize, vocab-count, sparse dot, sigmoid — in Scala over
  * real rows, comparing to `chain.transform` output. The murmur3 block is
  * validated by running its algorithm (transcribed 1:1) against
  * spark.ml HashingTF.indexOf for a corpus of tokens.
  */
class JsPublishSpec extends SparkSpec {

  behavior of "JsPublish"

  private lazy val fitted = {
    val conf = GraftConf.fromJson(
      s"""{
        |  "project": {"name": "js-publish-spec", "root": "/tmp/graft-spec"},
        |  "data": {"source": "parquet:///root/testdata/sf0.001/documents.parquet",
        |           "customFilter": "lang IN ('en', 'fr')"},
        |  "columns": {"response": "lang", "text": ["text"], "numerical": ["n_chars"],
        |              "primaryKey": ["doc_id"]},
        |  "sampling": {"samplingType": "random", "split": [80, 20], "seed": 20},
        |  "preprocessing": [
        |    {"op": "case_normalization", "inputColumn": "text", "outputColumn": "t1"},
        |    {"op": "stopwords", "inputColumn": "t1", "outputColumn": "t2",
        |     "stopwords": ["the", "of"]},
        |    {"op": "tokenizer", "inputColumn": "t2", "outputColumn": "toks"}
        |  ],
        |  "vectorization": {"method": "count_vectorizer", "slots": 4096},
        |  "training": {"algorithm": "logistic_regression", "buildType": "binary",
        |               "params": {"regParam": 0.01, "maxIter": 50}}
        |}""".stripMargin)
    PipelineRunner.run(spark, conf)
  }

  it should "embed the fitted coefficients, vocabulary and threshold" in {
    val pr = fitted.pages.head
    val js = JsPublish.generate(pr.prep, pr.chain, threshold = 0.5)
    js should include("function graftScore(input)")
    // intercept appears verbatim
    val lr = pr.chain.stages.collectFirst {
      case m: org.apache.spark.ml.classification.LogisticRegressionModel => m
    }.get
    js should include(lr.intercept.toString)
    // every non-zero coefficient appears with its index
    val nz = lr.coefficients.toArray.zipWithIndex.filter(_._1 != 0.0)
    nz.take(20).foreach { case (w, i) => js should include(s""""$i":$w""") }
    // full vocabulary is embedded
    val cv = pr.prep.stages.collectFirst {
      case m: org.apache.spark.ml.feature.CountVectorizerModel => m
    }.get
    cv.vocabulary.take(20).foreach(t => js should include(s""""$t":"""))
  }

  it should "reproduce Spark probabilities through the JS algorithm" in {
    val pr = fitted.pages.head
    val js = JsPublish.generate(pr.prep, pr.chain, threshold = 0.5)

    // parse the parameter blocks back out of the generated source
    val coefRe = """"coefficients":\{([^}]*)\}""".r
    val coefMap = coefRe.findFirstMatchIn(js).get.group(1).split(",").filter(_.nonEmpty)
      .map { e => val Array(k, v) = e.split(":"); k.replace("\"", "").toInt -> v.toDouble }
      .toMap
    val interceptRe = """"intercept":([-0-9.eE]+)""".r
    val intercept = interceptRe.findFirstMatchIn(js).get.group(1).toDouble
    val vocabRe = """var graftVocab_v_text_vec = \{(.*?)\};""".r
    val vocab = vocabRe.findFirstMatchIn(js).map(_.group(1)) match {
      case Some(body) =>
        // tokens are synthetic words [a-z]+ — simple split is safe here
        body.split(",").filter(_.nonEmpty).map { e =>
          val i = e.lastIndexOf(':')
          e.substring(1, i - 1) -> e.substring(i + 1).toInt
        }.toMap
      case None => fail("vocabulary block not found in generated JS")
    }

    // the JS algorithm in Scala over raw rows
    val raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter("lang IN ('en', 'fr') AND doc_id < 40")
      .select("doc_id", "text", "n_chars").collect()
    val vocabWidth = vocab.size
    val simulated = raw.map { r =>
      val lowered = r.getString(1).toLowerCase
      val t2 = lowered.split("\\s|(~SP~)").filter(t => t != "the" && t != "of")
        .mkString("~SP~")
      val toks = t2.split("\\s|(~SP~)").filter(_.nonEmpty)
      val feats = scala.collection.mutable.Map.empty[Int, Double]
      toks.foreach(t => vocab.get(t).foreach(i => feats(i) = feats.getOrElse(i, 0.0) + 1))
      feats(vocabWidth) = r.getLong(2).toDouble // numerical n_chars after vocab block
      var margin = intercept
      feats.foreach { case (k, v) => margin += coefMap.getOrElse(k, 0.0) * v }
      r.getLong(0) -> (1.0 / (1.0 + math.exp(-margin)))
    }.toMap

    // spark-side probabilities for the same rows
    val rawDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter("lang IN ('en', 'fr') AND doc_id < 40")
    val scored = pr.chain.transform(pr.prep.transform(rawDf))
      .select(col("doc_id"),
        element_at(org.apache.spark.ml.functions.vector_to_array(col("probability")), 2)
          .as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    simulated.keys should not be empty
    simulated.foreach { case (id, p) =>
      p shouldBe scored(id) +- 1e-9
    }
  }

  it should "reproduce OVR probabilities and labels through the JS algorithm" in {
    val conf = GraftConf.fromJson(
      s"""{
        |  "project": {"name": "js-ovr-spec", "root": "/tmp/graft-spec"},
        |  "data": {"source": "parquet:///root/testdata/sf0.001/documents.parquet"},
        |  "columns": {"response": "lang", "text": ["text"], "numerical": ["n_chars"],
        |              "primaryKey": ["doc_id"]},
        |  "sampling": {"samplingType": "random", "split": [80, 20], "seed": 20},
        |  "preprocessing": [
        |    {"op": "tokenizer", "inputColumn": "text", "outputColumn": "toks"}
        |  ],
        |  "vectorization": {"method": "count_vectorizer", "slots": 4096},
        |  "training": {"algorithm": "logistic_regression", "buildType": "ovr"}
        |}""".stripMargin)
    val result = PipelineRunner.run(spark, conf)
    val pr = result.pages.head
    val js = JsPublish.generate(pr.prep, pr.chain, threshold = 0.5)
    js should include (""""kind":"ovr"""")

    // parse the per-class blocks back out in order
    val blockRe = """\{"intercept":([-0-9.eE]+),"coefficients":\{([^}]*)\}\}""".r
    val models = blockRe.findAllMatchIn(js).map { m =>
      val coefs = m.group(2).split(",").filter(_.nonEmpty).map { e =>
        val Array(k, v) = e.split(":"); k.replace("\"", "").toInt -> v.toDouble
      }.toMap
      (m.group(1).toDouble, coefs)
    }.toSeq
    models should have size pr.chain.labels.length.toLong
    val classesRe = """"classes":\[([^\]]*)\]""".r
    val classes = classesRe.findFirstMatchIn(js).get.group(1)
      .split(",").map(_.replace("\"", ""))
    classes.toSeq shouldBe pr.chain.labels.toSeq
    val vocabRe = """var graftVocab_v_text_vec = \{(.*?)\};""".r
    val vocab = vocabRe.findFirstMatchIn(js).get.group(1)
      .split(",").filter(_.nonEmpty).map { e =>
        val i = e.lastIndexOf(':')
        e.substring(1, i - 1) -> e.substring(i + 1).toInt
      }.toMap

    // replay the JS algorithm in Scala over raw rows
    val raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter("doc_id < 40").select("doc_id", "text", "n_chars").collect()
    val simulated = raw.map { r =>
      val feats = scala.collection.mutable.Map.empty[Int, Double]
      r.getString(1).split("\\s|(~SP~)").filter(_.nonEmpty)
        .foreach(t => vocab.get(t).foreach(i => feats(i) = feats.getOrElse(i, 0.0) + 1))
      feats(vocab.size) = r.getLong(2).toDouble
      val margins = models.map { case (b0, w) =>
        b0 + feats.map { case (k, v) => w.getOrElse(k, 0.0) * v }.sum
      }
      val sig = margins.map(m => 1.0 / (1.0 + math.exp(-m)))
      val probs = sig.map(_ / sig.sum)
      val best = margins.indexOf(margins.max) // engine ranks LR-OVR on margins
      r.getLong(0) -> (probs, classes(best))
    }.toMap

    import org.apache.spark.ml.functions.vector_to_array
    val scored = pr.chain.transform(pr.prep.transform(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .filter("doc_id < 40")))
      .select(col("doc_id"), vector_to_array(col("probability")).as("p"),
        col("predictedResponse"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Double](1), r.getString(2))).toMap

    simulated.keys should not be empty
    simulated.foreach { case (id, (probs, label)) =>
      val (ep, el) = scored(id)
      label shouldBe el
      probs.zip(ep).foreach { case (a, b) => a shouldBe b +- 1e-9 }
    }
  }

  it should "assemble a multi-page scorer with per-page dispatch" in {
    val conf = GraftConf.fromJson(
      s"""{
        |  "project": {"name": "js-multipage-spec", "root": "/tmp/graft-spec"},
        |  "data": {"source": "parquet:///root/testdata/sf0.001/documents.parquet",
        |           "queries": ["SELECT *, CASE WHEN lang = 'en' THEN 'pos' ELSE 'neg' END AS y, 1 + doc_id % 2 AS pg FROM graftView0"]},
        |  "columns": {"response": "y", "text": ["text"], "numerical": ["n_chars"],
        |              "primaryKey": ["doc_id"], "page": "pg"},
        |  "numPages": 2,
        |  "sampling": {"samplingType": "random", "split": [80, 20], "seed": 20},
        |  "preprocessing": [
        |    {"op": "tokenizer", "inputColumn": "text", "outputColumn": "toks"}
        |  ],
        |  "vectorization": {"method": "count_vectorizer", "slots": 4096},
        |  "training": {"algorithm": "logistic_regression", "buildType": "binary"}
        |}""".stripMargin)
    val result = PipelineRunner.run(spark, conf)
    result.pages should have size 2
    val perPage = result.pages.map(pr =>
      pr.page -> JsPublish.generate(pr.prep, pr.chain, threshold = 0.5))
    val assembled = JsPublish.assemble(perPage, pageCol = "pg")
    // one artifact, per-page dispatch: page 1 exact, last page accumulates
    assembled should include ("""if (page == 1) return graftPage1(input);""")
    assembled should include ("""if (page >= 2) return graftPage2(input);""")
    assembled should include ("""var page = Number(input["pg"]);""")
    // each page's scorer is embedded VERBATIM, so the single-page
    // probability parity (previous test) carries over to the assembly
    perPage.foreach { case (k, js) =>
      assembled should include (s"var graftPage$k = (function(){\n" + js)
    }
    // the two pages fit DIFFERENT models (different intercepts embedded)
    val intercepts = result.pages.map(_.chain.stages.collectFirst {
      case m: org.apache.spark.ml.classification.LogisticRegressionModel => m
    }.get.intercept).distinct
    intercepts should have size 2
    intercepts.foreach(i => assembled should include (i.toString))
  }

  // ---- uplift publish: shared replay helper ------------------------------
  /** Train an uplift pipeline with `training`, generate the JS, replay the
    * generated algorithm (tokenize → vocab-count → sparse dot → per-margin
    * sigmoid → Δ) in Scala, and compare to the Spark chain's packed Δ. */
  private def upliftParity(name: String, training: String): Unit = {
    val conf = GraftConf.fromJson(
      s"""{
        |  "project": {"name": "$name", "root": "/tmp/graft-spec"},
        |  "data": {"source": "parquet:///root/testdata/sf0.001/documents.parquet",
        |           "queries": ["SELECT *, CASE WHEN lang = 'en' THEN 'pos' ELSE 'neg' END AS y, CAST(doc_id % 2 AS DOUBLE) AS treat FROM graftView0"]},
        |  "columns": {"response": "y", "text": ["text"], "numerical": ["n_chars"],
        |              "primaryKey": ["doc_id"]},
        |  "sampling": {"samplingType": "random", "split": [80, 20], "seed": 20},
        |  "preprocessing": [
        |    {"op": "tokenizer", "inputColumn": "text", "outputColumn": "toks"}
        |  ],
        |  "vectorization": {"method": "count_vectorizer", "slots": 4096},
        |  "training": $training
        |}""".stripMargin)
    val result = PipelineRunner.run(spark, conf)
    val pr = result.pages.head
    val js = JsPublish.generate(pr.prep, pr.chain, threshold = 0.05)
    js should include (""""uplift":true""")

    // parse the parameter blocks back out of the generated source
    val coefMap = """"coefficients":\{([^}]*)\}""".r.findFirstMatchIn(js).get
      .group(1).split(",").filter(_.nonEmpty)
      .map { e => val Array(k, v) = e.split(":"); k.replace("\"", "").toInt -> v.toDouble }
      .toMap
    val intercept = """"intercept":([-0-9.eE]+)""".r.findFirstMatchIn(js).get.group(1).toDouble
    val shiftKey = """"shiftKey":(\d+)""".r.findFirstMatchIn(js).get.group(1).toInt
    val platt = """"platt":\{"a":([-0-9.eE]+),"b":([-0-9.eE]+)\}""".r
      .findFirstMatchIn(js).map(m => (m.group(1).toDouble, m.group(2).toDouble))
    val vocab = """var graftVocab_v_text_vec = \{(.*?)\};""".r
      .findFirstMatchIn(js).get.group(1)
      .split(",").filter(_.nonEmpty).map { e =>
        val i = e.lastIndexOf(':')
        e.substring(1, i - 1) -> e.substring(i + 1).toInt
      }.toMap
    // assembler layout: [vocab | n_chars | treat]; treat is the last slot
    shiftKey shouldBe vocab.size + 1
    // the treatment input must NOT be read — the scorer forces the slot
    js should not include ("""Number(input["treat"]""")

    // replay the JS algorithm in Scala over raw rows
    val raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter("doc_id < 40").select("doc_id", "text", "n_chars").collect()
    def cal(m: Double): Double = platt match {
      case Some((a, b)) => 1.0 / (1.0 + math.exp(-(a * m + b)))
      case None => 1.0 / (1.0 + math.exp(-m))
    }
    val simulated = raw.map { r =>
      val feats = scala.collection.mutable.Map.empty[Int, Double]
      r.getString(1).split("\\s|(~SP~)").filter(_.nonEmpty)
        .foreach(t => vocab.get(t).foreach(i => feats(i) = feats.getOrElse(i, 0.0) + 1))
      feats(vocab.size) = r.getLong(2).toDouble // n_chars; treat slot forced
      var margin = intercept
      feats.foreach { case (k, v) => margin += coefMap.getOrElse(k, 0.0) * v }
      val margin1 = margin + coefMap.getOrElse(shiftKey, 0.0)
      r.getLong(0) -> (cal(margin1) - cal(margin))
    }.toMap

    // Spark-side Δ (the packed probability's positive slot) for same rows
    import org.apache.spark.ml.functions.vector_to_array
    val scored = pr.chain.transform(pr.prep.transform(
        spark.sql(
          """SELECT *, CASE WHEN lang = 'en' THEN 'pos' ELSE 'neg' END AS y,
            |CAST(doc_id % 2 AS DOUBLE) AS treat
            |FROM parquet.`/root/testdata/sf0.001/documents.parquet`
            |WHERE doc_id < 40""".stripMargin)))
      .select(col("doc_id"),
        element_at(vector_to_array(col("probability")), 2).as("delta"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    simulated.keys should not be empty
    simulated.foreach { case (id, d) => d shouldBe scored(id) +- 1e-9 }
  }

  it should "replay an LR uplift chain's Δ through the JS algorithm to 1e-9" in {
    upliftParity("js-uplift-lr-spec",
      """{"algorithm": "logistic_regression", "uplift": "treat"}""")
  }

  it should "replay a Platt-SVM uplift chain's Δ through the JS algorithm to 1e-9" in {
    upliftParity("js-uplift-svm-spec",
      """{"algorithm": "svm", "plattScaling": true, "uplift": "treat"}""")
  }

  it should "still refuse genuinely non-linear uplift bases" in {
    val conf = GraftConf.fromJson(
      s"""{
        |  "project": {"name": "js-uplift-rf-spec", "root": "/tmp/graft-spec"},
        |  "data": {"source": "parquet:///root/testdata/sf0.001/documents.parquet",
        |           "queries": ["SELECT *, CASE WHEN lang = 'en' THEN 'pos' ELSE 'neg' END AS y, CAST(doc_id % 2 AS DOUBLE) AS treat FROM graftView0"]},
        |  "columns": {"response": "y", "text": ["text"], "numerical": ["n_chars"],
        |              "primaryKey": ["doc_id"]},
        |  "sampling": {"samplingType": "random", "split": [80, 20], "seed": 20},
        |  "preprocessing": [
        |    {"op": "tokenizer", "inputColumn": "text", "outputColumn": "toks"}
        |  ],
        |  "vectorization": {"method": "hashingtf", "slots": 1024},
        |  "training": {"algorithm": "random_forest", "uplift": "treat",
        |               "params": {"numTrees": 3, "maxDepth": 3}}
        |}""".stripMargin)
    val result = PipelineRunner.run(spark, conf)
    val pr = result.pages.head
    val ex = the [UnsupportedOperationException] thrownBy
      JsPublish.generate(pr.prep, pr.chain, threshold = 0.5)
    ex.getMessage should include ("linear bases")
  }

  it should "refuse to assemble a non-contiguous or duplicated page set" in {
    an [IllegalArgumentException] should be thrownBy
      JsPublish.assemble(Seq(1 -> "function graftScore(i){}", 3 -> "function graftScore(i){}"), "pg")
    an [IllegalArgumentException] should be thrownBy
      JsPublish.assemble(Seq(2 -> "function graftScore(i){}", 2 -> "function graftScore(i){}"), "pg")
  }

  it should "emit a murmur3 whose algorithm matches HashingTF term indexing" in {
    // transcription of the generated graftMurmurIndex (32-bit JS semantics)
    def mul32(a: Int, b: Int): Int = a * b // JVM int mul == JS graftMul32
    def murmur(bytes: Array[Byte], seed: Int): Int = {
      var h1 = seed
      val c1 = 0xcc9e2d51; val c2 = 0x1b873593
      val n = bytes.length - (bytes.length % 4)
      var i = 0
      while (i < n) {
        var k1 = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
          ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
        k1 = mul32(k1, c1); k1 = Integer.rotateLeft(k1, 15); k1 = mul32(k1, c2)
        h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = mul32(h1, 5) + 0xe6546b64
        i += 4
      }
      var kt = 0; var j = n; var shift = 0
      while (j < bytes.length) {
        kt ^= (bytes(j) & 0xff) << shift
        j += 1; shift += 8
      }
      kt = mul32(kt, c1); kt = Integer.rotateLeft(kt, 15); kt = mul32(kt, c2)
      h1 ^= kt
      h1 ^= bytes.length
      h1 ^= h1 >>> 16; h1 = mul32(h1, 0x85ebca6b)
      h1 ^= h1 >>> 13; h1 = mul32(h1, 0xc2b2ae35)
      h1 ^= h1 >>> 16
      h1
    }
    val htf = new HashingTF().setNumFeatures(1 << 14)
    val terms = Seq("the", "quick", "brown", "fox", "naïve", "東京", "a", "",
      "longer-token-with-punct!", "1234567", "αβγδε")
    terms.foreach { t =>
      val idx = htf.indexOf(t)
      val mine = {
        val h = murmur(t.getBytes("UTF-8"), 42)
        ((h % (1 << 14)) + (1 << 14)) % (1 << 14)
      }
      withClue(s"term '$t': ") { mine shouldBe idx }
    }
  }
}
