package graft.text

import graft.SparkSpec

class PorterStemmerSpec extends SparkSpec {
  behavior of "PorterStemmer"

  it should "stem the classic examples from the published algorithm" in {
    // expected values from the algorithm description (Porter 1980)
    val cases = Map(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "falling" -> "fall", "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit",
      "vietnamization" -> "vietnam", "predication" -> "predic",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
      // note: the full algorithm's step 4 strips the "ic" left by step 3's
      // ical→ic (the paper's "electrical → electric" is a step-3-only example)
      "electricity" -> "electr", "electrical" -> "electr",
      "hopeful" -> "hope", "goodness" -> "good",
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "airliner" -> "airlin", "adjustable" -> "adjust", "defensible" -> "defens",
      "replacement" -> "replac", "adjustment" -> "adjust",
      "adoption" -> "adopt", "homologous" -> "homolog",
      "effective" -> "effect", "bowdlerize" -> "bowdler",
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
    cases.foreach { case (in, expect) =>
      withClue(s"stem($in): ") { PorterStemmer.stem(in) shouldBe expect }
    }
  }
}

class TextTransformersSpec extends SparkSpec {
  import spark.implicits._

  behavior of "text preprocessing transformers"

  it should "lowercase via CaseNormalizer" in {
    val df = Seq("Hello WORLD").toDF("t")
    val out = new CaseNormalizer().setInputCol("t").setOutputCol("o").transform(df)
    out.select("o").as[String].head() shouldBe "hello world"
  }

  it should "wrap with sentence markers" in {
    val df = Seq("hi there").toDF("t")
    val out = new SentenceMarker().setInputCol("t").setOutputCol("o").transform(df)
    out.select("o").as[String].head() shouldBe "_class_ss hi there _class_se"
  }

  it should "remove stopwords and join with ~SP~" in {
    val df = Seq("the cat sat on the mat").toDF("t")
    val out = new StopWordsFilter().setInputCol("t").setOutputCol("o")
      .setStopwords(Array("the", "on")).transform(df)
    out.select("o").as[String].head() shouldBe "cat~SP~sat~SP~mat"
  }

  it should "re-split ~SP~-joined input in downstream stages" in {
    val df = Seq("the~SP~Dog Runs").toDF("t")
    val out = new StopWordsFilter().setInputCol("t").setOutputCol("o")
      .setStopwords(Array("the")).transform(df)
    out.select("o").as[String].head() shouldBe "Dog~SP~Runs"
  }

  it should "substitute words from a dictionary incl. multi-word values" in {
    val df = Seq("don't stop").toDF("t")
    val out = new WordSubstitutor().setInputCol("t").setOutputCol("o")
      .setDictionary(Map("don't" -> "do not")).transform(df)
    out.select("o").as[String].head() shouldBe "do not~SP~stop"
  }

  it should "apply ordered regex replacement pairs" in {
    val df = Seq("call 555-1234 now").toDF("t")
    val out = new RegexReplacer().setInputCol("t").setOutputCol("o")
      .setPairs(Seq(("[0-9]{3}-[0-9]{4}", "_class_phone"), ("[0-9]+", "_class_number")))
      .transform(df)
    out.select("o").as[String].head() shouldBe "call _class_phone now"
  }

  it should "stem tokens but skip _class_ markers and exceptions" in {
    val df = Seq("running _class_phone agreed skipme").toDF("t")
    val out = new PorterStemming().setInputCol("t").setOutputCol("o")
      .setExceptions(Array("skipme")).transform(df)
    out.select("o").as[String].head() shouldBe "run~SP~_class_phone~SP~agre~SP~skipme"
  }

  it should "impute nulls with a typed fill value and indicator" in {
    val df = Seq(Some(3), None).toDF("t")
    val out = new NullImputer().setInputCol("t").setOutputCol("o")
      .setFillValue("7").transform(df)
    out.select("o").as[Int].collect().toSeq shouldBe Seq(3, 7)
    out.select("imputed_o").as[Int].collect().toSeq shouldBe Seq(0, 1)
  }

  it should "tokenize mixed delimiters to an array" in {
    val df = Seq("a~SP~b c").toDF("t")
    val out = new TokenSplitter().setInputCol("t").setOutputCol("o").transform(df)
    out.select("o").as[Seq[String]].head() shouldBe Seq("a", "b", "c")
  }

  it should "load stopwords and regex pairs from support files" in {
    import graft.config.PreprocessStep
    val dir = java.nio.file.Files.createTempDirectory("graft-support")
    val stops = dir.resolve("stops.txt")
    java.nio.file.Files.writeString(stops, "the\non\n")
    val pairsF = dir.resolve("classes.txt")
    java.nio.file.Files.writeString(pairsF, "[0-9]{3}-[0-9]{4}\tphone\n[0-9]+\tnumber\n")
    val sw = PreprocessingEngine.stage(
      PreprocessStep(op = "stopwords", inputColumn = "t",
        stopwords = Seq("extra"), file = Some(stops.toString)), "o")
      .asInstanceOf[StopWordsFilter]
    val out = sw.transform(Seq("the cat extra on mat").toDF("t"))
    out.select("o").as[String].head() shouldBe "cat~SP~mat"
    val rr = PreprocessingEngine.stage(
      PreprocessStep(op = "word_classes_replacement", inputColumn = "t",
        file = Some(pairsF.toString)), "o").asInstanceOf[RegexReplacer]
    rr.transform(Seq("call 555-1234 now").toDF("t"))
      .select("o").as[String].head() shouldBe "call _class_phone now"
  }

  it should "load support files through a Hadoop FileSystem URI" in {
    // the loader resolves paths via the Hadoop FS API (the reference's
    // PreprocessingStageLoader reads local OR HDFS) — a file:/ URI must
    // work identically to a bare local path
    import graft.config.PreprocessStep
    val dir = java.nio.file.Files.createTempDirectory("graft-support-fs")
    val stops = dir.resolve("stops.txt")
    java.nio.file.Files.writeString(stops, "the\non\n")
    val sw = PreprocessingEngine.stage(
      PreprocessStep(op = "stopwords", inputColumn = "t",
        file = Some(stops.toUri.toString)), "o") // file:/... URI
      .asInstanceOf[StopWordsFilter]
    sw.getOrDefault(sw.stopwords).toSet shouldBe Set("the", "on")
    val out = sw.transform(Seq("the cat on mat").toDF("t"))
    out.select("o").as[String].head() shouldBe "cat~SP~mat"
  }

  it should "build a full chain from config and run as a Pipeline" in {
    import graft.config.PreprocessStep
    val steps = Seq(
      PreprocessStep(op = "case_normalization", inputColumn = "t", outputColumn = Some("c1")),
      PreprocessStep(op = "word_classes_replacement", inputColumn = "c1",
        outputColumn = Some("c2"), pairs = Seq(Seq("[0-9]+", "number"))),
      PreprocessStep(op = "stopwords", inputColumn = "c2", outputColumn = Some("c3"),
        stopwords = Seq("the")),
      PreprocessStep(op = "tokenizer", inputColumn = "c3", outputColumn = Some("toks"),
        pattern = Some("\\s+|(~SP~)")))
    val pipe = new org.apache.spark.ml.Pipeline()
      .setStages(PreprocessingEngine.buildStages(steps).toArray)
    val df = Seq("The Price is 42 dollars").toDF("t")
    val out = pipe.fit(df).transform(df)
    out.select("toks").as[Seq[String]].head() shouldBe
      Seq("price", "is", "_class_number", "dollars")
  }
}
