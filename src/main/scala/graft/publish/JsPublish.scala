package graft.publish

import graft.features.{CategoricalAssembler, GramAssembler, SkipGramGenerator}
import graft.text._
import graft.train.ModelTrainingEngine.FittedChain
import graft.train.PlattScalarModel
import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.classification.{LinearSVCModel, LogisticRegressionModel}
import org.apache.spark.ml.feature.{CountVectorizerModel, HashingTF, IDFModel, RegexTokenizer, VectorAssembler}

/** Standalone-JavaScript scorer codegen
  * (ref: publish/Publish.scala:41-53 generateJS → PublishAssembler + the
  * publisher classes under publish/{preprocessing,vectorization,model}).
  *
  * Re-expressed for this engine: instead of string-assembling every stage
  * inline, the generator walks the FITTED spark.ml stages (the same objects
  * the cluster scores with), embeds their parameters as machine-readable
  * JSON blocks (sparse non-zero coefficient map — same trick as the
  * reference's `createCoefficientsMap`), and emits one self-contained
  * `graftScore(input)` function. Supported surface mirrors the reference's
  * JS publishers: case_normalization, stopwords, word substitution, regex
  * replacement, sentence marker, null imputation, tokenizer,
  * count_vectorizer / tfidf / hashingtf (murmur3), assembled numericals,
  * binary LR / SVM with optional Platt sigmoid, multi-intent OVR (one
  * coefficient block per class, per-class Platt, argmax dispatch,
  * normalized LR probabilities), linear uplift (score₁ − score₀ via the
  * treatment-coefficient shift), hotlead threshold. Porter
  * stemming is a published NO-OP — exactly like the reference's
  * PorterStemmingPublisher.generateJS, which returns an empty builder.
  */
object JsPublish {

  private def jsStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Java regex → JS regex literal. Capture groups become non-capturing:
    * JS String.split INSERTS captured separator text into the result array
    * (Java's split does not), which would corrupt token streams split on
    * the composed `...|(~SP~)` pattern. */
  private def jsRegex(javaPattern: String): String =
    "/" + javaPattern.replace("/", "\\/").replace("(~SP~)", "(?:~SP~)") + "/g"

  private def sane(col: String): String = "v_" + col.replaceAll("[^A-Za-z0-9_]", "_")

  /** Generate the scorer for one fitted page: preprocessing+vectorization
    * `prep`, model `chain`, decision `threshold` on the probability. */
  def generate(prep: PipelineModel, chain: FittedChain, threshold: Double): String = {
    val sb = new StringBuilder
    sb ++= "// graft published scorer (generated)\n"
    sb ++= "// input: an object keyed by raw column name\n"

    // uplift chains score p(treated) − p(control). For a LINEAR base the
    // standalone scorer replays this exactly: forcing the (last-slot)
    // treatment feature to 0/1 shifts the margin by exactly its
    // coefficient, so score₁ = σ(platt(margin + w_treat)) and
    // score₀ = σ(platt(margin)) — the reference's construction
    // (ref: publish/model/LogisticRegressionPublisher.scala:61-70,
    // SVMPublisher.scala:79-91: `dotProduct += coefficients[shiftKey]`
    // then `score = score_1 - score_0`). Non-linear bases have no such
    // closed form and stay refused below.
    val uplift = chain.stages.exists(_.isInstanceOf[graft.train.UpliftTransformer])

    // ---- split stages: string preprocessing vs vectorization
    val stages = prep.stages.toSeq
    val assembler = stages.collectFirst { case a: VectorAssembler => a }
      .getOrElse(throw new UnsupportedOperationException(
        "JS publish requires a VectorAssembler stage"))

    // per-column vector sources keyed by output column
    val vocabs = stages.collect { case cv: CountVectorizerModel =>
      cv.getOutputCol -> cv
    }.toMap
    val hashes = stages.collect { case h: HashingTF => h.getOutputCol -> h }.toMap
    val idfs = stages.collect { case i: IDFModel => i.getOutputCol -> i }.toMap

    def widthOf(col: String): Int =
      vocabs.get(col).map(_.vocabulary.length)
        .orElse(hashes.get(col).map(_.getNumFeatures))
        .orElse(idfs.get(col).map(_.idf.size))
        .getOrElse(1) // numeric passthrough

    // uplift: the treatment column is the assembler's LAST input (the
    // VectorizationEngine treatment-last contract), one numeric slot
    val treatCol: Option[String] =
      if (uplift) {
        val last = assembler.getInputCols.last
        require(widthOf(last) == 1,
          s"uplift treatment column '$last' must be a single numeric slot")
        Some(last)
      } else None
    val shiftKey = assembler.getInputCols.map(widthOf).sum - 1

    // ---- model + calibration
    def coefJson(coefs: org.apache.spark.ml.linalg.Vector): String =
      coefs.toArray.zipWithIndex.collect {
        case (w, i) if w != 0.0 => s""""$i":$w"""
      }.mkString("{", ",", "}")
    val platt = chain.stages.collectFirst { case p: PlattScalarModel => p }
    val ovr = chain.stages.collectFirst {
      case m: graft.train.OneVsRestScoredModel => m
    }
    if (uplift && ovr.isDefined)
      throw new UnsupportedOperationException(
        "JS publish: uplift is a binary-model construct; OVR uplift is not publishable")
    ovr match {
      case Some(m) =>
        // multi-intent OVR: one coefficient block per class, classes in
        // indexer order (= chain.labels), per-class Platt sigmoids when
        // fitted (ref: the publish assembler's per-class maps)
        val base = m.models.head match {
          case _: LogisticRegressionModel => "lr"
          case _: LinearSVCModel => "svm"
          case other => throw new UnsupportedOperationException(
            s"JS publish: unsupported OVR base ${other.getClass.getSimpleName}")
        }
        val blocks = m.models.map {
          case lr: LogisticRegressionModel =>
            s"""{"intercept":${lr.intercept},"coefficients":${coefJson(lr.coefficients)}}"""
          case svm: LinearSVCModel =>
            s"""{"intercept":${svm.intercept},"coefficients":${coefJson(svm.coefficients)}}"""
          case other => throw new UnsupportedOperationException(
            s"JS publish: unsupported OVR base ${other.getClass.getSimpleName}")
        }
        val plattArr = platt.map(p =>
          p.a.zip(p.b).map { case (a, b) => s"""{"a":$a,"b":$b}""" }
            .mkString("[", ",", "]")).getOrElse("null")
        sb ++= s"""var graftModel = {"kind":"ovr","base":${jsStr(base)},"threshold":$threshold,\n"""
        sb ++= s""" "classes":[${chain.labels.map(jsStr).mkString(",")}],\n"""
        sb ++= s""" "platt":$plattArr,\n"""
        sb ++= s""" "models":[${blocks.mkString(",\n   ")}]};\n"""
      case None =>
        val (kind, coefs, intercept) = chain.stages
          .collectFirst {
            case m: LogisticRegressionModel => ("lr", m.coefficients, m.intercept)
            case m: LinearSVCModel => ("svm", m.coefficients, m.intercept)
          }
          .getOrElse(throw new UnsupportedOperationException(
            if (uplift)
              "JS publish: uplift chains are publishable only for linear bases " +
                "(LogisticRegression, Platt-calibrated LinearSVC)"
            else
              "JS publish supports binary/OVR LogisticRegression / LinearSVC models"))
        // SVM uplift without Platt has no probability to difference — the
        // Spark UpliftTransformer fails there too (LinearSVC emits no
        // probability column); refuse rather than publish hard 0/1 deltas
        if (uplift && kind == "svm" && platt.isEmpty)
          throw new UnsupportedOperationException(
            "JS publish: SVM uplift requires Platt calibration (plattScaling=true)")
        val upliftJson =
          if (uplift) s""""uplift":true,"shiftKey":$shiftKey,""" else ""
        sb ++= s"""var graftModel = {"kind":${jsStr(kind)},"intercept":$intercept,$upliftJson"threshold":$threshold,\n"""
        sb ++= s""" "platt":${platt.map(p => s"""{"a":${p.a.head},"b":${p.b.head}}""").getOrElse("null")},\n"""
        sb ++= s""" "coefficients":${coefJson(coefs)}};\n"""
    }

    // ---- vocab / idf JSON blocks
    vocabs.foreach { case (col, cv) =>
      val entries = cv.vocabulary.zipWithIndex
        .map { case (t, i) => s"${jsStr(t)}:$i" }
      sb ++= s"var graftVocab_${sane(col)} = {${entries.mkString(",")}};\n"
    }
    idfs.foreach { case (col, m) =>
      sb ++= s"var graftIdf_${sane(col)} = [${m.idf.toArray.mkString(",")}];\n"
    }

    if (hashes.nonEmpty) sb ++= murmurJs

    // ---- scorer
    sb ++= "function graftScore(input) {\n"
    // raw column reads happen lazily: first use of a column var reads input
    val declared = scala.collection.mutable.Set.empty[String]
    def ref(col: String): String = {
      if (!declared(col)) {
        sb ++= s"  var ${sane(col)} = (input[${jsStr(col)}] == null) ? \"\" : String(input[${jsStr(col)}]);\n"
        declared += col
      }
      sane(col)
    }
    def declare(col: String, expr: String): Unit = {
      sb ++= s"  var ${sane(col)} = $expr;\n"
      declared += col
    }

    val splitRe = "\\s|(~SP~)" // TextIOParams default composition
    stages.foreach {
      case t: CaseNormalizer =>
        declare(t.getOrDefault(t.outputCol), s"${ref(t.getOrDefault(t.inputCol))}.toLowerCase()")
      case t: SentenceMarker =>
        declare(t.getOrDefault(t.outputCol),
          s""""_class_ss " + ${ref(t.getOrDefault(t.inputCol))} + " _class_se"""")
      case t: NullImputer =>
        val in = t.getOrDefault(t.inputCol)
        declare(t.getOrDefault(t.outputCol),
          s"(input[${jsStr(in)}] == null) ? ${jsStr(t.getOrDefault(t.fillValue))} : String(input[${jsStr(in)}])")
      case t: StopWordsFilter =>
        val stops = t.getOrDefault(t.stopwords).map(jsStr).mkString(",")
        declare(t.getOrDefault(t.outputCol),
          s"${ref(t.getOrDefault(t.inputCol))}.split(${jsRegex(t.splitRegex)})" +
            s".filter(function(x){return x !== undefined && [$stops].indexOf(x) < 0;})" +
            """.join("~SP~")""")
      case t: WordSubstitutor =>
        val dict = t.getOrDefault(t.fromWords).zip(t.getOrDefault(t.toWords))
          .map { case (f, x) => s"${jsStr(f)}:${jsStr(x)}" }.mkString(",")
        sb ++= s"  var graftDict_${sane(t.getOrDefault(t.outputCol))} = {$dict};\n"
        declare(t.getOrDefault(t.outputCol),
          s"${ref(t.getOrDefault(t.inputCol))}.split(${jsRegex(t.splitRegex)})" +
            s".map(function(x){var r = graftDict_${sane(t.getOrDefault(t.outputCol))}[x];" +
            s"return r === undefined ? x : r;})" +
            """.filter(function(x){return x !== undefined;}).join("~SP~")""")
      case t: RegexReplacer =>
        val in = ref(t.getOrDefault(t.inputCol))
        val expr = t.getOrDefault(t.pairs).grouped(2).foldLeft(in) {
          case (acc, Array(re, repl)) => s"$acc.replace(${jsRegex(re)}, ${jsStr(repl)})"
          case (acc, _) => acc
        }
        declare(t.getOrDefault(t.outputCol), expr)
      case t: PorterStemming =>
        // published as identity — matches the reference's
        // PorterStemmingPublisher (empty JS body)
        declare(t.getOrDefault(t.outputCol), ref(t.getOrDefault(t.inputCol)))
      case t: RegexTokenizer =>
        declare(t.getOutputCol,
          s"${ref(t.getInputCol)}.split(${jsRegex(t.getPattern)})" +
            ".filter(function(x){return x !== undefined && x.length > 0;})")
      case t: TokenSplitter =>
        declare(t.getOrDefault(t.outputCol),
          s"${ref(t.getOrDefault(t.inputCol))}.split(${jsRegex(t.splitRegex)})" +
            ".filter(function(x){return x !== undefined && x.length > 0;})")
      case _: CountVectorizerModel | _: HashingTF | _: IDFModel | _: VectorAssembler => ()
      case s: SkipGramGenerator =>
        throw new UnsupportedOperationException(s"JS publish: unsupported stage ${s.uid}")
      case s: GramAssembler =>
        throw new UnsupportedOperationException(s"JS publish: unsupported stage ${s.uid}")
      case s: CategoricalAssembler =>
        throw new UnsupportedOperationException(s"JS publish: unsupported stage ${s.uid}")
      case other =>
        throw new UnsupportedOperationException(
          s"JS publish: unsupported stage ${other.getClass.getSimpleName}")
    }

    // ---- vectorization into one sparse feature map (assembler order)
    sb ++= "  var features = {};\n"
    var offset = 0
    assembler.getInputCols.foreach { col =>
      val inTokens = // trace tfidf: IDF input is the CountVectorizer output
        idfs.get(col).map(_.getInputCol).getOrElse(col)
      (vocabs.get(inTokens), hashes.get(inTokens), idfs.get(col)) match {
        case (Some(cv), _, idf) =>
          val toks = sane(cv.getInputCol)
          sb ++= s"  $toks.forEach(function(t){var i = graftVocab_${sane(inTokens)}[t];\n"
          sb ++= s"    if (i !== undefined) { var k = $offset + i; features[k] = (features[k]||0) + 1; }});\n"
          idf.foreach { m =>
            sb ++= s"  for (var i = 0; i < ${m.idf.size}; i++) { var k = $offset + i;\n"
            sb ++= s"    if (features[k] !== undefined) features[k] *= graftIdf_${sane(col)}[i]; }\n"
          }
        case (_, Some(h), idf) =>
          val toks = sane(h.getInputCol)
          sb ++= s"  $toks.forEach(function(t){var i = graftMurmurIndex(t, ${h.getNumFeatures});\n"
          sb ++= s"    var k = $offset + i; features[k] = (features[k]||0) + 1;});\n"
          idf.foreach { m =>
            sb ++= s"  for (var i = 0; i < ${m.idf.size}; i++) { var k = $offset + i;\n"
            sb ++= s"    if (features[k] !== undefined) features[k] *= graftIdf_${sane(col)}[i]; }\n"
          }
        case _ if treatCol.contains(col) =>
          // treatment slot: NOT read from input — the scorer forces it to
          // 0 (score₀) and 1 (score₁), mirroring UpliftTransformer's
          // slice+concat rewrite; leaving it out of `features` IS force-0
          sb ++= s"  // slot $offset (${col}): uplift treatment, forced by the scorer\n"
        case _ => // numeric passthrough column
          sb ++= s"  features[$offset] = Number(input[${jsStr(col)}] == null ? 0 : input[${jsStr(col)}]);\n"
      }
      offset += widthOf(col)
    }

    // ---- dot product + calibration + decision
    if (ovr.isDefined) {
      // per-class margins; probabilities = per-class Platt sigmoids when
      // fitted, else normalized base-LR sigmoids; prediction = argmax of
      // what the engine ranks on (probs under Platt, margins otherwise) —
      // strict > keeps the FIRST max, matching array_position semantics
      sb ++= "  var margins = [], probs = [];\n"
      sb ++= "  for (var ci = 0; ci < graftModel.models.length; ci++) {\n"
      sb ++= "    var m = graftModel.models[ci], mg = m.intercept;\n"
      sb ++= "    for (var k in features) { var w = m.coefficients[k];\n"
      sb ++= "      if (w !== undefined) mg += w * features[k]; }\n"
      sb ++= "    margins.push(mg);\n"
      sb ++= "    if (graftModel.platt != null) {\n"
      sb ++= "      probs.push(1 / (1 + Math.exp(-(graftModel.platt[ci].a * mg + graftModel.platt[ci].b))));\n"
      sb ++= "    } else if (graftModel.base === \"lr\") {\n"
      sb ++= "      probs.push(1 / (1 + Math.exp(-mg)));\n"
      sb ++= "    } else { probs.push(mg >= 0 ? 1 : 0); }\n"
      sb ++= "  }\n"
      sb ++= "  if (graftModel.platt == null && graftModel.base === \"lr\") {\n"
      sb ++= "    var psum = 0;\n"
      sb ++= "    for (var i = 0; i < probs.length; i++) psum += probs[i];\n"
      sb ++= "    for (var j = 0; j < probs.length; j++) probs[j] /= psum;\n"
      sb ++= "  }\n"
      sb ++= "  var rankBy = graftModel.platt != null ? probs : margins;\n"
      sb ++= "  var best = 0;\n"
      sb ++= "  for (var b = 1; b < rankBy.length; b++) if (rankBy[b] > rankBy[best]) best = b;\n"
      sb ++= "  return {margins: margins, probabilities: probs, prediction: best,\n"
      sb ++= "          predictedResponse: graftModel.classes[best]};\n"
    } else if (uplift) {
      // uplift: margin excludes the treatment slot (score₀); adding its
      // coefficient is exactly the forced-to-1 margin (score₁). Calibrate
      // each margin through the same (Platt or base-LR) sigmoid the Spark
      // UpliftTransformer applies per pass; publish Δ = score₁ − score₀
      // (ref: LogisticRegressionPublisher.generateProbabilityString,
      // SVMPublisher.generateProbabilityString — uplift branches)
      sb ++= "  var margin = graftModel.intercept;\n"
      sb ++= "  for (var k in features) { var c = graftModel.coefficients[k];\n"
      sb ++= "    if (c !== undefined) margin += c * features[k]; }\n"
      sb ++= "  var w = graftModel.coefficients[graftModel.shiftKey];\n"
      sb ++= "  var margin1 = margin + (w === undefined ? 0 : w);\n"
      sb ++= "  var score0, score1;\n"
      sb ++= "  if (graftModel.platt != null) {\n"
      sb ++= "    score0 = 1 / (1 + Math.exp(-(graftModel.platt.a * margin + graftModel.platt.b)));\n"
      sb ++= "    score1 = 1 / (1 + Math.exp(-(graftModel.platt.a * margin1 + graftModel.platt.b)));\n"
      sb ++= "  } else {\n"
      sb ++= "    score0 = 1 / (1 + Math.exp(-margin));\n"
      sb ++= "    score1 = 1 / (1 + Math.exp(-margin1));\n"
      sb ++= "  }\n"
      sb ++= "  var score = score1 - score0;\n"
      sb ++= "  return {margin: margin, score0: score0, score1: score1,\n"
      sb ++= "          probability: score,\n"
      sb ++= "          isHotLead: score >= graftModel.threshold ? 1 : 0};\n"
    } else {
      sb ++= "  var margin = graftModel.intercept;\n"
      sb ++= "  for (var k in features) { var c = graftModel.coefficients[k];\n"
      sb ++= "    if (c !== undefined) margin += c * features[k]; }\n"
      sb ++= "  var probability;\n"
      sb ++= "  if (graftModel.platt != null) {\n"
      sb ++= "    probability = 1 / (1 + Math.exp(-(graftModel.platt.a * margin + graftModel.platt.b)));\n"
      sb ++= "  } else if (graftModel.kind === \"lr\") {\n"
      sb ++= "    probability = 1 / (1 + Math.exp(-margin));\n"
      sb ++= "  } else { probability = margin >= 0 ? 1 : 0; }\n"
      sb ++= "  return {margin: margin, probability: probability,\n"
      sb ++= "          isHotLead: probability >= graftModel.threshold ? 1 : 0};\n"
    }
    sb ++= "}\n"
    sb.toString
  }

  /** Assemble per-page scorers into ONE self-contained file — the
    * reference's deployment artifact: its PublishAssembler emits a single
    * JS with per-page `if(c_page_count==k)` blocks
    * (ref: publish/PublishAssembler.scala, driven by Publish.scala:41-53).
    *
    * Each page's [[generate]] output is embedded VERBATIM inside an IIFE
    * (its `graftScore` becomes `graftPage<k>`, its vars page-scoped), so
    * the single-page probability parity proven by `JsPublishSpec` carries
    * over unchanged; the top-level `graftScore(input)` dispatches on the
    * page column, the LAST page accumulating `page >= k` exactly like the
    * trainer's page split. */
  def assemble(pages: Seq[(Int, String)], pageCol: String): String = {
    require(pages.nonEmpty, "assemble requires at least one page scorer")
    // the dispatch is exact-match per page with only the MAX page
    // accumulating `>=`; a gap (e.g. pages 1 and 3) would silently score
    // in-range traffic as null — refuse at assembly time instead
    val keys = pages.map(_._1)
    require(keys.distinct.size == keys.size,
      s"assemble: duplicate page keys ${keys.mkString(",")}")
    require(keys.sorted == (keys.min to keys.max).toSeq,
      s"assemble: page keys must be contiguous, got ${keys.sorted.mkString(",")}")
    val sb = new StringBuilder
    sb ++= "// graft published multi-page scorer (generated)\n"
    val ordered = pages.sortBy(_._1)
    ordered.foreach { case (k, js) =>
      sb ++= s"var graftPage$k = (function(){\n"
      sb ++= js
      sb ++= "return graftScore;\n})();\n"
    }
    val maxPage = ordered.last._1
    sb ++= "function graftScore(input) {\n"
    sb ++= s"  var page = Number(input[${jsStr(pageCol)}]);\n"
    ordered.foreach { case (k, _) =>
      val cond = if (k == maxPage) s"page >= $k" else s"page == $k"
      sb ++= s"  if ($cond) return graftPage$k(input);\n"
    }
    sb ++= "  return null;\n}\n"
    sb.toString
  }

  /** murmur3_x86_32 over UTF-8 bytes, seed 42 — the exact hash
    * spark.ml HashingTF uses for string terms; index = non-negative mod
    * (ref JS twin: publish/vectorization/HashingTFPublisher.scala). */
  private val murmurJs: String =
    """function graftUtf8(str) {
      |  var out = [];
      |  for (var i = 0; i < str.length; i++) {
      |    var c = str.codePointAt(i);
      |    if (c > 0xFFFF) i++;
      |    if (c < 0x80) out.push(c);
      |    else if (c < 0x800) { out.push(0xC0 | (c >> 6), 0x80 | (c & 63)); }
      |    else if (c < 0x10000) { out.push(0xE0 | (c >> 12), 0x80 | ((c >> 6) & 63), 0x80 | (c & 63)); }
      |    else { out.push(0xF0 | (c >> 18), 0x80 | ((c >> 12) & 63), 0x80 | ((c >> 6) & 63), 0x80 | (c & 63)); }
      |  }
      |  return out;
      |}
      |function graftMul32(a, b) {
      |  return ((a & 0xffff) * b + ((((a >>> 16) * b) & 0xffff) << 16)) | 0;
      |}
      |function graftMurmur3(bytes, seed) {
      |  var h1 = seed | 0, c1 = 0xcc9e2d51, c2 = 0x1b873593;
      |  var n = bytes.length - (bytes.length % 4);
      |  for (var i = 0; i < n; i += 4) {
      |    var k1 = (bytes[i] & 0xff) | ((bytes[i+1] & 0xff) << 8) |
      |             ((bytes[i+2] & 0xff) << 16) | ((bytes[i+3] & 0xff) << 24);
      |    k1 = graftMul32(k1, c1); k1 = (k1 << 15) | (k1 >>> 17); k1 = graftMul32(k1, c2);
      |    h1 ^= k1; h1 = (h1 << 13) | (h1 >>> 19); h1 = (graftMul32(h1, 5) + 0xe6546b64) | 0;
      |  }
      |  var kt = 0; // tail: accumulate LE, one k-mix XORed in (no h-mix) —
      |  for (var j = n, sh = 0; j < bytes.length; j++, sh += 8) {
      |    kt ^= (bytes[j] & 0xff) << sh;
      |  }
      |  kt = graftMul32(kt, c1); kt = (kt << 15) | (kt >>> 17); kt = graftMul32(kt, c2);
      |  h1 ^= kt;
      |  h1 ^= bytes.length;
      |  h1 ^= h1 >>> 16; h1 = graftMul32(h1, 0x85ebca6b);
      |  h1 ^= h1 >>> 13; h1 = graftMul32(h1, 0xc2b2ae35);
      |  h1 ^= h1 >>> 16;
      |  return h1 | 0;
      |}
      |function graftMurmurIndex(term, numFeatures) {
      |  var h = graftMurmur3(graftUtf8(term), 42);
      |  return ((h % numFeatures) + numFeatures) % numFeatures;
      |}
      |""".stripMargin
}
