package graft.features

import graft.SparkSpec
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.linalg.Vector

/** Every vectorization method produces the declared vector geometry
  * (ref: core/VectorizationEngine.scala:88-233). */
class VectorizationSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    Seq("spark", "scala", "engine", "spark"),
    Seq("fast", "engine", "query")).toDF("toks")

  behavior of "VectorizationEngine vectorizers"

  it should "produce slot-sized vectors for hashingtf / count_vectorizer / tfidf" in {
    for (method <- Seq("hashingtf", "count_vectorizer", "tfidf")) {
      val stages = VectorizationEngine.vectorizerStages(method, 32, "toks", "vec")
      val out = new Pipeline().setStages(stages.toArray).fit(df).transform(df)
      val v = out.select("vec").head().getAs[Vector](0)
      withClue(s"$method: ") {
        v.size should be <= 32
        v.size should be > 0
      }
    }
  }

  it should "produce dense embedding vectors for word2vec" in {
    // word2vec's default minCount=5 needs each word seen >= 5 times
    val corpus = (0 until 6).map(_ => Seq("spark", "scala", "engine")).toDF("toks")
    val stages = VectorizationEngine.vectorizerStages("word2vec", 16, "toks", "vec")
    val out = new Pipeline().setStages(stages.toArray).fit(corpus).transform(corpus)
    val v = out.select("vec").head().getAs[Vector](0)
    v.size shouldBe 16
  }

  it should "reject unknown methods" in {
    an[IllegalArgumentException] should be thrownBy
      VectorizationEngine.vectorizerStages("bm25", 8, "toks", "vec")
  }
}
