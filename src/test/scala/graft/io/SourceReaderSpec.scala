package graft.io

import graft.SparkSpec
import graft.config.{ColumnsConf, DataConf}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Reader formats + SQL view chain + input shaping
  * (ref: dal/HDFSFileReader.scala:20-61, dal/DataReader.scala:105-167). */
class SourceReaderSpec extends SparkSpec {

  private def tmp(prefix: String, name: String, content: String): String = {
    val dir = Files.createTempDirectory(prefix)
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  behavior of "SourceReader"

  it should "read csv with header and inferred schema" in {
    val p = tmp("graft-csv", "d.csv", "id,name,score\n1,alpha,0.5\n2,beta,1.5\n")
    val df = SourceReader.read(spark, DataConf(s"csv://$p"), ColumnsConf(response = "name"))
    df.count() shouldBe 2
    df.schema("id").dataType.typeName shouldBe "integer"
    df.schema("score").dataType.typeName shouldBe "double"
  }

  it should "read tsv and json" in {
    val t = tmp("graft-tsv", "d.tsv", "id\tname\n1\talpha\n2\tbeta\n3\tgamma\n")
    SourceReader.read(spark, DataConf(s"tsv://$t"), ColumnsConf(response = "name"))
      .count() shouldBe 3
    val j = tmp("graft-json", "d.json",
      """{"id":1,"name":"alpha"}
        |{"id":2,"name":null}
        |""".stripMargin)
    // default filter drops null responses (ref: DataReader.scala:128-141)
    SourceReader.read(spark, DataConf(s"json://$j"), ColumnsConf(response = "name"))
      .count() shouldBe 1
  }

  it should "read orc with pushdown intact" in {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-orc").resolve("t.orc").toString
    Seq((1, "alpha", 0.5), (2, "beta", 1.5), (3, "gamma", 2.5))
      .toDF("id", "name", "score").write.orc(dir)
    val df = SourceReader.read(spark,
      DataConf(s"orc://$dir", customFilter = Some("score > 1.0")),
      ColumnsConf(response = "name"))
    df.count() shouldBe 2
    // the filter must reach the ORC scan, not sit in a post-scan Filter only
    df.queryExecution.executedPlan.toString should include ("PushedFilters: [IsNotNull(score), GreaterThan(score,1.0)]")
  }

  it should "run the SQL view chain with numbered temp views" in {
    val p = tmp("graft-chain", "d.csv", "id,v\n1,10\n2,20\n3,30\n")
    val df = SourceReader.read(spark,
      DataConf(s"csv://$p", queries = Seq(
        "SELECT id, v * 2 AS v2 FROM graftView0",
        "SELECT id, v2 FROM graftView1 WHERE v2 > 20")),
      ColumnsConf(response = "v2"))
    df.as[(Int, Int)](org.apache.spark.sql.Encoders.product[(Int, Int)])
      .collect().toSet shouldBe Set((2, 40), (3, 60))
  }

  it should "apply customFilter before derivation and derive time_on_page" in {
    val p = tmp("graft-derive", "d.csv",
      "uid,page,t\n7,1,100\n7,2,160\n7,3,220\n8,1,50\n")
    val df = SourceReader.read(spark,
      DataConf(s"csv://$p", customFilter = Some("uid = 7")),
      ColumnsConf(response = "uid", primaryKey = Seq("uid"),
        page = Some("page"), dateVariable = Some("t"), randomVariable = Some("rv")))
    df.count() shouldBe 3
    df.columns should contain allOf ("rv", "time_on_page")
    val dwell = df.orderBy("page").select("time_on_page")
      .collect().map(r => Option(r.get(0)))
    dwell shouldBe Array(Some(60.0), Some(60.0), None) // lead() - current
    val rv = df.select("rv").head().getDouble(0)
    rv should (be >= 0.0 and be < 100.0)
  }

  it should "read jdbc sources with the first query pushed database-side" in {
    // embedded Derby stands in for the reference's Vertica endpoint
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE people (id INT, name VARCHAR(20), score DOUBLE)")
    st.execute("INSERT INTO people VALUES (1, 'alpha', 0.5), (2, 'beta', 1.5), (3, 'gamma', 2.5)")
    st.close(); conn.close()
    val df = SourceReader.read(spark,
      DataConf("jdbc://jdbc:derby:memory:graftdb", queries = Seq(
        "SELECT id, name FROM people WHERE score > 1.0",   // runs in the DB
        "SELECT * FROM graftView0 WHERE id < 3")),          // runs in Spark
      ColumnsConf(response = "NAME"))
    df.select("ID").collect().map(_.getInt(0)).toSeq shouldBe Seq(2)
  }

  it should "resolve hive:// sources through the session catalog" in {
    import spark.implicits._
    Seq((1, "x"), (2, "y"), (3, null: String)).toDF("id", "label")
      .createOrReplaceTempView("hive_backed")
    val df = SourceReader.read(spark, DataConf("hive://hive_backed"),
      ColumnsConf(response = "label"))
    df.count() shouldBe 2 // default response-not-null filter applies
  }

  it should "split pages with last-page accumulation" in {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b"), (3, "c"), (5, "d")).toDF("page", "x")
    val pages = SourceReader.splitPages(df, "page", 3)
    pages.map(_.count()) shouldBe Seq(1, 1, 2) // page 3 takes page >= 3
  }
}
