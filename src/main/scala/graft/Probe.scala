package graft

/** Scratch probe main (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
    ev.printSchema()
    ev.show(3, truncate = false)
    spark.stop()
  }
}
