package graft

/** Single-query formatted-plan dump to stdout — the per-round plan-evidence
  * tool behind plans/r14/<query>_{before,after}.txt (PlanDump writes the
  * whole headline set; this dumps ONE query for a before/after diff). */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    System.setProperty("graft.plans.lazy", "true")
    val spark = GraftSession.local(GraftSession.envCores, "graft-plan-one")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
