package graft

class RunStatusListenerSpec extends SparkSpec {

  behavior of "RunStatusListener"

  it should "track job progress and report COMPLETED" in {
    @volatile var last: Option[RunStatus] = None
    val l = new RunStatusListener(st => last = Some(st))
    spark.sparkContext.addSparkListener(l)
    try {
      import spark.implicits._
      (1 to 1000).toDF("x").groupBy(($"x" % 7).as("k")).count().collect()
      // listener bus is async — poll briefly for delivery
      val deadline = System.currentTimeMillis() + 10000
      while (l.status.jobsSucceeded < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val st = l.status
      st.jobsStarted should be >= 1L
      st.jobsSucceeded should be >= 1L
      st.jobsFailed shouldBe 0L
      st.stagesCompleted should be >= 1L
      st.tasksCompleted should be >= 1L
      st.state shouldBe "COMPLETED"
      last.isDefined shouldBe true
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
