package graft

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries at a given SF dir (perf A/Bs without
  * a full Bench run). Usage: runMain graft.QueryTime <sfDir> q1 [q2 ...]
  * (repeats each query SPARK_GRAFT_QT_RUNS times, default 2, prints each
  * wall time; interleave A/B via env toggles between invocations). */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val runs = sys.env.getOrElse("SPARK_GRAFT_QT_RUNS", "2").toInt
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.lake.BareLocalFileSystem].getName)
    // ad-hoc conf overrides for A/Bs (same contract as Probe):
    // GRAFT_CONF="k=v;k2=v2"
    sys.env.get("GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_JOBLOG=1: per-job wall time + description to stdout (where does
    // a query's time go, job by job)
    if (sys.env.get("GRAFT_JOBLOG").contains("1")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, (System.nanoTime(),
            Option(j.properties.getProperty("spark.job.description")).getOrElse("") +
              " stages=" + j.stageInfos.size))
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, d) = starts.getOrDefault(j.jobId, (0L, "?"))
          println(f"[job] ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%6.2f s $d")
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val ms = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b)
            .getOrElse(0L)
          if (ms >= 100)
            println(f"[stage] ${i.stageId}%4d ${ms / 1e3}%6.2f s tasks=${i.numTasks}%3d ${i.name.take(90)}")
        }
      })
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        val cnt = fn(spark, sfDir).count()
        println(f"[qt] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$cnt")
      }
    }
    spark.stop()
  }
}
