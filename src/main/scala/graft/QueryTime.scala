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
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.lake.BareLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
