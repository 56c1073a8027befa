package graft

import org.apache.spark.sql.SparkSession

/** Plan-evidence capture (not part of the driver contract): prints
  * `.explain("formatted")` of each named SparkEntry query's RETURNED frame
  * between BEGIN/END markers; with GRAFT_EXPLAIN=1 the engine additionally
  * prints its internal merge/fold/band-probe plans (Replay.explain) while
  * the query executes — the shapes that never appear in a returned frame.
  * Usage: sbt "runMain graft.PlanDump <sfDir> q1 [q2 ...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.lake.BareLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"==== QUERY BEGIN $n ====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"==== PLAN BEGIN $n (returned frame) ====")
      df.explain("formatted")
      println(s"==== PLAN END $n (returned frame) ====")
      println(s"==== QUERY END $n ====")
    }
    spark.stop()
  }
}
