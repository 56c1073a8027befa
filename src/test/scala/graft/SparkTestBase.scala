package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.Files

object SparkTestBase {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.lake.BareLocalFileSystem].getName)
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()

  def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString
}
