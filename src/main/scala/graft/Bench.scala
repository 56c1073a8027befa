package graft

import graft.gen.Gen
import graft.lake.LakeTable
import graft.model.{TableMapping, Transcripts}
import graft.operators.Replay
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract: ONE JSON line on stdout).
  *
  * Primary metric (BASELINE.json): sustained change-events/sec applied,
  * replay-to-converged wall time, on the deterministic synthetic transcript
  * CDC log — measured at two CLUSTER SIZES on the SAME on-disk input, per
  * the north rule's N -> 4N executor protocol:
  *
  *   local-cluster[1,4,m]  (1 executor JVM x 4 cores)   vs
  *   local-cluster[4,4,m]  (4 executor JVMs x 4 cores)
  *
  *   efficiency = eps(4N) / (4 * eps(N))
  *
  * local-cluster spawns REAL separate executor JVMs (the closest sandbox
  * analog of spark-submit against a standalone cluster): each executor has
  * its own heap/GC, so allocation-heavy stages contend per-executor as on
  * a genuine cluster, not inside one shared 32-thread heap. Falls back to
  * local[4]/local[16] when no Spark distribution is present. The two
  * levels are interleaved and min-per-level is reported (this host is a
  * shared VM with ~±30% run-to-run noise).
  *
  * Also times every SparkEntry query suite entry at SPARK_GRAFT_SF_DIR
  * (local[32]).
  */
object Bench {

  private val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
  private val haveDistro = new java.io.File(s"$sparkHome/jars").isDirectory

  private def clusterMaster(executors: Int, coresPerExec: Int): String =
    if (haveDistro) s"local-cluster[$executors,$coresPerExec,8192]"
    else s"local[${executors * coresPerExec}]"

  private def session(master: String, parallelism: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(s"graft-bench-$parallelism")
      .config("spark.sql.shuffle.partitions", parallelism.toString)
      .config("spark.default.parallelism", parallelism.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.lake.BareLocalFileSystem].getName)
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.memory", "6g") // worker caps at 8192m; default 1g OOMs on multi-M-event batches
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Replay the `nBatches` pre-materialized WAL segments into a fresh lake
    * table; returns wall seconds (read + fold + merge + commit). */
  private def replay(spark: SparkSession, walDir: String, nBatches: Int,
                     tableDir: String, salts: Int): Double = {
    import spark.implicits._
    val lake = LakeTable.create(spark, tableDir,
      Transcripts.spec(numBuckets = 64))
    val mapping = TableMapping("transcripts", "transcripts")
    val t0 = System.nanoTime()
    (0 until nBatches).foreach { b =>
      val batch = spark.read
        .schema(graft.model.ChangeEvent.schema)
        .parquet(f"$walDir/seg-$b%05d").as[graft.model.ChangeEvent]
      Replay.applyBatch(lake, batch, mapping, b, salts)
    }
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // defaults sized so a full driver-run finishes in ~8 min; raise
    // SPARK_GRAFT_BENCH_EVENTS/RUNS for tighter (min-of-2) measurements
    val events = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "12000000").toLong
    val warmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "400000").toLong
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "1").toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BENCH_BATCHES", "4").toInt
    val salts = 8
    val coresPerExec = 4
    val loExec = 1
    val hiExec = 4
    val loMaster = clusterMaster(loExec, coresPerExec)
    val hiMaster = clusterMaster(hiExec, coresPerExec)

    val work = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val cfg = Gen.Config(numEvents = events,
      numConvs = math.max(64, (events / 64).toInt), turnsPerConv = 32,
      skew = 2.0, numPartitions = 32)
    val wcfg = cfg.copy(numEvents = warmup,
      numConvs = math.max(64, (warmup / 64).toInt))

    // materialize the shared input once (excluded from timing)
    locally {
      val s = session("local[32]", 32)
      Gen.writeLog(s, cfg, s"$work/wal", nBatches, filesPerSegment = 32)
      Gen.writeLog(s, wcfg, s"$work/wal-warm", nBatches, filesPerSegment = 32)
      s.stop()
    }

    var runId = 0
    def measured(master: String, parallelism: Int): Double = {
      val s = session(master, parallelism)
      try {
        runId += 1
        replay(s, s"$work/wal-warm", nBatches, s"$work/warm-$parallelism-$runId", salts) // JIT warmup
        replay(s, s"$work/wal", nBatches, s"$work/t-$parallelism-$runId", salts)
      } finally s.stop()
    }

    val samples = (1 to runs).flatMap(_ => Seq(
      "hi" -> measured(hiMaster, hiExec * coresPerExec),
      "lo" -> measured(loMaster, loExec * coresPerExec)))
    val tLo = samples.collect { case ("lo", t) => t }.min
    val tHi = samples.collect { case ("hi", t) => t }.min
    val epsLo = events / tLo
    val epsHi = events / tHi
    val eff = epsHi / (4.0 * epsLo)

    // per-query suite timings on the driver-designated sf dir
    val s = session("local[32]", 32)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(s, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    s.stop()

    // best-effort cleanup of local-cluster executor log dirs
    try {
      val wd = new java.io.File(s"$sparkHome/work")
      if (wd.isDirectory) wd.listFiles().foreach { f =>
        def rm(x: java.io.File): Unit = {
          if (x.isDirectory) x.listFiles().foreach(rm); x.delete()
        }
        rm(f)
      }
    } catch { case _: Throwable => }

    val qs = queries.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"cdc_replay_events_per_sec","value":${epsHi.round},"unit":"events/sec","queries":$qs,"sf":"$sfDir","scaling":{"events":$events,"executors_lo":$loExec,"executors_hi":$hiExec,"cores_per_executor":$coresPerExec,"master_lo":"$loMaster","master_hi":"$hiMaster","sec_lo":${f"$tLo%.2f"},"sec_hi":${f"$tHi%.2f"},"eps_lo":${epsLo.round},"eps_hi":${epsHi.round},"efficiency":${f"$eff%.3f"}},"query_suite_total_sec":${f"${queries.map(_._2).sum}%.2f"}}""")
  }
}
