package graft

import graft.gen.Gen
import graft.lake.LakeTable
import graft.model.{TableMapping, Transcripts}
import graft.operators.Replay
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Snapshot expiry + data-file reclamation: vacuumed files are gone,
  * retained time travel still reads, orphans are swept. */
class LakeVacuumSpec extends AnyFunSuite {

  lazy val spark = SparkTestBase.spark

  private def parquetCount(root: String): Int =
    Files.list(Paths.get(root, "data")).iterator.asScala
      .count(_.getFileName.toString.endsWith(".parquet"))

  test("vacuum reclaims unreferenced files, keeps retained time travel") {
    val dir = SparkTestBase.tmpDir("vac")
    val lake = LakeTable.create(spark, dir, Transcripts.spec(numBuckets = 4))
    val mapping = TableMapping("transcripts", "transcripts")
    val cfg = Gen.Config(numEvents = 3000, numConvs = 30, seed = 5)
    val all = Gen.events(spark, cfg)
    import spark.implicits._
    (0 until 3).foreach { b =>
      val lo = b * 1000L; val hi = lo + 1000L
      Replay.applyBatch(lake,
        all.filter(e => (e.lsn - 1) * cfg.txnSize + e.seq >= lo &&
          (e.lsn - 1) * cfg.txnSize + e.seq < hi), mapping, b)
    }
    // plant an orphan (crashed write that never committed)
    Files.write(Paths.get(dir, "data", "borphan-dead.parquet"), Array[Byte](1))

    val before = parquetCount(dir)
    val versions = (1L to lake.currentVersion)
    val wantRows = lake.read().count()
    val prevVersion = lake.currentVersion - 1
    val prevRows = lake.read(prevVersion).count()

    val (expired, deleted) = lake.vacuum(retainVersions = 2)
    assert(expired == versions.size - 2)
    assert(deleted > 0, "rewritten bucket files + orphan must be reclaimed")
    assert(parquetCount(dir) == before - deleted)
    assert(!Files.exists(Paths.get(dir, "data", "borphan-dead.parquet")))

    // current and retained-previous snapshots still read fully
    assert(lake.read().count() == wantRows)
    assert(lake.read(prevVersion).count() == prevRows)
    // all retained files exist on disk
    lake.snapshot().files.foreach(f => assert(Files.exists(Paths.get(f.path))))
    // expired manifest is gone
    assert(!Files.exists(Paths.get(dir, "_meta", f"v${1L}%020d.json")))
    // the table keeps working after vacuum: one more batch applies cleanly
    Replay.applyBatch(lake,
      all.filter(e => (e.lsn - 1) * cfg.txnSize + e.seq >= 2000L), mapping, 3)
    assert(lake.read().count() > 0)
  }
}
