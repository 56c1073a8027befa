package graft

import graft.gen.Gen
import graft.lake.LakeTable
import graft.model.{TableMapping, Transcripts}
import graft.streaming.CdcStream
import graft.verify.Oracle
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Streaming ingestion: checkpoint resume, crash-window replay (lake commit
  * durable but checkpoint commit lost), and incremental WAL-segment arrival
  * — the f_resume fixture of FIXTURES.md §3. */
class StreamSpec extends AnyFunSuite {

  lazy val spark = SparkTestBase.spark

  private val mapping = TableMapping("transcripts", "transcripts")

  private def compare(lake: LakeTable, cfg: Gen.Config, upToId: Long): Unit = {
    val spec = Transcripts.spec()
    val localEvents = (0L until upToId).map(id => Gen.mkEvent(id, cfg))
    val want = Oracle.canonical(Oracle.replay(localEvents, spec, mapping),
      lake.schema.fieldNames.toSeq)
    val schema = lake.schema
    val got = lake.read()
      .select(schema.fieldNames.map(c => col(c).cast("string").as(c)).toIndexedSeq: _*)
      .collect().toSeq
      .map { r =>
        val m = schema.fieldNames.map(c => c -> r.getAs[String](c)).toMap
        (spec.mergeKey.map(m), schema.fieldNames.toSeq.map(m))
      }
      .sortBy(_._1.map(s => if (s == null) "" else s).mkString(""))
    assert(got.size == want.size, s"rows: engine=${got.size} oracle=${want.size}")
    got.zip(want).foreach { case (g, w) => assert(g == w, s"\n engine=$g\n oracle=$w") }
  }

  test("stream: full replay via AvailableNow, resume, crash-window replay, late segments") {
    val cfg = Gen.Config(numEvents = 16000, numConvs = 150, seed = 21)
    val dir = SparkTestBase.tmpDir("stream")
    val logDir = s"$dir/wal"
    val logGlob = s"$dir/wal/seg-*" // file source needs the glob to descend
    val ckpt = s"$dir/ckpt"
    val segs = 8
    val perSeg = cfg.numEvents / segs

    // phase 1: first 4 WAL segments arrive, stream drains them
    Gen.writeSegments(spark, cfg, logDir, segs, 0 until 4)
    val lake = LakeTable.create(spark, s"$dir/transcripts", Transcripts.spec())
    CdcStream.runAvailable(spark, logGlob, ckpt, Seq(CdcStream.Route(mapping, lake)))
    compare(lake, cfg, 4L * perSeg)
    val epochAfter1 = lake.snapshot().properties("commit-epoch").toLong

    // phase 2: crash window — the lake commit survived but the stream's
    // checkpoint commit was lost; Spark replays the last batch on restart
    // and the epoch check must skip it (no dupes, no loss)
    val commitsDir = Paths.get(ckpt, "commits")
    val lastCommit = Files.list(commitsDir).iterator.asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .toSeq.sortBy(_.getFileName.toString.toLong).last
    Files.delete(lastCommit)
    // the local ChecksumFs keeps a hidden .N.crc sibling; a real HDFS crash
    // would lose both, so drop it too
    Files.deleteIfExists(lastCommit.resolveSibling(s".${lastCommit.getFileName}.crc"))
    val v1 = lake.currentVersion
    CdcStream.runAvailable(spark, logGlob, ckpt, Seq(CdcStream.Route(mapping, lake)))
    assert(lake.snapshot().properties("commit-epoch").toLong == epochAfter1,
      "replayed batch must be skipped by the epoch check")
    assert(lake.currentVersion == v1, "no new snapshot from a replayed batch")
    compare(lake, cfg, 4L * perSeg)

    // phase 3: four more segments arrive; a fresh query on the same
    // checkpoint resumes past the applied offsets and drains only the rest
    Gen.writeSegments(spark, cfg, logDir, segs, 4 until 8)
    CdcStream.runAvailable(spark, logGlob, ckpt, Seq(CdcStream.Route(mapping, lake)))
    compare(lake, cfg, cfg.numEvents)
    assert(lake.snapshot().properties("commit-epoch").toLong > epochAfter1)
    // lineage recorded per batch
    assert(lake.snapshot().lineage.nonEmpty)
  }
}
