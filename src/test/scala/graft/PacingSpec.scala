package graft

import graft.lake.LakeTable
import graft.model.Transcripts
import graft.operators.Backfill
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Backfill pacing: the reference's token-bucket full-sync rate limit
  * (`full_sync.go:39-50`) as bucket-group chunked commits with a rows/sec
  * cap and crash-resumable progress. */
class PacingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def mkSource(n: Int) = (0 until n).map(i =>
    (f"c$i%06d", i % 4, "user", s"t$i", null: String,
      java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
    .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  /** Rows added by each commit after table creation (version 1). */
  private def rowsPerCommit(lake: LakeTable): Seq[Long] = {
    (2L to lake.currentVersion).map { v =>
      val prev = lake.snapshot(v - 1).files.map(_.path).toSet
      val added = lake.snapshot(v).files.filterNot(f => prev.contains(f.path))
      if (added.isEmpty) 0L
      else spark.read.parquet(added.map(_.path): _*).count()
    }
  }

  test("maxRowsPerCommit bounds every commit; all rows land exactly once") {
    val lake = LakeTable.create(spark, SparkTestBase.tmpDir("pace"),
      Transcripts.spec(numBuckets = 8))
    Backfill.initialSync(lake, mkSource(4000),
      pacing = Some(Backfill.Pacing(maxRowsPerCommit = 1200)))
    val per = rowsPerCommit(lake)
    assert(per.size >= 4, s"4000 rows / 1200 cap needs >= 4 commits, got $per")
    // bucket groups respect the cap (uniform hash: no single bucket > cap)
    assert(per.forall(_ <= 1200), s"per-commit rows exceed the cap: $per")
    assert(per.sum == 4000)
    assert(lake.read().count() == 4000)
    assert(lake.snapshot().properties("full-sync") == "true")
  }

  test("rows/sec cap paces the chunk commits") {
    val lake = LakeTable.create(spark, SparkTestBase.tmpDir("pacerate"),
      Transcripts.spec(numBuckets = 8))
    val t0 = System.nanoTime()
    Backfill.initialSync(lake, mkSource(2000),
      pacing = Some(Backfill.Pacing(maxRowsPerCommit = 500,
        rowsPerSec = Some(4000))))
    val elapsed = (System.nanoTime() - t0) / 1e9
    // 2000 rows at 4000 rows/sec = 0.5 s minimum (minus the unpaced last
    // chunk); generous lower bound to stay noise-proof
    assert(elapsed >= 0.3, f"pacing must throttle: $elapsed%.2f s")
    assert(lake.read().count() == 2000)
  }

  test("crashed chunked sync resumes after the last committed chunk") {
    val lake = LakeTable.create(spark, SparkTestBase.tmpDir("paceresume"),
      Transcripts.spec(numBuckets = 8))
    val src = mkSource(4000)
    // "crash" after 2 chunk commits
    Backfill.initialSync(lake, src,
      pacing = Some(Backfill.Pacing(maxRowsPerCommit = 1200, abortAfterChunks = 2)))
    val mid = lake.read().count()
    assert(mid > 0 && mid < 4000, s"partial sync expected, got $mid")
    assert(!lake.snapshot().properties.contains("full-sync"),
      "completion property must not be set by a crashed sync")
    assert(lake.snapshot().properties("full-sync-chunks-done") == "2")
    // resume: same source -> deterministic chunks -> no duplicates, no loss
    Backfill.initialSync(lake, src,
      pacing = Some(Backfill.Pacing(maxRowsPerCommit = 1200)))
    assert(lake.read().count() == 4000)
    assert(lake.read().select("conv_id", "turn_idx").distinct().count() == 4000)
    assert(lake.snapshot().properties("full-sync") == "true")
  }
}
