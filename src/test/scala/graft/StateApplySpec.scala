package graft

import graft.gen.Gen
import graft.model.{ChangeEvent, TableMapping, Transcripts}
import graft.streaming.StateApply
import graft.verify.Oracle
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The state-store apply strategy vs the sequential oracle: batch-mode
  * equality (PK-updates, TOAST) and streaming resume from the state-store
  * checkpoint across added WAL segments. */
class StateApplySpec extends AnyFunSuite {

  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val mapping = TableMapping("transcripts", "transcripts")
  private val mergeKey = Seq("conv_id", "turn_idx")

  private def finalStates(df: org.apache.spark.sql.DataFrame): Map[String, Map[String, String]] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("ord").desc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(col("exists")).select("key", "row").collect()
      .map(r => r.getString(0) -> r.getMap[String, String](1).toMap).toMap
  }

  test("batch-mode state apply equals the sequential oracle (pk-updates, TOAST)") {
    val cfg = Gen.Config(numEvents = 15000, numConvs = 120, seed = 91,
      pPkUpdate = 0.15, pToast = 0.4)
    val emits = StateApply.stream(Gen.events(spark, cfg), mergeKey).toDF()
    val got = finalStates(emits)
    val localEvents = (0L until cfg.numEvents).map(id => Gen.mkEvent(id, cfg))
    val want = Oracle.replay(localEvents, Transcripts.spec(), mapping)
    assert(got.size == want.size, s"${got.size} vs ${want.size}")
    want.foreach { case (k, row) =>
      val key = k.map(x => if (x == null) "" else x).mkString(StateApply.KeySep)
      val g = got.getOrElse(key, fail(s"missing key $k"))
      Transcripts.schema.fieldNames.foreach { c =>
        assert(g.getOrElse(c, null) == row.getOrElse(c, null), s"key $k col $c")
      }
    }
  }

  test("streaming state apply resumes from checkpoint across added segments") {
    val dir = SparkTestBase.tmpDir("stateapply")
    val cfg = Gen.Config(numEvents = 8000, numConvs = 60, seed = 92)
    Gen.writeSegments(spark, cfg, s"$dir/wal", 4, 0 until 2)

    def run(outDir: String): Unit = {
      val src = spark.readStream.schema(ChangeEvent.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/wal/seg-*").as[ChangeEvent]
      val q = StateApply.stream(src, mergeKey).toDF().writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(outDir)
        }
        .start()
      q.awaitTermination()
    }
    run(s"$dir/out1")
    // crash window: more WAL lands, a new query resumes from the same
    // checkpoint — per-key state survives in the state store
    Gen.writeSegments(spark, cfg, s"$dir/wal", 4, 2 until 4)
    run(s"$dir/out2")

    // phase 2 emits only keys touched by segments 2-3, with state carried
    // from phase 1. Verify those reflect the FULL history.
    val p2 = finalStates(spark.read.parquet(s"$dir/out2"))
    val localEvents = (0L until cfg.numEvents).map(id => Gen.mkEvent(id, cfg))
    val want = Oracle.replay(localEvents, Transcripts.spec(), mapping)
    var checked = 0
    want.foreach { case (k, row) =>
      val key = k.map(x => if (x == null) "" else x).mkString(StateApply.KeySep)
      p2.get(key).foreach { g =>
        Transcripts.schema.fieldNames.foreach { c =>
          assert(g.getOrElse(c, null) == row.getOrElse(c, null),
            s"resumed key $k col $c: ${g.get(c)} vs ${row.get(c)}")
        }
        checked += 1
      }
    }
    assert(checked > 0, "phase 2 must re-emit keys with carried-over state")
    // and no key emitted by phase2 as live may be delete-final in the oracle
    p2.keysIterator.foreach { key =>
      val k = key.split(StateApply.KeySep, -1).toSeq
      assert(want.contains(k), s"key $k live in state store but not in oracle")
    }
  }

  test("tombstoneTtl on a batch Dataset fails fast (no watermark to time against)") {
    val ev = Seq(ChangeEvent(1, 0, "I", "transcripts", "s0", "none",
      Map.empty, Map("conv_id" -> "k", "turn_idx" -> "0")))
    val ex = intercept[IllegalArgumentException] {
      StateApply.stream(spark.createDataset(ev), mergeKey,
        tombstoneTtl = Some(java.time.Duration.ofSeconds(1)))
    }
    assert(ex.getMessage.contains("streaming Dataset"),
      s"message must say why: ${ex.getMessage}")
  }

  test("tombstone eviction bounds delete-heavy state; reinsert stays correct") {
    val dir = SparkTestBase.tmpDir("statettl")
    def ev(lsn: Long, op: String, k: String, txt: String = null): ChangeEvent = {
      val key = Map("conv_id" -> k, "turn_idx" -> "0")
      op match {
        case "I" => ChangeEvent(lsn, 0, "I", "transcripts", "s0", "none",
          Map.empty, key + ("role" -> "user") + ("text" -> txt))
        case "D" => ChangeEvent(lsn, 0, "D", "transcripts", "s0", "K",
          key, Map.empty)
      }
    }
    // seg0: insert 20 keys, delete 15 of them -> 15 tombstones + 5 live.
    // With ttl = 50 LSN-seconds the tombstones (deleted at lsn 100-114)
    // expire once the LSN watermark passes 150-164 — i.e. in the batch
    // after seg1 (lsn 200) advances the watermark.
    val seg0 = (0 until 20).map(i => ev(i + 1, "I", s"k$i", s"v$i")) ++
      (0 until 15).map(i => ev(100 + i, "D", s"k$i"))
    // seg1: unrelated insert; advances the watermark past every timer
    val seg1 = Seq(ev(200, "I", "fresh", "f"))
    // seg2: re-insert k0 AFTER its tombstone evicted
    val seg2 = Seq(ev(300, "I", "k0", "reborn"))
    Seq(seg0, seg1, seg2).zipWithIndex.foreach { case (s, i) =>
      spark.createDataset(s).toDF().coalesce(1)
        .write.parquet(f"$dir/wal/seg-$i%05d")
    }

    val src = spark.readStream.schema(ChangeEvent.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/wal/seg-*").as[ChangeEvent]
    val q = StateApply.stream(src, mergeKey,
        tombstoneTtl = Some(java.time.Duration.ofSeconds(50))).toDF()
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(s"$dir/out")
      }
      .start()
    q.awaitTermination()

    // state stayed bounded: the 15 tombstones are gone by the last batch
    // (5 live + fresh + reborn k0 = 7 state rows)
    val lastRows = q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty).map(_.stateOperators(0).numRowsTotal)
    assert(lastRows.nonEmpty)
    assert(lastRows.last <= 7,
      s"state must shed expired tombstones, got ${lastRows.last} rows " +
        s"(history: $lastRows)")

    // resume/reinsert correctness: max-ord pick gives the reborn row even
    // though the tombstone's state (and its counter) was evicted
    val fin = finalStates(spark.read.parquet(s"$dir/out"))
    val k0 = fin.getOrElse("k0" + StateApply.KeySep + "0", fail("k0 must be live"))
    assert(k0("text") == "reborn")
    assert(!fin.contains("k1" + StateApply.KeySep + "0"), "deleted keys stay dead")
    assert(fin.contains("k15" + StateApply.KeySep + "0"))
    assert(fin.contains("fresh" + StateApply.KeySep + "0"))
  }
}
