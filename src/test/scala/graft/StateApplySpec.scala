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
      .partitionBy("key").orderBy(col("apps").desc)
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
}
