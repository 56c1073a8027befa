package graft

import graft.lake.{LakeTable, Zone}
import graft.model.Transcripts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Zone maps: per-file key-column min/max harvested from parquet footers at
  * write time, pruning selective reads at the manifest level — the
  * query-side twin of the merge's bucket pruning. All files here share ONE
  * bucket so any pruning observed is the zone maps', not the buckets'. */
class LakeZoneSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** One commit of rows conv c<lo..hi> x turn_idx <tlo..thi>, bucket 0. */
  private def commitRange(lake: LakeTable, lo: Int, hi: Int,
                          tlo: Int = 0, thi: Int = 3): Unit = {
    val rows = for (c <- lo to hi; t <- tlo to thi)
      yield (f"c$c%08d", t, "user", s"txt-$c-$t", null: String,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    val df = rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .withColumn("__bucket", lit(0))
    val files = lake.writeDataFiles(df.coalesce(1), lake.snapshot().currentSchemaId)
    lake.commit(files, Set.empty)
  }

  test("footer stats recorded per key column; zone read prunes files") {
    val dir = SparkTestBase.tmpDir("zone")
    val lake = LakeTable.create(spark, dir, Transcripts.spec(numBuckets = 1))
    commitRange(lake, 0, 99) // file A: c00000000..c00000099
    commitRange(lake, 100, 199) // file B
    commitRange(lake, 200, 299) // file C

    val files = lake.snapshot().files
    assert(files.size == 3)
    files.foreach { f =>
      val st = f.statsOrEmpty
      assert(st.contains("conv_id") && st.contains("turn_idx"),
        s"key columns must carry zone stats, got ${st.keySet}")
    }

    // string zone on conv_id: only file B overlaps
    val zB = Seq(Zone("conv_id", lo = Some("c00000150"), hi = Some("c00000160")))
    assert(lake.selectFiles(zones = zB).size == 1, "2 of 3 files must prune")
    // half-open zone: lo only -> files B and C
    assert(lake.selectFiles(zones =
      Seq(Zone("conv_id", lo = Some("c00000100")))).size == 2)

    // pruned read + row filter == full read + row filter (never loses rows)
    val zoneRows = lake.read(zones = zB)
      .filter(col("conv_id").between("c00000150", "c00000160")).count()
    val fullRows = lake.read()
      .filter(col("conv_id").between("c00000150", "c00000160")).count()
    assert(zoneRows == fullRows && fullRows == 11 * 4)
  }

  test("integral zones compare numerically, not lexicographically") {
    val dir = SparkTestBase.tmpDir("zonei")
    val lake = LakeTable.create(spark, dir, Transcripts.spec(numBuckets = 1))
    commitRange(lake, 0, 0, tlo = 0, thi = 9) // file A: turn_idx 0..9
    commitRange(lake, 1, 1, tlo = 10, thi = 19) // file B: 10..19
    // "9" > "10" lexicographically — a string compare would wrongly prune
    // file B for lo=9 (its max "19" < "9") and keep none of the tail
    val sel = lake.selectFiles(zones = Seq(Zone("turn_idx", lo = Some("9"))))
    assert(sel.size == 2, s"numeric zone lo=9 must keep both files, got ${sel.size}")
    val sel2 = lake.selectFiles(zones = Seq(Zone("turn_idx", lo = Some("10"))))
    assert(sel2.size == 1, "lo=10 prunes the 0..9 file")
  }

  test("missing stats or unknown zone column never prunes") {
    val dir = SparkTestBase.tmpDir("zonen")
    val lake = LakeTable.create(spark, dir, Transcripts.spec(numBuckets = 1))
    commitRange(lake, 0, 9)
    // 'role' is not a key column -> no stats recorded -> must scan
    assert(lake.selectFiles(zones = Seq(Zone("role", lo = Some("zzz")))).size == 1)
    // unknown column entirely
    assert(lake.selectFiles(zones = Seq(Zone("nope", hi = Some("a")))).size == 1)
  }

  test("zone maps survive the CDC merge path (cdc_* compatibility)") {
    import graft.gen.Gen
    import graft.model.TableMapping
    val dir = SparkTestBase.tmpDir("zonecdc")
    val lake = LakeTable.create(spark, dir, Transcripts.spec(numBuckets = 4))
    val cfg = Gen.Config(numEvents = 2000, numConvs = 20, seed = 11)
    graft.operators.Replay.applyBatch(lake, Gen.events(spark, cfg),
      TableMapping("transcripts", "transcripts"), 0)
    val files = lake.snapshot().files
    assert(files.nonEmpty)
    assert(files.forall(_.statsOrEmpty.contains("conv_id")))
    // zone on one conversation: reads fewer (or equal) files, same rows
    val one = lake.read().select("conv_id").head().getString(0)
    val z = Seq(Zone("conv_id", Some(one), Some(one)))
    val zoneRows = lake.read(zones = z).filter(col("conv_id") === one).count()
    assert(zoneRows == lake.read().filter(col("conv_id") === one).count())
    assert(lake.selectFiles(zones = z).size <= files.size)
  }
}
