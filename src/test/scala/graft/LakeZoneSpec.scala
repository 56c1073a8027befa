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

  test("string zones compare in UTF-8 byte order (supplementary plane)") {
    val dir = SparkTestBase.tmpDir("zoneu")
    val lake = LakeTable.create(spark, dir, Transcripts.spec(numBuckets = 1))
    // U+FFFF sorts ABOVE U+10000 in UTF-16 code units but BELOW it in
    // unsigned UTF-8 bytes (the order parquet stats and Spark row filters
    // use). A UTF-16 compare would prune this file for hi = U+10000 even
    // though its row matches the row-level filter.
    val uFFFF = "￿"
    val u10000 = new String(Character.toChars(0x10000))
    val df = Seq((uFFFF, 0, "user", "t", null: String,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .withColumn("__bucket", lit(0))
    lake.commit(lake.writeDataFiles(df.coalesce(1),
      lake.snapshot().currentSchemaId), Set.empty)
    val sel = lake.selectFiles(zones = Seq(Zone("conv_id", hi = Some(u10000))))
    assert(sel.size == 1, "hi = U+10000 must keep the U+FFFF file (UTF-8 order)")
    val rows = lake.read(zones = Seq(Zone("conv_id", hi = Some(u10000))))
      .filter(col("conv_id") <= u10000).count()
    assert(rows == 1, "pruned read must still see the matching row")
  }

  test("over-4KB string keys: size-capped footer stats never prune unsoundly") {
    val dir = SparkTestBase.tmpDir("zonebig")
    val lake = LakeTable.create(spark, dir, Transcripts.spec(numBuckets = 1))
    // parquet-mr omits column-chunk min/max for binary values above its
    // stats size cap (4096 bytes); the harvester must then treat the
    // column as stat-less for the whole file (must-scan), never merge a
    // partial range
    val big = "k" * 5000
    val df = Seq(
      (big, 0, "user", "t", null: String,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("a-small-key", 1, "user", "t", null: String,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .withColumn("__bucket", lit(0))
    lake.commit(lake.writeDataFiles(df.coalesce(1),
      lake.snapshot().currentSchemaId), Set.empty)
    // whatever the writer recorded, a zone matching the big key must keep
    // the file, and pruned-read + row-filter must equal full-read counts
    val z = Seq(Zone("conv_id", lo = Some(big), hi = Some(big)))
    assert(lake.selectFiles(zones = z).size == 1,
      s"zone on the >4KB key must not prune its file " +
        s"(stats=${lake.snapshot().files.head.statsOrEmpty.get("conv_id").map(_.min.length)})")
    assert(lake.read(zones = z).filter(col("conv_id") === big).count() == 1)
    // integral key stats are unaffected by the binary cap
    assert(lake.snapshot().files.head.statsOrEmpty.contains("turn_idx"))
  }

  test("merge path zone-prunes untouched key ranges inside touched buckets") {
    import graft.model.{ChangeEvent, TableMapping}
    val dir = SparkTestBase.tmpDir("zonem")
    // ONE bucket: without zone pruning every batch rewrites all three files
    val lake = LakeTable.create(spark, dir, Transcripts.spec(numBuckets = 1))
    commitRange(lake, 0, 99) // file A
    commitRange(lake, 100, 199) // file B
    commitRange(lake, 200, 299) // file C
    val before = lake.snapshot().files.map(_.path)
    assert(before.size == 3)
    val ev = Seq(ChangeEvent(1L, 0, "U", "transcripts", "s0", "none",
      Map.empty, Map("conv_id" -> "c00000150", "turn_idx" -> "0",
        "text" -> "updated")))
    graft.operators.Replay.applyBatch(lake, ev.toDS(),
      TableMapping("transcripts", "transcripts"), 0)
    val after = lake.snapshot().files.map(_.path)
    assert(before.count(after.contains) == 2,
      s"the two files whose conv_id range provably misses the batch key " +
        s"must survive un-rewritten (before=${before.size}, kept=" +
        s"${before.count(after.contains)})")
    assert(lake.read().count() == 300 * 4, "zone-pruned merge must not lose rows")
    assert(lake.read().filter(col("conv_id") === "c00000150" &&
      col("turn_idx") === 0).head().getAs[String]("text") == "updated")
  }

  test("fragmentation cap: narrow-batch merges self-compact past the file cap") {
    import graft.model.{ChangeEvent, TableMapping}
    val dir = SparkTestBase.tmpDir("zonefrag")
    val lake = LakeTable.create(spark, dir, Transcripts.spec(numBuckets = 1))
    val mapping = TableMapping("transcripts", "transcripts")
    // 15 batches, each inserting ONE far-apart key: zone pruning leaves
    // every earlier file un-rewritten, so without the cap the single
    // bucket would accumulate ~15 files
    (0 until 15).foreach { b =>
      val ev = Seq(ChangeEvent(b + 1L, 0, "I", "transcripts", "s0", "none",
        Map.empty, Map("conv_id" -> f"k$b%04d", "turn_idx" -> "0",
          "role" -> "user", "text" -> s"v$b")))
      graft.operators.Replay.applyBatch(lake, ev.toDS(), mapping, b)
      val n = lake.snapshot().files.size
      assert(n <= 10, s"bucket file count must stay capped, got $n at batch $b")
    }
    assert(lake.read().count() == 15, "compaction must not lose rows")
    // and the standalone maintenance pass compacts the rest of the way
    assert(lake.compact(maxFilesPerBucket = 1) == 1)
    assert(lake.snapshot().files.size <= 2)
    assert(lake.read().count() == 15)
    assert(lake.compact(maxFilesPerBucket = 8) == 0, "already compact")
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
