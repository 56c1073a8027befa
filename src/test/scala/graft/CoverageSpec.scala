package graft

import graft.config.MapConfig
import graft.lake.LakeTable
import graft.model.{ChangeEvent, TableMapping, TableMode, TableSpec, Transcripts}
import graft.operators.{Backfill, Replay}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Config loading (S6), initial full sync (S4), and the datatype matrix
  * (the analog of the reference's `50-datatypes.robot` 43-type suite). */
class CoverageSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("map config: parse + resolve to TableMappings (map.go defaults)") {
    val json =
      """{"databases":[{"name":"db1",
        |  "urls":[{"url":"wal/db1","sid":"s0"},{"url":"wal/db1b","sid":"s1"}],
        |  "tables":{
        |    "t1":{"type":"clone","target":"dest1","filter":"x > 1"},
        |    "t2":{"type":"append"},
        |    "t7":{"type":"history","partitions_regex":"t7_[0-9]+",
        |          "set":{"a":"upper(a)"}}}}]}""".stripMargin
    val db = MapConfig.parse(json).databases.head
    assert(db.urls.map(_.sid) == Seq("s0", "s1"))
    val ms = MapConfig.mappings(db)
    assert(ms.map(_.sourceTable) == Seq("t1", "t2", "t7"))
    val t1 = ms.head
    assert(t1.target == "dest1" && t1.mode == TableMode.Clone &&
      t1.filter.contains("x > 1"))
    assert(ms(1).target == "t2" && ms(1).mode == TableMode.Append)
    val t7 = ms(2)
    assert(t7.mode == TableMode.History && t7.matches("t7_3") && !t7.matches("t8_1"))
    assert(t7.set.contains(Seq("a" -> "upper(a)")))
  }

  test("initial full sync: intersect projection, sid injection, then CDC on top") {
    import spark.implicits._
    val dir = SparkTestBase.tmpDir("backfill")
    val spec = TableSpec("t",
      StructType(Seq(
        StructField("sid", StringType, nullable = true),
        StructField("k", LongType, nullable = false),
        StructField("v", StringType, nullable = true),
        StructField("extra", IntegerType, nullable = true))),
      keyCols = Seq("k"), bucketCols = Seq("k"), numBuckets = 4, hasSid = true)
    val lake = LakeTable.create(spark, s"$dir/t", spec)
    // source has v + a column the target lacks; target's `extra` is absent
    val src = Seq((1L, "a", "drop-me"), (2L, "b", "drop-me"))
      .toDF("k", "v", "not_in_target")
    Backfill.initialSync(lake, src, sid = Some("s0"), lsnFloor = 10L)

    val rows = lake.read().orderBy("k").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq(("s0", 1L, "a"), ("s0", 2L, "b")))
    assert(rows.forall(_.isNullAt(3))) // `extra` null-filled
    assert(lake.snapshot().properties("lsn-high-watermark") == "10")

    // streaming changes apply on top of the backfill
    val evs = Seq(
      ChangeEvent(11L, 0, "U", "t", "s0", "none", Map.empty,
        Map("k" -> "1", "v" -> "a2")),
      ChangeEvent(12L, 0, "D", "t", "s0", "none", Map("k" -> "2"), Map.empty))
      .toDS()
    Replay.applyBatch(lake, evs, TableMapping("t", "t"), batchId = 0)
    val after = lake.read().orderBy("k").collect()
    assert(after.length == 1)
    assert(after.head.getString(2) == "a2")
  }

  test("TOAST at reference size: 20KB value survives an omitting update (60-Toast analog)") {
    import spark.implicits._
    val spec = Transcripts.spec(numBuckets = 2)
    val lake = graft.lake.LakeTable.create(spark, SparkTestBase.tmpDir("toast"), spec)
    val big = ("lorem-" * 3500).take(20000) // 20 KB, like 60-Toast.robot
    val mapping = TableMapping("transcripts", "transcripts")
    val evs = Seq(
      ChangeEvent(1, 0, "I", "transcripts", "s0", "none", Map.empty,
        Map("conv_id" -> "c1", "turn_idx" -> "0", "role" -> "user",
          "text" -> big, "tool" -> null, "ts" -> "2024-01-01 00:00:00")),
      // unchanged-TOAST update: text omitted, role changes
      ChangeEvent(2, 0, "U", "transcripts", "s0", "none", Map.empty,
        Map("conv_id" -> "c1", "turn_idx" -> "0", "role" -> "assistant",
          "tool" -> null, "ts" -> "2024-01-01 00:00:01")))
    graft.operators.Replay.applyBatch(lake, spark.createDataset(evs), mapping, 0)
    val row = lake.read().collect().head
    assert(row.getAs[String]("text") == big, "20KB TOAST value must be kept")
    assert(row.getAs[String]("role") == "assistant")
  }

  test("schema-qualified routing: default schema public (71-schema analog)") {
    import spark.implicits._
    import graft.operators.Replay
    import org.apache.spark.sql.functions.col
    def hit(mappingTable: String, eventTable: String): Boolean = {
      val m = TableMapping(mappingTable, "t")
      val ev = ChangeEvent(1, 0, "I", eventTable, "s0", "none", Map.empty,
        Map("conv_id" -> "c", "turn_idx" -> "0"))
      val viaColumn = spark.createDataset(Seq(ev)).toDF()
        .filter(Replay.routeCond(m)).count() == 1
      assert(viaColumn == m.matches(eventTable),
        s"Column predicate and matches() disagree for $mappingTable vs $eventTable")
      viaColumn
    }
    assert(hit("events", "events"))
    assert(hit("events", "public.events")) // bare mapping routes public.x
    assert(hit("public.events", "events")) // and vice versa
    assert(hit("audit.events", "audit.events"))
    assert(!hit("audit.events", "events")) // different schema never routes
    assert(!hit("events", "audit.events"))

    // partitions regex applies to the SCHEMA-STRIPPED name with schema
    // equality required (mapping_table.go Match + splitSchema)
    def hitRx(mappingTable: String, rx: String, eventTable: String): Boolean = {
      val m = TableMapping(mappingTable, "t", partitionsRegex = Some(rx))
      val ev = ChangeEvent(1, 0, "I", eventTable, "s0", "none", Map.empty,
        Map("conv_id" -> "c", "turn_idx" -> "0"))
      val viaColumn = spark.createDataset(Seq(ev)).toDF()
        .filter(Replay.routeCond(m)).count() == 1
      assert(viaColumn == m.matches(eventTable),
        s"Column predicate and matches() disagree for $mappingTable/$rx vs $eventTable")
      viaColumn
    }
    assert(hitRx("events", "events_p[0-3]", "events_p1"))
    assert(hitRx("events", "events_p[0-3]", "public.events_p1"),
      "schema-qualified partition of a public mapping must route")
    assert(!hitRx("events", "events_p[0-3]", "audit.events_p1"),
      "a partition in another schema must NOT match a public mapping's regex")
    assert(hitRx("audit.events", "events_p[0-3]", "audit.events_p1"))
    assert(!hitRx("audit.events", "events_p[0-3]", "events_p1"))
  }

  test("replica-identity-full: update/delete keyed by the whole old tuple") {
    import spark.implicits._
    val dir = SparkTestBase.tmpDir("ridfull")
    val spec = TableSpec("t",
      StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("v", StringType, nullable = true))),
      keyCols = Seq("k"), bucketCols = Seq("k"), numBuckets = 2)
    val lake = LakeTable.create(spark, s"$dir/t", spec)
    val evs = Seq(
      ChangeEvent(1L, 0, "I", "t", "s0", "none", Map.empty, Map("k" -> "1", "v" -> "a")),
      // old_kind O: the key comes from the whole old row; after omits k
      ChangeEvent(2L, 0, "U", "t", "s0", "O",
        Map("k" -> "1", "v" -> "a"), Map("v" -> "b")),
      // O-update on an absent key is a no-op (0 rows affected)
      ChangeEvent(3L, 0, "U", "t", "s0", "O",
        Map("k" -> "9", "v" -> "zzz"), Map("v" -> "never")))
      .toDS()
    Replay.applyBatch(lake, evs, TableMapping("t", "t"), 0)
    val rows = lake.read().collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1L && rows.head.getString(1) == "b")
  }

  test("type widening: R message widens int -> bigint before the merge") {
    import spark.implicits._
    val dir = SparkTestBase.tmpDir("widen")
    val spec = TableSpec("t",
      StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("n", IntegerType, nullable = true))),
      keyCols = Seq("k"), bucketCols = Seq("k"), numBuckets = 2)
    val lake = LakeTable.create(spark, s"$dir/t", spec)
    Replay.applyBatch(lake,
      Seq(ChangeEvent(1L, 0, "I", "t", "s0", "none", Map.empty,
        Map("k" -> "1", "n" -> "41"))).toDS(),
      TableMapping("t", "t"), 0)
    // batch 1 carries the widening R message AND a value beyond int range
    Replay.applyBatch(lake,
      Seq(
        ChangeEvent(2L, 0, "R", "t", "s0", "none", Map.empty,
          Map("k" -> "bigint", "n" -> "bigint")),
        ChangeEvent(3L, 0, "I", "t", "s0", "none", Map.empty,
          Map("k" -> "2", "n" -> "9999999999"))).toDS(),
      TableMapping("t", "t"), 1)
    assert(lake.schema("n").dataType == LongType, "n must widen to bigint")
    val rows = lake.read().orderBy("k").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(41L, 9999999999L),
      "pre-evolution files must re-read aligned (cast) to the widened schema")
  }

  test("multi-table fan-out: per-table epochs survive a mid-batch crash") {
    import spark.implicits._
    val dir = SparkTestBase.tmpDir("fanout")
    val spec = TableSpec("t",
      StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("v", StringType, nullable = true))),
      keyCols = Seq("k"), bucketCols = Seq("k"), numBuckets = 2)
    val lakeA = LakeTable.create(spark, s"$dir/a", spec.copy(name = "a"))
    val lakeB = LakeTable.create(spark, s"$dir/b", spec.copy(name = "b"))
    val mapA = TableMapping("t", "a")
    val mapB = TableMapping("t", "b", mode = TableMode.Append)
    val batch0 = Seq(
      ChangeEvent(1L, 0, "I", "t", "s0", "none", Map.empty, Map("k" -> "1", "v" -> "a")),
      ChangeEvent(2L, 0, "D", "t", "s0", "none", Map("k" -> "1"), Map.empty))
      .toDS()
    // one foreachBatch fans out to A then B; "crash" after A's commit
    assert(Replay.applyBatch(lakeA, batch0, mapA, 0))
    // restart: batch 0 replays for BOTH routes — A skips (epoch), B applies
    assert(!Replay.applyBatch(lakeA, batch0, mapA, 0))
    assert(Replay.applyBatch(lakeB, batch0, mapB, 0))
    assert(lakeA.read().count() == 0) // clone: delete applied, not duplicated
    assert(lakeB.read().count() == 1) // append: delete dropped
    // next batch applies to both normally
    val batch1 = Seq(
      ChangeEvent(3L, 0, "I", "t", "s0", "none", Map.empty, Map("k" -> "2", "v" -> "b")))
      .toDS()
    assert(Replay.applyBatch(lakeA, batch1, mapA, 1))
    assert(Replay.applyBatch(lakeB, batch1, mapB, 1))
    assert(lakeA.read().collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(lakeB.read().orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(lakeA.snapshot().properties("commit-epoch") == "1")
    assert(lakeB.snapshot().properties("commit-epoch") == "1")
  }

  test("fold strategies agree: Catalyst fold == typed salted Xf fold") {
    import spark.implicits._
    val cfg = graft.gen.Gen.Config(numEvents = 30000L, numConvs = 120,
      turnsPerConv = 8, skew = 2.5, pPkUpdate = 0.15, pToast = 0.3, numSids = 2)
    val events = graft.gen.Gen.events(spark, cfg)
    val mapping = TableMapping("transcripts", "transcripts")
    def run(salts: Int): Seq[String] = {
      val dir = SparkTestBase.tmpDir(s"ab$salts")
      val lake = LakeTable.create(spark, s"$dir/t", graft.model.Transcripts.spec())
      // two batches so cross-batch present/absent transitions are hit
      Replay.applyBatch(lake, events.filter(_.lsn <= 4000), mapping, 0, salts)
      Replay.applyBatch(lake, events.filter(_.lsn > 4000), mapping, 1, salts)
      lake.read().orderBy("conv_id", "turn_idx")
        .collect().map(_.mkString("")).toSeq
    }
    val sql = run(0)
    val typed = run(4)
    assert(sql.nonEmpty && sql == typed)
  }

  test("watermark calibration guard: streaming result matches the batch-(N-2) model") {
    // The guard moved out of the timed qWatermarkAgg path (GRAFT_CALIBRATE=1
    // re-enables it there); this test keeps it running on every sbt pass so
    // a Spark-version watermark-propagation change fails loudly here.
    val dir = "/root/testdata/sf0.001"
    val result = graft.verify.EventsCdc.qWatermarkAgg(spark, dir)
    graft.verify.EventsCdc.watermarkCalibrationGuard(spark,
      spark.read.parquet(s"$dir/events.parquet"), result)
  }

  test("datatype matrix: text-encoded values decode to the full type surface") {
    import spark.implicits._
    val dir = SparkTestBase.tmpDir("types")
    val spec = TableSpec("t5",
      StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("c_small", ShortType),
        StructField("c_int", IntegerType),
        StructField("c_big", LongType),
        StructField("c_real", FloatType),
        StructField("c_double", DoubleType),
        StructField("c_num", DecimalType(38, 18)),
        StructField("c_bool", BooleanType),
        StructField("c_text", StringType),
        StructField("c_date", DateType),
        StructField("c_ts", TimestampNTZType),
        StructField("c_arr", ArrayType(IntegerType)),
        StructField("c_struct", StructType(Seq(
          StructField("r", DoubleType), StructField("i", DoubleType)))))),
      keyCols = Seq("k"), bucketCols = Seq("k"), numBuckets = 2)
    val lake = LakeTable.create(spark, s"$dir/t5", spec)

    val insert = ChangeEvent(1L, 0, "I", "t5", "s0", "none", Map.empty, Map(
      "k" -> "1", "c_small" -> "7", "c_int" -> "123456", "c_big" -> "9999999999",
      "c_real" -> "1.5", "c_double" -> "2.25", "c_num" -> "1234.5678",
      "c_bool" -> "true", "c_text" -> "hello", "c_date" -> "2024-02-29",
      "c_ts" -> "2024-01-01 12:34:56.789", "c_arr" -> "[1,2,3]",
      "c_struct" -> """{"r": 1.0, "i": -2.0}"""))
    // TOAST-ish update: only c_text and c_arr present; rest must persist
    val update = ChangeEvent(2L, 0, "U", "t5", "s0", "none", Map.empty, Map(
      "k" -> "1", "c_text" -> "world", "c_arr" -> "[4,5]"))
    Replay.applyBatch(lake, Seq(insert, update).toDS(), TableMapping("t5", "t5"), 0)

    val r = lake.read().collect().head
    assert(r.getShort(1) == 7.toShort)
    assert(r.getInt(2) == 123456)
    assert(r.getLong(3) == 9999999999L)
    assert(r.getFloat(4) == 1.5f)
    assert(r.getDouble(5) == 2.25)
    assert(r.getDecimal(6).compareTo(new java.math.BigDecimal("1234.5678")) == 0)
    assert(r.getBoolean(7))
    assert(r.getString(8) == "world")
    assert(r.getDate(9).toString == "2024-02-29")
    assert(r.getAs[java.time.LocalDateTime](10).toString == "2024-01-01T12:34:56.789")
    assert(r.getSeq[Int](11) == Seq(4, 5))
    val st = r.getStruct(12)
    assert(st.getDouble(0) == 1.0 && st.getDouble(1) == -2.0)
  }
}
