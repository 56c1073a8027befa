package graft

import graft.lake.LakeTable
import graft.model.{ChangeEvent, TableMapping, TableSpec}
import graft.operators.{LabelStore, SignatureStore}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Cluster labels maintained BY the CDC ingest loop (X14 at steady
  * state): per applied micro-batch the label table folds forward by the
  * delete kernel (touched docs' old edges die) then the merge kernel
  * (touched docs' current pairs re-attach). The invariant — labels ==
  * connected components over the CURRENT signature-agreement pairs — is
  * re-checked from scratch after every batch via LabelStore.bootstrap
  * into a fresh table. */
class LabelStoreSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val docSpec = TableSpec("docs",
    StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("meta", StringType, nullable = true))),
    keyCols = Seq("doc_id"), bucketCols = Seq("doc_id"), numBuckets = 4)
  private val mapping = TableMapping("docs", "docs")

  private def iEv(lsn: Long, id: Long, text: String): ChangeEvent =
    ChangeEvent(lsn, 0, "I", "docs", "s0", "none", Map.empty,
      Map("doc_id" -> id.toString, "text" -> text, "meta" -> "m"))
  private def uEv(lsn: Long, id: Long, kv: Map[String, String]): ChangeEvent =
    ChangeEvent(lsn, 0, "U", "docs", "s0", "none", Map.empty,
      Map("doc_id" -> id.toString) ++ kv)
  private def dEv(lsn: Long, id: Long): ChangeEvent =
    ChangeEvent(lsn, 0, "D", "docs", "s0", "none",
      Map("doc_id" -> id.toString), Map.empty)

  private def labelRows(t: LakeTable): Map[String, String] =
    t.read().collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("ingest-maintained labels: merge, migrate, toast, delete, replay") {
    val dir = SparkTestBase.tmpDir("lblstore")
    val docs = LakeTable.create(spark, s"$dir/docs", docSpec)
    val sig = LakeTable.create(spark, s"$dir/sigs", SignatureStore.spec())
    val lbl = LakeTable.create(spark, s"$dir/labels", LabelStore.spec())
    def txt(p: String) = (0 until 20).map(i => s"$p$i").mkString(" ")
    val (tA, tB, tC) = (txt("alpha"), txt("beta"), txt("gamma"))

    var checks = 0
    def invariant(): Unit = {
      checks += 1
      val fresh = LakeTable.create(spark, s"$dir/check$checks", LabelStore.spec())
      assert(LabelStore.bootstrap(fresh, sig))
      assert(labelRows(fresh) == labelRows(lbl),
        s"incremental fold diverged from from-scratch CC after check $checks")
    }
    def apply(b: Long, evs: Seq[ChangeEvent]): Unit = {
      graft.operators.Replay.applyBatch(docs, evs.toDS(), mapping, b)
      SignatureStore.applyBatch(sig, evs.toDS(), mapping, docs, batchId = b)
      LabelStore.applyBatch(lbl, sig, evs.toDS(), mapping, docs, batchId = b)
      invariant()
    }

    // inserts form a cluster; the unrelated doc stays an absent singleton
    apply(0, Seq(iEv(1, 1, tA), iEv(2, 2, tA), iEv(3, 3, tB)))
    assert(labelRows(lbl) == Map("1" -> "1", "2" -> "1"))

    // new near-dup merges in; a TEXT UPDATE migrates doc 2 out of its
    // cluster (old edges die with the old signature), leaving 1 pairless
    apply(1, Seq(iEv(10, 4, tB), uEv(11, 2, Map("text" -> tC))))
    assert(labelRows(lbl) == Map("3" -> "3", "4" -> "3"))

    // TOAST-ish meta-only update touches nothing; the delete shrinks
    // {3,4} and 3 drops out pairless
    apply(2, Seq(uEv(20, 1, Map("meta" -> "m2")), dEv(21, 4)))
    assert(labelRows(lbl) == Map.empty)

    // exactly-once: replaying the same batchId is epoch-skipped
    val v = lbl.currentVersion
    assert(!LabelStore.applyBatch(lbl, sig, Seq(dEv(21, 4)).toDS(), mapping,
      docs, batchId = 2))
    assert(lbl.currentVersion == v)

    // a new doc pairs against an EXISTING corpus signature (2's text
    // became tC back in batch 1 — the pair comes off the signature lake,
    // not this batch)
    apply(3, Seq(iEv(30, 5, tC)))
    assert(labelRows(lbl) == Map("2" -> "2", "5" -> "2"))

    // crash window: the signature half committed batch 4 but the label
    // half did not — the replay applies ONLY the label half
    val evs4 = Seq(iEv(40, 6, tC))
    graft.operators.Replay.applyBatch(docs, evs4.toDS(), mapping, 4)
    SignatureStore.applyBatch(sig, evs4.toDS(), mapping, docs, batchId = 4)
    assert(labelRows(lbl) == Map("2" -> "2", "5" -> "2"), "label half behind")
    assert(!SignatureStore.applyBatch(sig, evs4.toDS(), mapping, docs,
      batchId = 4), "signature half must epoch-skip the replay")
    assert(LabelStore.applyBatch(lbl, sig, evs4.toDS(), mapping, docs,
      batchId = 4))
    assert(labelRows(lbl) == Map("2" -> "2", "5" -> "2", "6" -> "2"))
    invariant()
  }

  test("cluster migration of the lexicographically-SMALLEST doc merges") {
    // regression: the merge kernel pairs touched docs against the whole
    // signature table; a symmetric (a < b)-deduped agreement join DROPS
    // every (touched, untouched) pair where the touched doc sorts FIRST —
    // so editing doc "1" into a cluster of untouched docs "5","9" left it
    // a singleton (hidden in other fixtures because deltas sorted last or
    // never changed cluster)
    val dir = SparkTestBase.tmpDir("lblmin")
    val docs = LakeTable.create(spark, s"$dir/docs", docSpec)
    val sig = LakeTable.create(spark, s"$dir/sigs", SignatureStore.spec())
    val lbl = LakeTable.create(spark, s"$dir/labels", LabelStore.spec())
    def txt(p: String) = (0 until 20).map(i => s"$p$i").mkString(" ")
    def apply(b: Long, evs: Seq[ChangeEvent]): Unit = {
      graft.operators.Replay.applyBatch(docs, evs.toDS(), mapping, b)
      SignatureStore.applyBatch(sig, evs.toDS(), mapping, docs, batchId = b)
      LabelStore.applyBatch(lbl, sig, evs.toDS(), mapping, docs, batchId = b)
    }
    apply(0, Seq(iEv(1, 1, txt("solo")), iEv(2, 5, txt("grp")),
      iEv(3, 9, txt("grp"))))
    assert(labelRows(lbl) == Map("5" -> "5", "9" -> "5"))
    apply(1, Seq(uEv(10, 1, Map("text" -> txt("grp")))))
    assert(labelRows(lbl) == Map("1" -> "1", "5" -> "1", "9" -> "1"),
      "the touched doc must merge even when it sorts before every " +
        "untouched member of its new cluster")
    // and the invariant check agrees with a from-scratch rebuild
    val fresh = LakeTable.create(spark, s"$dir/check", LabelStore.spec())
    assert(LabelStore.bootstrap(fresh, sig))
    assert(labelRows(fresh) == labelRows(lbl))
  }

  test("ingest-loop temp artifacts are batch-scoped, not JVM-lifetime") {
    // the kernels land pairs/labels parquet in temp dirs; the CDC loop
    // calls applyBatch once per micro-batch FOREVER, so those dirs must
    // die with the batch (driver-contract entries keep returning frames
    // that read their temp dirs and correctly use the exit-hook lifetime)
    val dir = SparkTestBase.tmpDir("lbltmp")
    val docs = LakeTable.create(spark, s"$dir/docs", docSpec)
    val sig = LakeTable.create(spark, s"$dir/sigs", SignatureStore.spec())
    val lbl = LakeTable.create(spark, s"$dir/labels", LabelStore.spec())
    def txt(p: String) = (0 until 20).map(i => s"$p$i").mkString(" ")
    def kernelTmp(): Set[String] = {
      val t = new java.io.File(System.getProperty("java.io.tmpdir"))
      Option(t.list()).getOrElse(Array.empty)
        .filter(n => n.startsWith("graft-clusters") ||
          n.startsWith("graft-labels") || n.startsWith("graft-delta")).toSet
    }
    val before = kernelTmp()
    val evs = Seq(iEv(1, 1, txt("aa")), iEv(2, 2, txt("aa")))
    graft.operators.Replay.applyBatch(docs, evs.toDS(), mapping, 0)
    SignatureStore.applyBatch(sig, evs.toDS(), mapping, docs, batchId = 0)
    LabelStore.applyBatch(lbl, sig, evs.toDS(), mapping, docs, batchId = 0)
    assert(labelRows(lbl) == Map("1" -> "1", "2" -> "1"),
      "the batch must still fold correctly under the temp scope")
    assert(kernelTmp() == before,
      "applyBatch must not leave kernel temp dirs behind")
  }

  test("map-file opt-in: \"labels\": true maintains the cluster companion") {
    import java.nio.file.{Files, Paths}
    val dir = SparkTestBase.tmpDir("lblmap")
    val t = (0 until 20).map(i => s"word$i").mkString(" ")
    Seq(iEv(1, 1, t), iEv(2, 2, t + " tail"), iEv(3, 3, "unrelated " +
      (0 until 19).map(i => s"other$i").mkString(" ")))
      .toDS().toDF().coalesce(1).write.parquet(s"$dir/wal/seg-00000")
    val mapJson =
      s"""{"databases":[{"name":"app",
         |  "urls":[{"url":"$dir/wal/seg-*","sid":"s0"}],
         |  "tables":{"docs":{"type":"clone","target":"docs",
         |    "signatures":true,"labels":true}}}]}""".stripMargin
    Files.writeString(Paths.get(s"$dir/map.json"), mapJson)
    graft.streaming.Orchestrator.runAvailable(spark, s"$dir/map.json",
      s"$dir/targets", Map("docs" -> docSpec), s"$dir/ckpt")
    val lbl = LakeTable.load(spark, s"$dir/targets/docs_labels")
    assert(labelRows(lbl) == Map("1" -> "1", "2" -> "1"),
      "near-dup docs 1,2 must land in one cluster; 3 stays absent-singleton")
    // labels without signatures is rejected loudly at start
    val badJson = mapJson.replace("\"signatures\":true,", "")
    Files.writeString(Paths.get(s"$dir/map2.json"), badJson)
    val ex = intercept[IllegalArgumentException] {
      graft.streaming.Orchestrator.runAvailable(spark, s"$dir/map2.json",
        s"$dir/targets2", Map("docs" -> docSpec), s"$dir/ckpt2")
    }
    assert(ex.getMessage.contains("labels"))
  }
}
