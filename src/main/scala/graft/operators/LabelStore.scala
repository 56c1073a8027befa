package graft.operators

import graft.lake.LakeTable
import graft.model.{ChangeEvent, TableMapping, TableMode, TableSpec}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Duplicate-cluster labels maintained BY the CDC ingest loop — X14 at
  * steady state, riding the same micro-batches as the signature companion
  * (SURVEY §2.7 X14b/X14c): as each applied batch upserts the signature
  * table, the label table (doc_id -> cluster_id, rows for dup-involved
  * docs only; absence = singleton) folds forward by composing the two
  * incremental kernels:
  *
  *   1. [[TextPipeline.clustersAfterDeletes]] over every doc the batch
  *      TOUCHED (deleted, inserted, or text-changed): a touched doc's OLD
  *      edges die — deletion obviously, but a text update equally (its
  *      pairs re-derive from the new signature) — so the clusters that
  *      contained touched docs recompute over their remaining members.
  *   2. [[TextPipeline.clustersAgainstLabels]] with the touched docs'
  *      CURRENT pairs (band join + signature agreement of the post-commit
  *      signature rows vs the whole signature table) merging them back in.
  *
  * The composition preserves the one invariant the whole family speaks:
  * labels == connected components over ALL current signature-agreement
  * pairs (the D5 predicate) — however incrementally it got there.
  *
  * Per-batch cost: O(touched docs + members of touched clusters + one
  * signature-table band scan) — the same order as the X13 dedup the
  * signatures already pay per batch; corpus TEXT is never read. The write
  * back into the label lake is a bucket- and zone-pruned merge of exactly
  * the CHANGED label rows, mirroring `SignatureStore.applyBatch`.
  *
  * Exactly-once: the label table keeps its own `commit-epoch` on its own
  * snapshot — a crash between the signature commit and the label commit
  * replays only the label half (and the fold is idempotent: it recomputes
  * from the already-committed signature state).
  */
object LabelStore {

  def schema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("cluster_id", StringType, nullable = false)))

  def spec(name: String = "labels", numBuckets: Int = 16): TableSpec =
    TableSpec(name, schema, keyCols = Seq("doc_id"), bucketCols = Seq("doc_id"),
      numBuckets = numBuckets)

  private def sigCols(s: DataFrame): DataFrame =
    s.select(col("doc_id") +:
      (0 until SignatureStore.K).map(k => col(s"h$k")): _*)

  /** Labels from scratch off the CURRENT signature table (one CC fixpoint
    * over its agreement pairs) — the bootstrap analog of
    * `SignatureStore.bootstrap`: covers labels enabled after the corpus
    * already ingested, or a vanished label table under a live checkpoint.
    * Records `labels-bootstrap = <signature snapshot version>` so it runs
    * once. Caller holds the label table's lock. */
  def bootstrap(labels: LakeTable, sig: LakeTable,
                force: Boolean = false): Boolean = {
    val lsnap = labels.snapshot()
    if (!force && lsnap.properties.contains("labels-bootstrap")) return false
    // every result lands in the lake before return — the kernels' temp
    // parquet must not outlive the call (the ingest loop runs forever)
    TextPipeline.scopedTmp {
    val ssnap = sig.snapshot()
    val sigs = sigCols(sig.read())
    val lbl = TextPipeline.propagateLabels(sigs.sparkSession,
      TextPipeline.signatureAgreementPairs(sigs, sigs, "labels_bootstrap"))
    val rows = lbl.select(col("doc_id").cast("string").as("doc_id"),
        col("cluster_id").cast("string").as("cluster_id"))
      .withColumn("__bucket",
        pmod(xxhash64(col("doc_id")), lit(lsnap.numBuckets)))
    labels.commit(labels.writeDataFiles(rows, lsnap.currentSchemaId),
      lsnap.files.map(_.path).toSet,
      properties = Map("labels-bootstrap" -> ssnap.version.toString))
    true
    }
  }

  /** Fold one applied micro-batch into the label table. MUST run after
    * `SignatureStore.applyBatch` committed the same batch (the fold reads
    * the POST-commit signature rows). Returns true if applied (false =
    * epoch already covers batchId). */
  def applyBatch(labels: LakeTable, sig: LakeTable,
                 events: Dataset[ChangeEvent], mapping: TableMapping,
                 docLake: LakeTable, textCol: String = "text",
                 batchId: Long, epochKey: String = "commit-epoch"): Boolean = {
    val spark = events.sparkSession
    val lsnap0 = labels.snapshot()
    val committed = lsnap0.properties.getOrElse(epochKey, "-1").toLong
    if (batchId <= committed) return false
    // scope the kernels' temp parquet to this batch: everything lands in
    // the label lake before return, and the ingest loop calls this once
    // per micro-batch — without the scope, temp dirs accumulate until
    // JVM exit on a long-running orchestrator
    TextPipeline.scopedTmp {
    val timing = sys.env.get("GRAFT_TIMING").contains("1")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = if (timing) {
      println(f"[labels] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    val docSnap = docLake.snapshot()
    val mergeKey = (if (docSnap.hasSid) Seq("sid") else Nil) ++ docSnap.keyCols
    val envSchema = mapping.sourceSchema.getOrElse(docSnap.schema)
    val routed = events.filter(Replay.routeCond(mapping))
    // a meta-only update to an existing row ('none' kind, no text in the
    // value map — the TOAST case) changes neither the doc's text nor its
    // existence under any key, so its edges are untouched; PK-updates
    // ('K'/'O' kinds) change existence under BOTH keys and always count
    val relevant = Replay.filterTransform(routed, mapping, envSchema)
      .filter(col("op").isin("I", "D") ||
        (col("op") === "U" &&
          (col("old_kind") =!= "none" ||
            map_contains_key(col("after"), textCol))))
    val appendMode = mapping.mode == TableMode.Append
    val touched = Replay.normalizeDF(relevant.toDF(), mergeKey, appendMode)
      .select(SignatureStore.docIdCol((0 until mergeKey.length).map(i =>
        element_at(col("key"), i + 1))).as("doc_id"))
      .distinct().filter(col("doc_id").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      lap("touched-set")
      if (touched.isEmpty) {
        labels.commit(Nil, Set.empty,
          properties = Map(epochKey -> batchId.toString))
        return true
      }
      lap("touched-empty-check")
      val old = labels.read().select(col("doc_id"), col("cluster_id"))
      val sigsNow = sigCols(sig.read())
      // 1. every touched doc's old edges die with its old signature.
      //    PERSIST the result: the merge kernel references its label input
      //    several times (endpoint semi, roots, relabel, fresh), and
      //    afterDel is a live multi-join plan, not a landed table
      val afterDel = TextPipeline.clustersAfterDeletes(
        spark, old, sigsNow, touched)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      lap("delete-kernel")
      // 2. docs still present re-pair off their POST-commit signatures;
      //    the touched set is batch-bounded, so the signature read prunes
      //    to its buckets at scale (semi join on the bucketed key).
      //    persisted: the agreement join references it once per band plus
      //    the verify side
      val touchedSigs = sigsNow.join(broadcast(touched), Seq("doc_id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val newPairs = TextPipeline.agreementPairsAgainst(
        sigsNow, touchedSigs, "labels_ingest")
      val next = TextPipeline.clustersAgainstLabels(spark, afterDel, newPairs)
      lap("merge-kernel")
      touchedSigs.unpersist(blocking = false)
      afterDel.unpersist(blocking = false)

      // changed rows only: the merge write must not rewrite untouched
      // clusters (at 10^10 docs the label table itself is large)
      val diff = old.as("o").join(next.as("n"), Seq("doc_id"), "full_outer")
        .filter(!(col("o.cluster_id") <=> col("n.cluster_id")))
        .select(col("doc_id"), col("n.cluster_id").as("cluster_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        lap("diff")
        val lsnap = labels.snapshot()
        val bucketOf = pmod(xxhash64(col("doc_id")), lit(lsnap.numBuckets))
        val statRow = diff.agg(
          collect_set(bucketOf.cast("int")).as("bs"),
          min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx")).head()
        val touchedBuckets = statRow.getSeq[Int](0).toSet
        if (touchedBuckets.isEmpty) {
          labels.commit(Nil, Set.empty,
            properties = Map(epochKey -> batchId.toString))
          return true
        }
        val zones = Seq(graft.lake.Zone("doc_id",
          lo = Option(statRow.getString(1)), hi = Option(statRow.getString(2))))
        val fileCap = graft.config.Knobs.compactFileCap
        val perBucket = lsnap.files.groupBy(_.bucket).view.mapValues(_.size).toMap
        val fragmented = touchedBuckets.filter(b =>
          perBucket.getOrElse(b, 0) > fileCap)
        val target = labels.read(buckets = Some(touchedBuckets), zones = zones,
          zoneExemptBuckets = fragmented)
        val out = target.join(diff.select("doc_id"), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("cluster_id"))
          .unionAll(diff.filter(col("cluster_id").isNotNull))
          .withColumn("__bucket", bucketOf)
        val removed = labels.selectFiles(buckets = Some(touchedBuckets),
          zones = zones, zoneExemptBuckets = fragmented).map(_.path).toSet
        labels.commit(labels.writeDataFiles(out, lsnap.currentSchemaId),
          removed, properties = Map(epochKey -> batchId.toString))
        lap("merge-write")
        true
      } finally diff.unpersist(blocking = false)
    } finally touched.unpersist(blocking = false)
    }
  }
}
