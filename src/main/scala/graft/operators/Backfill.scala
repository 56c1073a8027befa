package graft.operators

import graft.lake.LakeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Initial full sync (S4) — the batch analog of the reference's
  * `COPY source -> COPY dest` pipe (`streamer/full_sync.go:74-152`), run
  * when a target table is first attached (reference: when the replication
  * slot is created, `replicate_database.go:220-235`).
  *
  * Semantics preserved from `full_sync.go:104-135` / `process_clone.go:
  * 19-36`:
  *   - projection to the destination schema, intersect-don't-fail: source
  *     columns absent in the target are dropped, target columns absent in
  *     the source become NULL;
  *   - `kvsz_*` history columns are never copied from the source; history
  *     targets get an open initial version (start=1900, end=9999);
  *   - `sid` tenant discriminator injected when the target carries one.
  *
  * One narrow scan + bucket-clustered write; no shuffle besides the write
  * clustering. The LSN floor for subsequent streaming is recorded in the
  * snapshot properties (the analog of createReplicationSlot's consistent
  * point).
  */
object Backfill {

  def initialSync(lake: LakeTable, source: DataFrame, sid: Option[String] = None,
                  lsnFloor: Long = 0L, propKey: String = "full-sync"): Unit = {
    val snap = lake.snapshot()
    val schema = snap.schema
    val srcCols = source.columns.toSet
    val projected = source.select(schema.fields.toIndexedSeq.map { f =>
      f.name match {
        case "sid" if snap.hasSid && sid.isDefined => lit(sid.get).as("sid")
        case "kvsz_start" => lit(History.KVSZ_T0).cast(f.dataType).as(f.name)
        case "kvsz_end" => lit(History.KVSZ_OPEN).cast(f.dataType).as(f.name)
        case "kvsz_deleted" => lit(false).as(f.name)
        case n if srcCols.contains(n) => col(n).cast(f.dataType).as(n)
        case n => lit(null).cast(f.dataType).as(n)
      }
    }: _*)
    val withBucket = projected.withColumn("__bucket",
      pmod(xxhash64(snap.bucketCols.map(col): _*), lit(snap.numBuckets)))
    val files = lake.writeDataFiles(withBucket, snap.currentSchemaId)
    lake.commit(files, Set.empty, properties = Map(
      propKey -> "true",
      "lsn-high-watermark" -> math.max(lsnFloor,
        snap.properties.getOrElse("lsn-high-watermark", "-1").toLong).toString))
  }
}
