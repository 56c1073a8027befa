package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit scratch main (not part of the driver contract): executes the
  * named SparkEntry queries (default: the join-heavy ones) and prints the
  * final adaptive physical plan plus a red-flag scan for all-pairs joins.
  * Usage: sbt "runMain graft.Plans [sfDir] [query ...]"
  */
object Plans {
  private val DefaultQueries = Seq(
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_incremental", "dedup_clusters", "dedup_clusters_incremental",
    "dedup_clusters_deletes",
    "embed_cosine_dedup", "embed_ann_lsh", "embed_ann_ivf", "embed_knn_topk",
    "pipeline_pack_sequences", "pipeline_decontaminate",
    "pipeline_mix_sample", "text_repetition", "pipeline_boilerplate")

  // knnBrute deliberately broadcasts the 5-row query side into a non-equi
  // join; annIvf's probe selection cross-joins queries with the BROADCAST
  // K-row centroid table (the required Q x K scoring work, bounded by K).
  // Every other query must stay free of all-pairs operators — and the
  // allowed ones must still show their REQUIRED scale shapes, so a
  // regression of annIvf's corpus-side lookup from hash join to NLJ fails
  // the audit even though an NLJ is allowed elsewhere in its plan.
  private val AllowedNlj = Set("embed_knn_topk", "embed_ann_ivf")
  private val RequiredShapes = Map(
    "embed_ann_ivf" -> Seq("BroadcastHashJoin [cluster", "WindowGroupLimit"),
    "embed_knn_topk" -> Seq("WindowGroupLimit"),
    // the incremental relabel pass must stay a BROADCAST of the tiny root
    // map against the big label table (a SortMergeJoin here would shuffle
    // the whole persisted label table per delta batch)
    "dedup_clusters_incremental" -> Seq("BroadcastHashJoin [cluster_id"),
    // untouched clusters must pass through via a broadcast anti-join on
    // the (tiny) touched-cluster set — never a shuffle of the label table
    "dedup_clusters_deletes" -> Seq("BroadcastHashJoin [cluster_id"),
    // packing's block offsets must BROADCAST back (a sort-merge join here
    // would shuffle the corpus a third time), and the corpus-side window
    // must be partitioned by blk (a global-order window = one task)
    "pipeline_pack_sequences" -> Seq("BroadcastHashJoin [blk"),
    // eval grams must broadcast against the corpus gram stream
    "pipeline_decontaminate" -> Seq("BroadcastHashJoin [gram"),
    // the tiny per-source totals must broadcast back onto the corpus scan
    "pipeline_mix_sample" -> Seq("BroadcastHashJoin [source"),
    // the frequent-gram set must broadcast back onto the gram stream
    "pipeline_boilerplate" -> Seq("BroadcastHashJoin [g"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else DefaultQueries
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.lake.BareLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var bad = 0
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // force AQE final plan
      val plan = df.queryExecution.executedPlan.toString
      val nlj = plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct")
      val missing = RequiredShapes.getOrElse(name, Nil).filterNot(plan.contains)
      val flag =
        if (nlj && !AllowedNlj.contains(name)) { bad += 1; "ALL-PAIRS!" }
        else if (missing.nonEmpty) { bad += 1; s"MISSING SHAPE: $missing" }
        else if (nlj) "nlj (allowed, shapes verified)" else "ok"
      println(s"==== $name [$flag] " + "=" * 40)
      if (sys.env.get("GRAFT_PLANS_FULL").contains("1")) println(plan)
      else println(plan.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("WholeStageCodegen") || l.contains("PushedFilters") ||
          l.contains("WindowGroupLimit"))
        .take(40).mkString("\n"))
    }
    println(s"[plans] all-pairs violations: $bad")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
