package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an `embeddings(vec_id, embedding: array<float>,
  * label)` table: brute-force top-k as the correctness baseline, a
  * random-hyperplane LSH bucketing as the scale path, and cosine near-dup
  * pairing for embedding-level dedup.
  *
  * Determinism contract: embeddings are quantized to integers
  * (round(x * 1000)), every score is integer arithmetic (exact in both
  * Spark and the DuckDB oracle); the only floats are final cosine ratios
  * (single IEEE ops — bit-identical across engines). Dot products stay in
  * whole-stage codegen via `zip_with` + `aggregate`; no UDFs.
  *
  * Scale notes: brute-force is O(Q·N) — fine for a bounded query set
  * (broadcast the quantized queries); the LSH variant buckets the corpus
  * once (one shuffle on bucket id) so candidate generation is
  * O(N · bucket_occupancy) — that is the 100 TB path. Every bucketed
  * operator takes its bucket-count knob as an argument (planes / K+probe /
  * bandBits — the driver-contract entry points bind the tuned defaults)
  * and carries always-on candidate-volume telemetry observed on its own
  * candidate join ([[observeCandidates]]) so a lagging knob shows up as a
  * loud candidate-volume warning, not a silent quadratic job.
  */
object Similarity {

  val Dim = 64
  val Q = 1000 // quantization scale

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    TextPipeline.spreadTinyScan(spark.read.parquet(s"$dir/embeddings.parquet"))

  /** Integer-quantized vector: round(double(x) * 1000) per element. */
  private val qvec: Column =
    transform(col("embedding"), x => round(x.cast("double") * Q, 0).cast("long"))

  // codegen'd custom Expression (graft.functions.VectorExprs): the
  // aggregate(zip_with(...)) composition is CodegenFallback — interpreted
  // lambda dispatch per element; VectorExprsSpec pins bit-equality
  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotL(a, b)

  // NOTE every oracle sum() is CAST AS BIGINT: DuckDB's sum over BIGINT
  // returns HUGEINT (int128), which the driver's value hasher normalizes
  // differently than Spark's int64 — the round-1 hash mismatches on the
  // embed_* queries came from exactly this.
  private val qvecSql = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

  /** Per-element exploded quantized view shared by the oracle queries. */
  private val qvSql =
    s"""q AS (SELECT vec_id, $qvecSql AS v FROM embeddings),
qv AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM q)"""

  // ---------------------------------------------------------------------
  // S1: brute-force top-k — query vectors vec_id < NumQueries against the
  // whole corpus by quantized dot product
  // ---------------------------------------------------------------------

  val NumQueries = 5
  val TopK = 10

  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir).select(col("vec_id"), qvec.as("v"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = broadcast(q).join(e, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        dot(col("qv"), col("v")).as("dot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("dot").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TopK)
      .orderBy("query_id", "rnk")
  }

  val knnBruteOracle: String =
    s"""WITH $qvSql,
dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, CAST(sum(a.x * b.x) AS BIGINT) AS dot
         FROM qv a JOIN qv b ON a.i = b.i AND a.vec_id < $NumQueries AND b.vec_id <> a.vec_id
         GROUP BY 1, 2)
SELECT query_id, neighbor_id, dot,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS BIGINT) AS rnk
FROM dots
QUALIFY rnk <= $TopK
ORDER BY query_id, rnk"""

  // ---------------------------------------------------------------------
  // S2: LSH-bucketed ANN — 8 deterministic integer hyperplanes -> 256
  // sign-pattern buckets; nearest in-bucket neighbor per vector
  // ---------------------------------------------------------------------

  val Planes = 8

  /** Deterministic integer hyperplane weight for (plane p, 1-based dim d). */
  def planeWeight(p: Int, d: Int): Long =
    (1103515245L * (p * Dim + d) + 12345L) % 2001L - 1000L

  // ---------------------------------------------------------------------
  // Candidate-volume telemetry — the scale instrument for every bucketed /
  // banded candidate generator below. Candidate volume is
  // sum_buckets n*(n-1)/2: if bucket counts do not grow with the corpus,
  // that term goes quadratic. The telemetry is an `observe` (CollectMetrics)
  // ON THE OPERATOR'S OWN CANDIDATE JOIN: the metrics are computed inside
  // the job the operator already runs — zero extra passes, zero persisted
  // frames (the round-4 eager-persist variant cost 4-5 s per invocation
  // and pinned an O(corpus) cached frame per operator; see VERDICT r4 #1).
  // A QueryExecutionListener harvests the observed row when the action
  // completes and records it in the registry + stderr + the
  // GRAFT_METRICS_DIR sidecar. GRAFT_OCCUPANCY=0 opts OUT (A/B runs only).
  // ---------------------------------------------------------------------

  final case class Occupancy(buckets: Long, maxOccupancy: Long,
                             candidatePairs: Long)

  /** Exact histogram aggregate over bucketed rows: bucket count, largest
    * bucket, and the exact candidate-pair volume the in-bucket self-join
    * would produce. NOT on any hot path — this is the explicit diagnostic
    * to run when [[lastCandidateStats]] fires the volume alarm and you need
    * the hot bucket named. */
  def occupancy(banded: DataFrame, bucketCols: Seq[String]): Occupancy = {
    val r = banded.groupBy(bucketCols.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)),
        coalesce(max(col("n")), lit(0L)),
        // n*(n-1) is even, so the integral division is exact
        coalesce(floor(sum(col("n") * (col("n") - 1)) / 2).cast("long"), lit(0L)))
      .head()
    Occupancy(r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Free telemetry harvested from the candidate join itself.
    * `candidatePairs` is EXACT: the join's pre-distinct output row count =
    * sum over buckets of the in-bucket pair volume — the actual quadratic
    * cost, observed where it is paid. `collidingBuckets` approximates
    * (HyperLogLog++) the number of buckets that produced any candidate.
    * `maxOccupancyBound` is the largest single-bucket size consistent with
    * the observed volume (n(n-1)/2 <= pairs) — an upper bound; run
    * [[occupancy]] for the exact histogram when the alarm fires. */
  final case class CandidateStats(candidatePairs: Long, collidingBuckets: Long,
                                  maxOccupancyBound: Long)

  private val statsRegistry =
    new java.util.concurrent.ConcurrentHashMap[String, CandidateStats]()

  /** Latest candidate-volume stats per bucketed operator (telemetry sink;
    * populated asynchronously when the operator's action completes). */
  def lastCandidateStats(op: String): Option[CandidateStats] =
    Option(statsRegistry.get(op))

  /** Operators that have recorded candidate-volume stats this JVM
    * (MetricsHttp renders the registry from this). */
  def observedOps: Set[String] = {
    import scala.jdk.CollectionConverters._
    statsRegistry.keySet.asScala.toSet
  }

  private val occupancyOff = sys.env.get("GRAFT_OCCUPANCY").contains("0")
  // candidate-volume alarm threshold: fire when one operator invocation's
  // candidate join exceeds this many pairs (quadratic-blowup signal —
  // raise the operator's planes/bandBits/K/dfCap knob)
  private val candidateCap =
    sys.env.getOrElse("GRAFT_CANDIDATE_CAP", "100000000").toLong

  private val ObsPrefix = "graft_candidates_"
  // observation names must be unique WITHIN one query plan: composing the
  // same operator twice (e.g. a union of two corpora's dedups) would
  // otherwise fail analysis on a duplicate CollectMetrics name — suffix a
  // per-invocation counter, stripped again at harvest time
  private val obsCounter = new java.util.concurrent.atomic.AtomicLong()
  // one listener per SparkSession (keyed by session UUID; stopped bench
  // sessions leave a stale key behind, bounded by session churn)
  private val listenerSessions =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def record(op: String, s: CandidateStats): Unit = {
    statsRegistry.put(op, s)
    System.err.println(s"[occupancy] op=$op candidate_pairs=${s.candidatePairs} " +
      s"colliding_buckets~=${s.collidingBuckets} max_occupancy<=${s.maxOccupancyBound}")
    if (s.candidatePairs > candidateCap)
      System.err.println(s"[occupancy] WARNING op=$op candidate volume " +
        s"${s.candidatePairs} > cap $candidateCap — going quadratic; raise " +
        "the operator's bucket knob (planes / bandBits / K / dfCap); run " +
        "Similarity.occupancy(...) for the exact hot-bucket histogram")
    sys.env.get("GRAFT_METRICS_DIR").foreach { d =>
      try {
        val dir = java.nio.file.Paths.get(d)
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.writeString(dir.resolve("occupancy.jsonl"),
          s"""{"op":"$op","candidate_pairs":${s.candidatePairs},"colliding_buckets":${s.collidingBuckets},"max_occupancy_bound":${s.maxOccupancyBound}}""" + "\n",
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      } catch { case e: Throwable =>
        System.err.println(s"[occupancy] sidecar write failed: ${e.getMessage}")
      }
    }
  }

  private def ensureListener(spark: SparkSession): Unit =
    if (listenerSessions.add(
        s"${spark.sparkContext.applicationId}@${System.identityHashCode(spark)}"))
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
                                 qe: org.apache.spark.sql.execution.QueryExecution,
                                 durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              if (name.startsWith(ObsPrefix)) {
                val pairs = row.getLong(0)
                // largest n with n(n-1)/2 <= pairs
                val bound =
                  ((1.0 + math.sqrt(1.0 + 8.0 * pairs.toDouble)) / 2.0).toLong
                record(name.stripPrefix(ObsPrefix).takeWhile(_ != '#'),
                  CandidateStats(pairs, row.getLong(1), bound))
              }
            }
          override def onFailure(funcName: String,
                                 qe: org.apache.spark.sql.execution.QueryExecution,
                                 exception: Exception): Unit = ()
        })

  /** Attach the always-on candidate-volume observation to one operator's
    * candidate join OUTPUT (call it on the joined frame BEFORE any
    * distinct/verify): computed by the join's own job — no extra pass, no
    * cache. `bucketKey` is the join's bucket key as seen in the joined
    * row (e.g. struct(col("x.band"), col("x.bk"))). Records only when the
    * join actually executes: if the optimizer eliminates the subtree (e.g.
    * a count() over a composed pipeline drops an outer-joined dedup branch
    * entirely), there was no candidate volume to alarm on — and no cost. */
  private[graft] def observeCandidates(op: String, candidates: DataFrame,
                                       bucketKey: Column): DataFrame = {
    if (occupancyOff) return candidates
    ensureListener(candidates.sparkSession)
    candidates.observe(s"$ObsPrefix$op#${obsCounter.incrementAndGet()}",
      count(lit(1)).as("pairs"),
      approx_count_distinct(bucketKey).as("buckets"))
  }

  /** Default-knob entry (driver contract). */
  def annLsh(spark: SparkSession, dir: String): DataFrame =
    annLsh(spark, dir, Planes)

  /** @param planes hyperplane count -> 2^planes buckets. THE scale knob:
    *               in-bucket candidate volume is O(N^2 / 2^planes) on
    *               spread-out data, so planes must grow ~2·log2(N/target
    *               occupancy) with the corpus; [[observeCandidates]] makes a
    *               lagging knob visible at run time. */
  def annLsh(spark: SparkSession, dir: String, planes: Int): DataFrame = {
    require(planes >= 1 && planes <= 62, s"planes out of range: $planes")
    val e = embeddings(spark, dir).select(col("vec_id"), qvec.as("v"))
    val bucket = (0 until planes).map { p =>
      val w = array((1 to Dim).map(d => lit(planeWeight(p, d))): _*)
      when(dot(col("v"), w) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val b = e.withColumn("bucket", bucket)
    val pairs = observeCandidates("embed_ann_lsh",
      b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("x.bucket").as("bucket"),
        col("y.vec_id").as("nn_id"), dot(col("x.v"), col("y.v")).as("dot")),
      col("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("dot").desc, col("nn_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("vec_id", "bucket", "nn_id", "dot")
      .orderBy("vec_id")
  }

  val annLshOracle: String =
    s"""WITH $qvSql,
w AS (SELECT p, d, (1103515245 * (p * $Dim + d) + 12345) % 2001 - 1000 AS wt
      FROM range(0, $Planes) t1(p), range(1, ${Dim + 1}) t2(d)),
bits AS (SELECT vec_id, p, CASE WHEN sum(wt * x) > 0 THEN 1 << p ELSE 0 END AS bv
         FROM qv JOIN w ON w.d = qv.i GROUP BY vec_id, p),
buck AS (SELECT vec_id, CAST(sum(bv) AS BIGINT) AS bucket FROM bits GROUP BY vec_id),
dots AS (SELECT a.vec_id AS vec_id, bx.bucket AS bucket, b.vec_id AS nn_id, CAST(sum(a.x * b.x) AS BIGINT) AS dot
         FROM qv a JOIN buck bx ON bx.vec_id = a.vec_id
              JOIN buck by_ ON by_.bucket = bx.bucket AND by_.vec_id <> a.vec_id
              JOIN qv b ON b.vec_id = by_.vec_id AND b.i = a.i
         GROUP BY 1, 2, 3)
SELECT vec_id, bucket, nn_id, dot FROM dots
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, nn_id) = 1
ORDER BY vec_id"""

  // ---------------------------------------------------------------------
  // S2b: IVF ANN — deterministic integer k-means coarse quantizer
  // (K centroids, fixed seeds = the first K vectors, 2 Lloyd iterations,
  // floor-of-mean integer centroids), then probe-pruned exact search:
  // each query scans only its IvfProbe nearest clusters. This is the
  // inverted-file scale path: candidate volume is O(N * probe/K) instead
  // of O(N); at corpus scale K grows ~ sqrt(N) and the per-cluster lists
  // become the partition layout. Everything is integer-exact (squared L2
  // distances; floor of an exact double division), so the DuckDB oracle
  // reproduces the clustering bit-for-bit.
  // ---------------------------------------------------------------------

  val IvfK = 8
  val IvfIters = 2
  val IvfProbe = 2
  val IvfTopK = 5

  private def dist2(a: Column, b: Column): Column =
    graft.functions.VectorExprs.sqDistL(a, b)

  /** Default-knob entry (driver contract). */
  def annIvf(spark: SparkSession, dir: String): DataFrame =
    annIvf(spark, dir, IvfK, IvfProbe, IvfIters)

  /** @param k     cluster count — grow ~ sqrt(N) with the corpus so the
    *              probed candidate volume O(N·probe/k) stays bounded
    * @param probe clusters scanned per query (recall/cost dial) */
  def annIvf(spark: SparkSession, dir: String, k: Int, probe: Int,
             iters: Int): DataFrame = {
    require(k >= 1 && probe >= 1 && probe <= k,
      s"bad ivf knobs: k=$k probe=$probe")
    val e = embeddings(spark, dir).select(col("vec_id"), qvec.as("v"))
    def centLit(c: Array[Long]): Column = array(c.map(lit(_)).toIndexedSeq: _*)
    // argmin over (dist2, cid): array_min on struct is lexicographic
    def clusterOf(v: Column, cs: Array[Array[Long]]): Column =
      array_min(array(cs.zipWithIndex.map { case (c, i) =>
        struct(dist2(v, centLit(c)).as("d"), lit(i.toLong).as("cid"))
      }.toIndexedSeq: _*)).getField("cid")

    // seeds: the first K vectors (deterministic; they stay in the corpus)
    var cents: Array[Array[Long]] = e.filter(col("vec_id") < k)
      .orderBy("vec_id").select("v").collect()
      .map(_.getSeq[Long](0).toArray)
    // Lloyd iterations; the K x Dim centroid table is bounded driver-side
    // metadata (like AQE stats), everything per-row stays distributed
    (1 to iters).foreach { _ =>
      val sums = e.withColumn("cid", clusterOf(col("v"), cents))
        .select(col("cid"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy("cid", "i").agg(sum("x").as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
        .toMap
      cents = cents.zipWithIndex.map { case (old, cid) =>
        Array.tabulate(Dim) { i =>
          sums.get((cid.toLong, i))
            // floor of an exact double division (|sum| < 2^53): identical
            // in Spark and DuckDB; empty cluster keeps its old centroid
            .map { case (s, n) => math.floor(s.toDouble / n).toLong }
            .getOrElse(old(i))
        }
      }
    }
    val assigned = e.withColumn("cluster", clusterOf(col("v"), cents))

    // per-query probe selection stays DISTRIBUTED: queries cross-join the
    // broadcast K-row centroid table (the only driver-side object is the
    // K x Dim centroid array Lloyd's update already produces — bounded
    // metadata, like AQE stats) and take the `probe` nearest centroids via
    // row_number, which compiles to WindowGroupLimit. No query-side
    // collect: the same plan serves 5 queries or 10^5.
    import spark.implicits._
    val centDF = cents.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }.toSeq.toDF("cid", "c")
    val qside = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2"), col("cid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("dot").desc, col("neighbor_id"))
    // inverted-file lookup as an EQUI-join on cluster id (probes exploded
    // to (query, cluster) rows) — hash join, not a nested-loop scan
    val probeRows = qside.crossJoin(broadcast(centDF))
      .withColumn("d2", dist2(col("qv"), col("c")))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= probe)
      .select(col("query_id"), col("qv"), col("cid").as("cluster"))
    observeCandidates("embed_ann_ivf",
      broadcast(probeRows)
        .join(assigned, Seq("cluster"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          col("cluster"), dot(col("qv"), col("v")).as("dot")),
      col("cluster"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= IvfTopK)
      .orderBy("query_id", "rnk")
  }

  val annIvfOracle: String = {
    // one Lloyd iteration: assign to nearest cPrev, then floor-of-mean
    def iter(n: Int, prev: String): String =
      s"""d$n AS (SELECT q.vec_id, c.cid, CAST(sum((q.x - c.c)*(q.x - c.c)) AS BIGINT) AS d2
       FROM qv q JOIN $prev c ON c.i = q.i GROUP BY 1, 2),
a$n AS (SELECT vec_id, cid FROM d$n
       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
m$n AS (SELECT a$n.cid, q.i, CAST(floor(CAST(sum(q.x) AS DOUBLE)/count(*)) AS BIGINT) AS c
       FROM qv q JOIN a$n ON a$n.vec_id = q.vec_id GROUP BY 1, 2),
c$n AS (SELECT p.cid, p.i, coalesce(m$n.c, p.c) AS c FROM $prev p
       LEFT JOIN m$n ON m$n.cid = p.cid AND m$n.i = p.i)"""
    s"""WITH $qvSql,
c0 AS (SELECT vec_id AS cid, i, x AS c FROM qv WHERE vec_id < $IvfK),
${iter(1, "c0")},
${iter(2, "c1")},
df AS (SELECT q.vec_id, c.cid, CAST(sum((q.x - c.c)*(q.x - c.c)) AS BIGINT) AS d2
       FROM qv q JOIN c2 c ON c.i = q.i GROUP BY 1, 2),
af AS (SELECT vec_id, cid AS cluster FROM df
       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
qp AS (SELECT vec_id AS query_id, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS pr
       FROM df WHERE vec_id < $NumQueries),
cand AS (SELECT p.query_id, af.vec_id AS neighbor_id, CAST(af.cluster AS BIGINT) AS cluster
         FROM qp p JOIN af ON af.cluster = p.cid AND af.vec_id <> p.query_id
         WHERE p.pr <= $IvfProbe),
dots AS (SELECT c.query_id, c.neighbor_id, c.cluster, CAST(sum(a.x * b.x) AS BIGINT) AS dot
         FROM cand c JOIN qv a ON a.vec_id = c.query_id
              JOIN qv b ON b.vec_id = c.neighbor_id AND b.i = a.i
         GROUP BY 1, 2, 3)
SELECT query_id, neighbor_id, cluster, dot,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS BIGINT) AS rnk
FROM dots QUALIFY rnk <= $IvfTopK
ORDER BY query_id, rnk"""
  }

  // ---------------------------------------------------------------------
  // S3: embedding cosine near-dup pairs — banded-LSH candidate prefilter
  // + exact integer verify:
  //   dot > 0 AND dot^2 * 10^4 >= t^2 * |a|^2 * |b|^2   (t in 1/100)
  //
  // The round-1 all-pairs self-join (BroadcastNestedLoopJoin, O(N^2)) is
  // gone: candidates come from DedupBands sign-bands over DedupPlanes
  // random hyperplanes — a hash join on (band, band-bucket), one shuffle.
  // Banding loses recall on far pairs (LSH is approximate by design; the
  // oracle mirrors the banding bit-exactly, and SimilaritySpec checks
  // recall on planted near-identical pairs). At corpus scale, raise
  // BandBits to keep per-bucket occupancy bounded — candidate volume is
  // O(N^2 * bands / 2^BandBits) on random data, O(N * dup-cluster size)
  // on real near-dup corpora.
  // ---------------------------------------------------------------------

  val CosThreshold100 = 45 // cosine >= 0.45 (tuned to the synthetic corpus)
  val DedupPlanes = 16
  val BandBits = 4
  val DedupBands: Int = DedupPlanes / BandBits // 4 bands x 4-bit buckets

  /** Sign signature over the first `planes` dedup hyperplanes (the same
    * deterministic [[planeWeight]] family annLsh uses). */
  private[graft] def signature(v: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val w = array((1 to Dim).map(d => lit(planeWeight(p, d))): _*)
      when(dot(v, w) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Default-knob entry (driver contract). */
  def cosineDedup(spark: SparkSession, dir: String): DataFrame =
    cosineDedup(spark, dir, DedupPlanes, BandBits)

  /** @param planes   signature width (planes = bands * bandBits)
    * @param bandBits bits per band — the occupancy knob: per-band bucket
    *                 count is 2^bandBits, so raise it with the corpus to
    *                 keep candidate volume O(N · dup-cluster size) */
  def cosineDedup(spark: SparkSession, dir: String, planes: Int,
                  bandBits: Int): DataFrame = {
    require(planes % bandBits == 0 && planes <= 62 && bandBits >= 1,
      s"bad dedup knobs: planes=$planes bandBits=$bandBits")
    val bands = planes / bandBits
    val e = embeddings(spark, dir).select(col("vec_id"), qvec.as("v"))
      .withColumn("n2", dot(col("v"), col("v")))
      .withColumn("sig", signature(col("v"), planes))
    val banded = e.select(col("vec_id"), posexplode(
      array((0 until bands).map(b =>
        shiftright(col("sig"), b * bandBits) % (1 << bandBits)): _*))
      .as(Seq("band", "bk")))
    val cand = observeCandidates("embed_cosine_dedup",
      banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.vec_id") < col("y.vec_id")),
      struct(col("x.band"), col("x.bk")))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b")).distinct()
    val t2 = CosThreshold100.toLong * CosThreshold100
    cand
      .join(e.select(col("vec_id").as("a"), col("v").as("va"), col("n2").as("na2")), "a")
      .join(e.select(col("vec_id").as("b"), col("v").as("vb"), col("n2").as("nb2")), "b")
      .withColumn("dot", dot(col("va"), col("vb")))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * 10000L >= lit(t2) * col("na2") * col("nb2"))
      // integer-scaled cosine: floor(dot * 1e6 / sqrt(na2*nb2)). All inputs
      // are exact in double (< 2^53) and each step is a single IEEE op, so
      // the bigint result is bit-identical across engines.
      .withColumn("cos_sim_e6",
        floor(col("dot").cast("double") * 1000000d /
          sqrt((col("na2") * col("nb2")).cast("double"))).cast("long"))
      .select("a", "b", "dot", "cos_sim_e6")
      .orderBy("a", "b")
  }

  val cosineDedupOracle: String = {
    val t2 = CosThreshold100.toLong * CosThreshold100
    s"""WITH $qvSql,
n AS (SELECT vec_id, CAST(sum(x * x) AS BIGINT) AS n2 FROM qv GROUP BY vec_id),
w AS (SELECT p, d, (1103515245 * (p * $Dim + d) + 12345) % 2001 - 1000 AS wt
      FROM range(0, $DedupPlanes) t1(p), range(1, ${Dim + 1}) t2(d)),
bits AS (SELECT vec_id, p, CASE WHEN sum(wt * x) > 0 THEN 1 << p ELSE 0 END AS bv
         FROM qv JOIN w ON w.d = qv.i GROUP BY vec_id, p),
sig AS (SELECT vec_id, CAST(sum(bv) AS BIGINT) AS sig FROM bits GROUP BY vec_id),
banded AS (SELECT vec_id, b.band, (sig >> (b.band * $BandBits)) % ${1 << BandBits} AS bk
           FROM sig, range(0, $DedupBands) b(band)),
cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b FROM banded x JOIN banded y
         ON x.band = y.band AND x.bk = y.bk AND x.vec_id < y.vec_id),
dots AS (SELECT c.a, c.b, CAST(sum(p.x * q.x) AS BIGINT) AS dot
         FROM cand c JOIN qv p ON p.vec_id = c.a JOIN qv q ON q.vec_id = c.b AND q.i = p.i
         GROUP BY 1, 2)
SELECT d.a, d.b, d.dot,
  CAST(floor(CAST(d.dot AS DOUBLE) * 1000000 / sqrt(CAST(na.n2 * nb.n2 AS DOUBLE))) AS BIGINT) AS cos_sim_e6
FROM dots d JOIN n na ON na.vec_id = d.a JOIN n nb ON nb.vec_id = d.b
WHERE d.dot > 0 AND d.dot * d.dot * 10000 >= $t2 * na.n2 * nb.n2
ORDER BY a, b"""
  }
}
