package graft

import graft.gen.Gen
import graft.lake.LakeTable
import graft.model.{TableMapping, Transcripts}
import graft.operators.Replay
import graft.streaming.MetricsHttp
import org.scalatest.funsuite.AnyFunSuite

/** The /metrics scrape endpoint: Prometheus text rendering of the
  * snapshot-committed counters (reference metrics.go analog). */
class MetricsHttpSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("scrape returns snapshot-consistent counters in exposition format") {
    val dir = SparkTestBase.tmpDir("methttp")
    val lake = LakeTable.create(spark, s"$dir/t", Transcripts.spec(numBuckets = 4))
    val cfg = Gen.Config(numEvents = 2000, numConvs = 20, seed = 21)
    Replay.applyBatch(lake, Gen.events(spark, cfg),
      TableMapping("transcripts", "transcripts"), 0)
    val props = lake.snapshot().properties

    val srv = MetricsHttp.start(spark, Map("transcripts" -> s"$dir/t"))
    try {
      val url = java.net.URI.create(s"http://127.0.0.1:${srv.port}/metrics")
      val resp = java.net.http.HttpClient.newHttpClient().send(
        java.net.http.HttpRequest.newBuilder(url).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      assert(resp.headers().firstValue("Content-Type").get.startsWith("text/plain"))
      val body = resp.body()
      // counters match the snapshot properties exactly (atomic truth)
      assert(body.contains(
        s"""graft_ops_total{table="transcripts",op="I"} ${props("metrics-ops-I")}"""),
        s"body:\n$body")
      assert(body.contains(
        s"""graft_lsn_high_watermark{table="transcripts"} ${props("lsn-high-watermark")}"""))
      assert(body.contains(
        s"""graft_commit_epoch{table="transcripts",source="default"} 0"""))
      assert(body.contains("""graft_snapshot_version{table="transcripts"} 2"""))
      assert(body.contains("graft_data_files{"))
      // a second batch moves the scrape, proving read-through (no caching)
      Replay.applyBatch(lake, Gen.events(spark, cfg.copy(seed = 22)),
        TableMapping("transcripts", "transcripts"), 1)
      val body2 = java.net.http.HttpClient.newHttpClient().send(
        java.net.http.HttpRequest.newBuilder(url).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      assert(body2.contains("""graft_snapshot_version{table="transcripts"} 3"""))
      assert(body2.contains(
        s"""graft_commit_epoch{table="transcripts",source="default"} 1"""))
    } finally srv.stop()
  }

  test("candidate-volume telemetry registry is scrapeable") {
    // run one bucketed operator so its observation lands in the registry
    // (harvested async by the QueryExecutionListener — poll briefly)
    operators.Similarity.cosineDedup(spark, "/root/testdata/sf0.001").count()
    val deadline = System.nanoTime() + 10L * 1000000000L
    while (operators.Similarity.lastCandidateStats("embed_cosine_dedup").isEmpty &&
           System.nanoTime() < deadline) Thread.sleep(50)
    val stats = operators.Similarity.lastCandidateStats("embed_cosine_dedup")
      .getOrElse(fail("telemetry must record"))
    val srv = MetricsHttp.start(spark, Map.empty)
    try {
      val body = java.net.http.HttpClient.newHttpClient().send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${srv.port}/metrics")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      assert(body.contains(
        s"""graft_candidate_pairs{op="embed_cosine_dedup"} ${stats.candidatePairs}"""),
        s"body:\n$body")
      assert(body.contains(
        s"""graft_bucket_max_occupancy_bound{op="embed_cosine_dedup"} ${stats.maxOccupancyBound}"""))
      assert(body.contains(
        s"""graft_colliding_buckets{op="embed_cosine_dedup"} ${stats.collidingBuckets}"""))
    } finally srv.stop()
  }

  test("unreadable table renders a scrape error, not a failed scrape") {
    val srv = MetricsHttp.start(spark, Map("ghost" -> "/nonexistent/lake"))
    try {
      val resp = java.net.http.HttpClient.newHttpClient().send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${srv.port}/metrics")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      assert(resp.body().contains("""graft_table_scrape_error{table="ghost"} 1"""))
    } finally srv.stop()
  }
}
