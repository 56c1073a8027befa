package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd vector kernels vs the higher-order-function formulation
  * they replace: bit-identical results (incl. NULL arrays and overflow
  * wraparound), and genuinely codegen'd (no CodegenFallback in the plan). */
class VectorExprsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
  private def hofSq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)

  test("dot and sqdist match the HOF formulation on deterministic fuzz") {
    val rows = (0 until 500).map { i =>
      def vec(seed: Long): Seq[Long] =
        (0 until 64).map(d => graft.gen.Gen.mix(seed * 131 + d) % 2001 - 1000)
      (i.toLong,
        if (i % 97 == 0) null else vec(i),
        if (i % 89 == 0) null else vec(i + 7))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
      VectorExprs.dotL(col("a"), col("b")).as("d"),
      VectorExprs.sqDistL(col("a"), col("b")).as("s"),
      hofDot(col("a"), col("b")).as("hd"),
      hofSq(col("a"), col("b")).as("hs"))
    val bad = got.filter(!(col("d") <=> col("hd")) || !(col("s") <=> col("hs")))
    assert(bad.count() == 0, s"mismatches:\n${bad.take(5).mkString("\n")}")
    // NULL array -> NULL result
    assert(got.filter(col("a").isNull && col("d").isNotNull).count() == 0)
    // NOTE out-of-contract divergence, deliberate: on values that overflow
    // a long, the kernel wraps (java semantics) where ANSI `*` throws; the
    // engine's quantized vectors (|x| <= 1000, Dim 64) keep every
    // intermediate < 2^36, far inside the contract.
  }

  test("mismatched lengths yield NULL (HOF parity), not a truncated fold") {
    // zip_with null-pads the shorter side and the sum null-propagates; the
    // kernel must agree so a dimension bug is a visible NULL, not a
    // plausible-but-wrong number — both interpreted and codegen paths
    val df = Seq(
      (1L, Seq(1L, 2L, 3L), Seq(4L, 5L)),
      (2L, Seq(1L), Seq(2L, 3L, 4L)),
      (3L, Seq(1L, 2L), Seq(3L, 4L)))
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
      VectorExprs.dotL(col("a"), col("b")).as("d"),
      VectorExprs.sqDistL(col("a"), col("b")).as("s"),
      hofDot(col("a"), col("b")).as("hd"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toSeq
    assert(got == Seq((1L, null, null, null), (2L, null, null, null),
      (3L, 11L, 8L, 11L)), s"got $got")
  }

  test("the kernels stay inside whole-stage codegen (no fallback)") {
    // arrays built with CreateArray (codegen-friendly — a `transform` HOF
    // in the same Project would itself force interpreted evaluation, which
    // is precisely what these kernels exist to avoid); non-foldable source
    val df = spark.range(1000)
      .select(array((1 to 8).map(d => col("id") * d): _*).as("a"),
        array((1 to 8).map(d => col("id") + d): _*).as("b"))
      .select(VectorExprs.dotL(col("a"), col("b")).as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the `*(N)` prefix marks operators fused into a WholeStageCodegen
    // stage; an interpreted-fallback Project would print without it
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.trim.stripPrefix("+- ").startsWith("*(")),
      s"the kernel's Project must be codegen-fused:\n$plan")
  }
}
