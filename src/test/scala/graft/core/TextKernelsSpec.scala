package graft.core

import graft.SparkSpec
import graft.TrainingOps
import org.apache.spark.sql.functions._

/** The codegen text kernels must be BIT-identical to their declarative
  * higher-order-function twins — the twins are what the DuckDB oracles
  * restate, so kernel == twin == oracle.
  */
class TextKernelsSpec extends SparkSpec {

  private val tricky = Seq(
    "", "x", "one two", "one two three", "one two three four five",
    "  leading and   multiple   spaces ", "trailing space ",
    "unicode éè tokens café naïve",
    "a b c a b c a b c", // repeated shingles -> distinct collapses
    "tab\tand\nnewline stay single tokens")

  test("rollingFp == HOF fingerprint on tricky strings") {
    import spark.implicits._
    val df = tricky.toDF("text")
    val rows = df.select(
      graft.expr.functions.rolling_fp(col("text")).as("kernel"),
      expr(TrainingOps.fpSqlSpark("text")).as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1), r))
  }

  test("tokenShingleFps == declarative shingleFps on tricky strings + fixture docs") {
    import spark.implicits._
    val df = tricky.zipWithIndex.map { case (t, i) => (s"d$i", t) }.toDF("doc_id", "text")
    val fixture = graft.pipeline.Fixtures.docs(spark, 120)
      .selectExpr("doc_id", "concat_ws(' ', transform(filter(spans, s -> s.text is not null), s -> s.text)) AS text")
    for (docs <- Seq(df, fixture)) {
      val kernel = TrainingOps.shingleFps(docs).collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val hof = TrainingOps.shingleFpsDeclarative(docs).collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(kernel === hof)
    }
  }

  test("simhash64 kernel == 64 declarative bit aggregates") {
    import spark.implicits._
    val docs = tricky.zipWithIndex.map { case (t, i) => (s"d$i", t) }.toDF("doc_id", "text")
    val fps = TrainingOps.shingleFps(docs)
    val lo = (0 until 32).map(TrainingOps.simhashBitSpark).mkString(" + ")
    val hi = (32 until 64).map(TrainingOps.simhashBitSpark).mkString(" + ")
    val rows = fps.withColumnRenamed("fps", "tokfps")
      .select(col("doc_id"),
        graft.expr.functions.simhash64(col("tokfps")).as("kernel"),
        expr(s"CAST($lo AS BIGINT)").as("dlo"), expr(s"CAST($hi AS BIGINT)").as("dhi"))
      .collect()
    rows.foreach { r =>
      val k = r.getSeq[Long](1)
      assert(k(0) === r.getLong(2) && k(1) === r.getLong(3), r)
    }
  }

  test("kernels participate in codegen (no interpreter fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val c = BoundReference(0, StringType, nullable = true)
    val proj = GenerateUnsafeProjection.generate(Seq(
      graft.expr.RollingFpExpr(c), graft.expr.TokenShingleFpsExpr(c, 3)))
    val row = proj(InternalRow(UTF8String.fromString("a b c d")))
    assert(row.getLong(0) === TextKernels.rollingFp("a b c d"))
    assert(row.getArray(1).toLongArray().toSeq ===
      TextKernels.tokenShingleFps("a b c d", 3).toSeq)
  }
}
