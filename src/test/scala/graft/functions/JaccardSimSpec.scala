package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JaccardSimSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),          // identical
    (Array(1L, 2L, 3L, 4L), Array(3L, 4L, 5L)),      // partial overlap
    (Array(1L, 2L), Array(3L, 4L)),                  // disjoint
    (Array.empty[Long], Array(1L, 2L)),              // one empty
    (Array.empty[Long], Array.empty[Long]),          // both empty
    (Array(Long.MinValue, -5L, 0L, Long.MaxValue),   // extremes
      Array(Long.MinValue, 7L, Long.MaxValue)),
  )

  test("jaccard_sim equals the array_intersect/array_union composition on sorted input") {
    val df = cases.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }.toDF("i", "a", "b")
      .select(col("i"),
        JaccardSim.jaccard_sim(col("a"), col("b")).as("fused"),
        when(size(array_union(col("a"), col("b"))) === 0, 0.0)
          .otherwise(size(array_intersect(col("a"), col("b"))).cast("double") /
            size(array_union(col("a"), col("b")))).as("builtin"))
    df.collect().foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"case ${r.getInt(0)}: fused ${r.getDouble(1)} vs builtin ${r.getDouble(2)}")
    }
  }

  test("interpreted eval agrees with codegen") {
    // expressions in a literal projection run interpreted via eval();
    // the same values must come back through the codegen'd DataFrame path
    cases.zipWithIndex.foreach { case ((a, b), i) =>
      val expr = JaccardSim(
        org.apache.spark.sql.catalyst.expressions.Literal.create(a,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(b,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)))
      val interpreted = expr.eval(null).asInstanceOf[Double]
      val viaDf = Seq((a, b)).toDF("a", "b")
        .select(JaccardSim.jaccard_sim(col("a"), col("b"))).as[Double].head()
      assert(interpreted == viaDf, s"case $i: $interpreted vs $viaDf")
    }
  }

  test("null input yields null, and SQL registration works") {
    JaccardSim.register(spark)
    val r = spark.sql(
      "SELECT jaccard_sim(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j").as[Double].head()
    assert(r == 0.5)
    val n = Seq((Some(Array(1L)), Option.empty[Array[Long]])).toDF("a", "b")
      .select(JaccardSim.jaccard_sim(col("a"), col("b"))).collect().head
    assert(n.isNullAt(0))
  }

  test("unsorted or duplicated input fails loudly, never an undercounted similarity") {
    JaccardSim.register(spark)
    // collect_list-shaped input passes the TYPE check (containsNull =
    // false) but violates the sorted-distinct invariant — the runtime
    // guard must throw, not silently undercount the intersection
    for (q <- Seq(
      "SELECT jaccard_sim(array(3L, 1L, 2L), array(1L, 2L, 3L))", // unsorted left
      "SELECT jaccard_sim(array(1L, 2L), array(2L, 1L))",         // unsorted right
      "SELECT jaccard_sim(array(1L, 1L, 2L), array(1L, 2L))")) {  // duplicate
      val e = intercept[Exception] { spark.sql(q).collect() }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msgs.contains("sorted-distinct"), s"$q → $msgs")
    }
    // the interpreted path guards identically
    val expr = JaccardSim(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(3L, 1L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1L, 3L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)))
    val ei = intercept[IllegalArgumentException] { expr.eval(null) }
    assert(ei.getMessage.contains("sorted-distinct"))
    // sorted inputs still compute (guard is pass-through on the happy path)
    assert(spark.sql("SELECT jaccard_sim(array(1L, 2L, 3L), array(2L, 3L, 4L))")
      .head().getDouble(0) == 0.5)
  }

  test("nullable array ELEMENTS are rejected at analysis, not mis-summed") {
    // a null slot would read as 0L in the merge loop and count phantom
    // matches — the type check must refuse containsNull inputs
    val e = intercept[Exception] {
      spark.sql("SELECT jaccard_sim(array(1L, CAST(NULL AS BIGINT)), array(0L, 1L))")
        .collect()
    }
    assert(e.getMessage.contains("non-nullable") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"), e.getMessage)
  }
}
