package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.functions.FloatDotProduct

class FloatDotProductSpec extends SparkTestBase {

  private def composed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  test("bit-identical to the aggregate(zip_with) left fold") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val got = rows.toDF("a", "b")
      .select(FloatDotProduct.dot(col("a"), col("b")).as("d"),
        composed(col("a"), col("b")).as("c")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("float array against a double-literal plane array (SRP shape)") {
    val s = spark; import s.implicits._
    val plane = graft.ops.Similarity.srpPlanes(dim = 16, nPlanes = 1, table = 0)(0)
    val warr = array(plane.map(lit): _*)
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(50)(Tuple1(Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val got = rows.toDF("a")
      .select(FloatDotProduct.dot(col("a"), warr).as("d"),
        composed(col("a"), warr).as("c")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null contract: null input, length mismatch, null element") {
    def litArr(xs: Seq[java.lang.Float]) =
      Literal.create(xs, ArrayType(FloatType, containsNull = true))
    def run(a: Literal, b: Literal): Any = FloatDotProduct(a, b).eval(null)
    val ab = litArr(Seq(1.0f, 2.0f))
    assert(run(ab, Literal.create(null, ArrayType(FloatType))) == null)
    assert(run(ab, litArr(Seq(1.0f))) == null)
    assert(run(ab, litArr(Seq(1.0f, null))) == null)
    assert(run(ab, litArr(Seq(3.0f, 4.0f))) == 11.0)
  }

  test("participates in whole-stage codegen (the composed form cannot)") {
    // a local Seq would constant-fold to a LocalTableScan — use range
    val df = spark.range(100)
      .select(transform(sequence(lit(1), lit(8)),
        i => (col("id") + i).cast("float")).as("a"))
    val q = df.select(FloatDotProduct.dot(col("a"), col("a")).as("d"))
    val plan = q.queryExecution.executedPlan.toString
    // "*(n)" marks a WholeStageCodegen stage; the HOF-built `a` column's
    // Project renders UNstarred right below it (CodegenFallback)
    assert("""\*\(\d+\) Project \[float_dot""".r.findFirstIn(plan).isDefined, plan)
    assert(q.agg(sum(col("d"))).head.getDouble(0) > 0) // codegen actually runs
  }
}
