package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.ops.Tables.embeddings(spark, sfDir)

  test("native vec_dot / vec_cosine match the HOF forms bit-for-bit on real embeddings") {
    val anchor = emb.where(col("vec_id") === 0).select(col("embedding").as("a"))
    val both = emb.join(broadcast(anchor))
      .select(
        col("vec_id"),
        VectorFunctions.dot(col("embedding"), col("a")).as("d_native"),
        VectorFunctions.dotHof(col("embedding"), col("a")).as("d_hof"),
        VectorFunctions.cosine(col("embedding"), col("a")).as("c_native"),
        VectorFunctions.cosineHof(col("embedding"), col("a")).as("c_hof"),
      )
      .collect()
    both.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"dot mismatch at vec ${r.getLong(0)}")
      assert(math.abs(r.getDouble(3) - r.getDouble(4)) < 1e-12,
        s"cosine mismatch at vec ${r.getLong(0)}")
    }
  }

  test("native expressions are codegen-capable (not CodegenFallback) and handle edges") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val e = FloatVecCosine(
      org.apache.spark.sql.graftshim.ColumnShim.expression(col("x")),
      org.apache.spark.sql.graftshim.ColumnShim.expression(col("y")))
    assert(!e.isInstanceOf[CodegenFallback], "vec_cosine must emit real codegen")
    val edge = Seq(
      (Seq.empty[Float], Seq.empty[Float]),
      (Seq(0f, 0f), Seq(1f, 1f)),
      (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
    ).toDF("x", "y")
      .select(
        VectorFunctions.dot(col("x"), col("y")).as("d"),
        VectorFunctions.cosine(col("x"), col("y")).as("c"),
      ).collect()
    assert(edge(0).getDouble(0) == 0.0 && edge(0).getDouble(1) == 0.0)
    assert(edge(1).getDouble(1) == 0.0) // zero-norm guard
    assert(edge(2).getDouble(0) == 32.0)
  }

  test("null array inputs yield null (BinaryExpression null semantics)") {
    val df = Seq((Some(Seq(1f, 2f)), None: Option[Seq[Float]])).toDF("x", "y")
      .select(VectorFunctions.dot(col("x"), col("y")).as("d"))
    assert(df.head().isNullAt(0))
  }
}
