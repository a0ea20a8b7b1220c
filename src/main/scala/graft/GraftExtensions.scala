package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{FloatVecCosine, FloatVecDot}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions so `spark.sql("SELECT vec_cosine(a,b)")`
  * works — the public, spark-submit-friendly integration path
  * (`--conf spark.sql.extensions=graft.GraftExtensions`), alongside the
  * Column API in [[graft.functions.VectorFunctions]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vec_dot(a, b) takes exactly two arguments")
        FloatVecDot(children.head, children(1))
      },
    ))
    ext.injectFunction((
      new FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[FloatVecCosine].getName, "vec_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vec_cosine(a, b) takes exactly two arguments")
        FloatVecCosine(children.head, children(1))
      },
    ))
  }
}
