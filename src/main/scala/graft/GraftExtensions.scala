package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{CmsEstimate, CmsMergeAll, FloatVecCosine, FloatVecDot, JaroWinkler}

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
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "jaro_winkler(a, b) takes exactly two arguments")
        JaroWinkler(children.head, children(1))
      },
    ))
    ext.injectFunction((
      new FunctionIdentifier("cms_merge_all"),
      new ExpressionInfo(classOf[CmsMergeAll].getName, "cms_merge_all"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "cms_merge_all(sketches) takes exactly one argument")
        CmsMergeAll(children.head)
      },
    ))
    ext.injectFunction((
      new FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cms_estimate(sketch, item) takes exactly two arguments")
        CmsEstimate(children.head, children(1))
      },
    ))
    // Column-composition functions surfaced to SQL: the builder wraps
    // child expressions as Columns, applies the library composition,
    // and unwraps — so SQL users get the exact same expression trees
    // as the Scala API (ColumnShim round-trip, no UDFs anywhere).
    def injectComposed(name: String, arity: Int)(build: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, name),
        (children: Seq[Expression]) => {
          require(children.size == arity, s"$name takes exactly $arity argument(s)")
          org.apache.spark.sql.graftshim.ColumnShim.expression(
            build(children.map(org.apache.spark.sql.graftshim.ColumnShim.column)))
        },
      ))
    import graft.functions.{TextFunctions => TF}
    injectComposed("graft_token_count", 1)(cs => TF.tokenCountWs(cs.head))
    injectComposed("graft_lang_id", 1)(cs => TF.langId(cs.head))
    injectComposed("graft_doc_fingerprint", 1)(cs => TF.prefixFingerprint(cs.head, 8))
    // quality score: stopwords are a corpus-specific choice, so SQL
    // users pass them too — graft_quality_score(text, array('le','la')).
    // The array must be a foldable literal (evaluated once at plan
    // time); a 1-arg form with the conventional English closed-class
    // list is kept for convenience.
    val defaultStops = Seq("the", "a", "of", "and", "to", "in", "is")
    ext.injectFunction((
      new FunctionIdentifier("graft_quality_score"),
      new ExpressionInfo(getClass.getName, "graft_quality_score"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          "graft_quality_score(text[, stopwords_array]) takes 1 or 2 arguments")
        val stops = if (children.size == 1) defaultStops
        else {
          val e = children(1)
          require(e.foldable, "stopwords must be a literal array")
          e.eval() match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData =>
              a.toObjectArray(org.apache.spark.sql.types.StringType).toSeq.map(_.toString)
            case other => throw new IllegalArgumentException(
              s"stopwords must be an array of strings, got $other")
          }
        }
        org.apache.spark.sql.graftshim.ColumnShim.expression(
          TF.qualityScore(
            org.apache.spark.sql.graftshim.ColumnShim.column(children.head), stops))
      },
    ))
  }
}
