package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, SimHash64}

/** Catalyst extension point: register the engine's native expressions at
  * session build time so plain SQL can use them —
  *
  *   spark.sql.extensions=graft.spark.GraftExtensions
  *   SELECT simhash64(text), cosine_ff(a.embedding, b.embedding) ...
  *
  * (The Column-level wrappers in graft.functions.GraftFunctions self-register
  * lazily for programmatic use; this class is the spark-submit path.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("cosine_ff"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_ff"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))
    ))
  }
}
