package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftexpr.VecDotExpr

/** Session extension point: registers the library's native expressions in
  * the SQL function registry, so `spark.sql("SELECT vec_dot(a, b) ...")`
  * works anywhere the DataFrame form does. Installed via
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession does).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotExpr].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot expects exactly 2 arguments")
        VecDotExpr(children.head, children(1))
      }))
  }
}
