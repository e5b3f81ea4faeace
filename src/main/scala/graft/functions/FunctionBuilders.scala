package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** Shared helpers for SQL function builders. */
object FunctionBuilders {
  /** Extract a constant integer argument with a clear error — calling
    * eval(null) on an unresolved column reference would otherwise crash
    * analysis with an opaque UnsupportedOperationException. */
  def constInt(e: Expression, fnName: String, argName: String): Int = e match {
    case Literal(v: Number, _) => v.intValue()
    case other if other.foldable =>
      other.eval(null) match {
        case n: Number => n.intValue()
        case _ => throw new IllegalArgumentException(
          s"$fnName: $argName must be a constant integer")
      }
    case _ => throw new IllegalArgumentException(
      s"$fnName: $argName must be a constant integer, not a column")
  }
}
