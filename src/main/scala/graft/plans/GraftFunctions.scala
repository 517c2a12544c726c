package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-name registry for graft functions (populated as functions land). */
object GraftFunctions {
  type FunctionDescription = (FunctionIdentifier, ExpressionInfo, FunctionBuilder)

  def registry: Seq[FunctionDescription] = Seq.empty
}
