package graft

import org.apache.spark.sql.{Column, DataFrame}

package object expr {
  /** Compile an SSIS expression against a DataFrame's schema. */
  def ssis(df: DataFrame, expression: String, vars: Map[String, Any] = Map.empty): Column =
    Compiler.compile(expression, df.schema, vars)
}
