package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ⇄ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`, Spark 4's classic
  * backend). graft needs it for exactly two shapes: (a) an expression
  * whose constructor carries a driver-side artifact that cannot ride
  * through SQL text (t8's broadcast bigram model —
  * [[graft.functions.RareBigramStats]]); (b) an expression whose
  * LITERAL arguments are corpus-scaled (s12's trained quantizer —
  * K·64 float literals is megabytes of SQL text at probe scale,
  * re-parsed per invocation; the constructed catalyst Literal carries
  * the array directly). Every other native function registers a name
  * and goes through `expr(...)`; building these columns
  * programmatically instead of registering per-call closures keeps the
  * shared session FunctionRegistry immutable on the query path (two
  * threads planning t8 for different corpora on one session can no
  * longer interleave register/analyze and bind the wrong model).
  *
  * Lives under `org.apache.spark.sql` solely to satisfy the
  * `private[sql]` qualifier; contains no Spark code.
  */
object GraftColumns {
  /** Wrap a Catalyst expression as a user-facing Column (the inverse of
    * `Column.expr` from Spark 3; unresolved attributes inside `e` are
    * resolved by the normal analyzer pass of the consuming Dataset). */
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
