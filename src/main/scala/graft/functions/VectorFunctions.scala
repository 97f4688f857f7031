package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.GraftExpressions

/** User-facing vector functions backed by native codegen'd Catalyst
  * expressions (see org.apache.spark.sql.graft.GraftExpressions). */
object VectorFunctions {

  /** Cosine similarity of two `array<float>` columns, computed in Double
    * in a single fused loop. SQL name: `graft_cosine` (register via
    * GraftExtensions or Registry.install). */
  def cosineF(a: Column, b: Column): Column = GraftExpressions.cosineF(a, b)
}
