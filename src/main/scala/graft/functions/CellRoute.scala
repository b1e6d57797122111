package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Static kernel behind [[CellRoute]] — a plain method so the generated
  * code is one call site inside the WholeStageCodegen span (the
  * [[CosineKernels]] pattern). */
object CellRouteKernel {

  /** Initial best-skey sentinel — matches the interpreted fold's
    * (`ChunkRouter.probeSql`) named_struct seed, so the two formulations
    * agree even on a panel whose every skey is pathological. */
  val skeyFloor: Long = -4611686018427387903L

  /** Nearest spherical cell of a µ-quantized vector against a
    * (cluster, cv, nc) panel: argmax over cells of
    * sign(dot) · (dot² · scale / nc), ties to the LOWEST cell id (strict
    * `>` over the cluster-ascending panel — the oracle's
    * `ORDER BY skey DESC, cluster ASC`). dot² is non-negative, so Java's
    * truncating `/` equals DuckDB's flooring `//` here. */
  def route(q: ArrayData, cents: ArrayData, scale: Long): Long = {
    val k = cents.numElements()
    var best = skeyFloor
    var bestC = -1L
    var ci = 0
    while (ci < k) {
      val cell = cents.getStruct(ci, 3)
      val cv = cell.getArray(1)
      val nc = cell.getLong(2)
      val n = math.min(q.numElements(), cv.numElements())
      var dot = 0L
      var i = 0
      while (i < n) {
        dot += q.getLong(i) * cv.getLong(i)
        i += 1
      }
      val sk = (if (dot >= 0L) 1L else -1L) * ((dot * dot * scale) / nc)
      if (sk > best) {
        best = sk
        bestC = cell.getLong(0)
      }
      ci += 1
    }
    bestC
  }
}

/** `cell_route(q, cents, scale)`: nearest learned spherical cell of a
  * BIGINT vector against a broadcast centroid panel — the corpus-side
  * assignment of [[graft.ops.ChunkRouter]] as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Why an Expression and not a higher-order fold or literal-spliced flat
  * SQL (both were measured, BASELINE.md round 18): the interpreted
  * `aggregate(transform(...))` fold pays closure dispatch per cell per
  * row (~25 s to route the ×10 chunk corpus); splicing the panel's
  * coordinates into the plan as literals is codegen-fast per ROW but
  * recompiles a k·d-literal expression tree per PLAN — ~2 s per Lloyd
  * round and ~190 s for the chained route-churn query, pure
  * plan-compilation cost. This kernel keeps the panel as DATA (one
  * broadcast row), so the expression tree is stable — compiled once,
  * cached by codegen — and evaluation is a fused Java loop.
  *
  * Numeric contract: identical integer arithmetic to the interpreted
  * probe text ([[graft.ops.ChunkRouter]] `probeSql`, whose top-1 equals
  * this route — `RouterEpochSpec` pins the equivalence) and to the
  * DuckDB oracle's windowed argmax. */
case class CellRoute(left: Expression, right: Expression, scale: Long)
  extends BinaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cell_route"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == LongType &&
      right.dataType.isInstanceOf[ArrayType] &&
      right.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType]
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cell_route expects (array<bigint>, array<struct<cluster, cv, nc>>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(q: Any, cents: Any): Any =
    CellRouteKernel.route(
      q.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cents) => {
      s"${ev.value} = graft.functions.CellRouteKernel.route($q, $cents, ${scale}L);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellRoute =
    copy(left = newLeft, right = newRight)
}
