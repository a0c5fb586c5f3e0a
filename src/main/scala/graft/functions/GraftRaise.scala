package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}

/** The abort raised by SQLite's `RAISE(ABORT, 'msg')` /
  * `RAISE(ROLLBACK, 'msg')` inside a trigger program (delegated
  * surface: pandasqlite.py:245-247 hands generated statements to
  * SQLite, validation triggers included). The message IS the error
  * SQLite reports (measured: sqlite3 surfaces IntegrityError with
  * exactly the raise message, nothing prepended).
  *
  * Thrown from executor tasks by [[GraftRaise]]; the statement-level
  * wrapper ([[graft.exec.Atomic]]) finds it in the failure's cause
  * chain, restores the pre-statement catalog bindings, and rethrows a
  * fresh driver-side instance carrying the same message.
  */
class GraftRaiseAbort(message: String) extends RuntimeException(message)

/** `graft_raise('msg')` — the execution form SQLite's trigger-program
  * `RAISE(ABORT|ROLLBACK, 'msg')` rewrites to at fire time
  * ([[graft.exec.Triggers]]). Evaluating it throws [[GraftRaiseAbort]];
  * the expression "returns" a never-produced nullable string so it
  * slots into any select list or CASE branch (SQLite's RAISE is an
  * expression too — `CASE WHEN bad THEN RAISE(ABORT,'x') END` must
  * abort only when the branch is taken, which lazy CASE evaluation
  * gives for free in both engines).
  *
  * foldable=false keeps ConstantFolding from detonating it at plan
  * time; rows it never reaches (false WHERE, untaken CASE branch)
  * never evaluate it, exactly SQLite's row-at-a-time semantics.
  */
case class GraftRaise(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_raise expects a string message, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def foldable: Boolean = false
  override def prettyName: String = "graft_raise"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    throw new GraftRaiseAbort(String.valueOf(child.eval(input)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val msg = child.genCode(ctx)
    // the `if (true)` guard keeps janino from rejecting statements the
    // caller emits after this expression as unreachable — the same
    // shape Spark's own RaiseError generates
    ExprCode(
      code = code"""
        ${msg.code}
        if (true) {
          throw new graft.functions.GraftRaiseAbort(String.valueOf(${msg.value}));
        }
        """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.TrueLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .defaultLiteral(dataType))
  }

  override protected def withNewChildInternal(newChild: Expression): GraftRaise =
    copy(child = newChild)
}
