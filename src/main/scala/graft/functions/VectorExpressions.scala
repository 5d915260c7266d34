package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expressions for the vector hot path (SURVEY.md §4.3's
  * promotion rule: UDF -> codegen Expression when the bench demands).
  * `vec_dot`/`vec_norm` participate in whole-stage codegen — the
  * generated loop reads doubles straight out of `UnsafeArrayData` with no
  * boxing, no lambda dispatch, and no UDF serialization boundary; the
  * interpreted `eval` keeps the identical left-to-right accumulation so
  * results are bit-equal to the DuckDB oracle's list_reduce fold either
  * way. Registered through `SparkSessionExtensions` (GraftExtensions) so
  * `expr("vec_dot(a, b)")` and SQL both resolve. */
object VectorExpressions {

  trait DoubleArrayInput { self: Expression =>
    protected def checkArray(dt: DataType, side: String): TypeCheckResult = dt match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$side must be array<double>, got ${other.catalogString}")
    }
  }

  /** Dot product of two double arrays. NULL input or a NULL element
    * yields NULL (built-in SQL semantics — a NULL element must not read
    * as 0.0); lengths must match — mismatch throws, surfacing data bugs
    * rather than silently truncating. */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression with DoubleArrayInput {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // element-NULL propagates even on non-null inputs
    override def checkInputDataTypes(): TypeCheckResult =
      Seq(checkArray(left.dataType, "left"), checkArray(right.dataType, "right"))
        .find(!_.isSuccess).getOrElse(TypeCheckResult.TypeCheckSuccess)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      require(x.numElements() == y.numElements(),
        s"vec_dot: length mismatch ${x.numElements()} vs ${y.numElements()}")
      var s = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i); i += 1
      }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |final int $n = $x.numElements();
           |if ($n != $y.numElements()) {
           |  throw new IllegalArgumentException("vec_dot: length mismatch");
           |}
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  $s += $x.getDouble($i) * $y.getDouble($i);
           |}
           |if (!${ev.isNull}) { ${ev.value} = $s; }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
      copy(left = l, right = r)
    override def prettyName: String = "vec_dot"
  }

  /** L2 norm of a double array. NULL input or a NULL element yields NULL. */
  case class VecNorm(child: Expression) extends UnaryExpression with DoubleArrayInput {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // element-NULL propagates even on non-null input
    override def checkInputDataTypes(): TypeCheckResult = checkArray(child.dataType, "input")

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var s = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        if (x.isNullAt(i)) return null
        val v = x.getDouble(i); s += v * v; i += 1
      }
      math.sqrt(s)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val v = ctx.freshName("v")
        s"""
           |final int $n = $x.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  final double $v = $x.getDouble($i);
           |  $s += $v * $v;
           |}
           |if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($s); }
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): VecNorm = copy(child = c)
    override def prettyName: String = "vec_norm"
  }

  import org.apache.spark.sql.{Column, GraftColumnBridge => B}

  /** Column-API wrappers (no session registration needed). */
  def vec_dot(a: Column, b: Column): Column =
    B.column(VecDot(B.expression(a), B.expression(b)))
  def vec_norm(a: Column): Column =
    B.column(VecNorm(B.expression(a)))

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (cs: Seq[Expression]) => { require(cs.size == 2, "vec_dot(a, b)"); VecDot(cs(0), cs(1)) }),
    (FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNorm].getName, "vec_norm"),
      (cs: Seq[Expression]) => { require(cs.size == 1, "vec_norm(a)"); VecNorm(cs(0)) }))
}

/** Session extension installing the vector expressions AND the
  * store-lifecycle SQL statements (OPTIMIZE / VACUUM / UPKEEP /
  * DELETE over graft stores — [[graft.sql.GraftSqlCommands]]):
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    VectorExpressions.registrations.foreach(ext.injectFunction)
    ext.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
  }
}
