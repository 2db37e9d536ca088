package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-shingle kernel. Semantically identical to the
  * composed built-in form (lower/trim/split + transform(sequence)/slice/
  * concat_ws + array_distinct) but evaluated in one compiled call per row
  * instead of interpreting higher-order lambdas per shingle — shingling
  * 5k docs dropped ~6s -> ~0.3s, and it feeds every text-dedup operator.
  *
  * Normalization contract (must stay aligned with the DuckDB oracle SQL
  * and TextFunctions.tokens): lowercase, trim ASCII spaces, split on
  * \s+, drop empty tokens; shingle = n consecutive tokens joined by a
  * single space; result distinct in first-occurrence order; fewer than n
  * tokens -> empty array.
  */
object TextKernels {
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    if (s == null) return null
    val toks = s.toString.toLowerCase(java.util.Locale.ROOT)
      .trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val sb = new java.lang.StringBuilder()
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextKernels.wordShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object TextExprs {
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
