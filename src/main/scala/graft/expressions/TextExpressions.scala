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

/** Single-pass normalized-md5 kernel backing TextFunctions.fingerprint.
  * Byte-for-byte equal to the composed form
  * `md5(cast(trim(regexp_replace(lower(text), '\\s+', ' ')) as binary))`
  * it replaces (the DuckDB oracle reproduces that exact recipe), but in
  * one pass over the bytes instead of a full regex engine walk over
  * every document body:
  *  - lowercase via UTF8String.toLowerCase — the same call Spark's
  *    `lower()` makes, so Unicode behavior is identical by construction;
  *  - whitespace class is JAVA regex \s = [ \t\n\x0B\f\r] (ASCII-only,
  *    matching the regexp_replace it replaces — these bytes never occur
  *    inside UTF-8 multibyte sequences, so byte-level scanning is safe);
  *  - runs collapse to one 0x20; leading/trailing runs drop (the trim);
  *  - md5 hex, lowercase.
  */
object Md5Kernel {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  def normalizedMd5(s: UTF8String): UTF8String = {
    if (s == null) return null
    val bytes = s.toLowerCase.getBytes
    val buf = new Array[Byte](bytes.length)
    var i = 0
    var o = 0
    var pendingSpace = false
    while (i < bytes.length) {
      val b = bytes(i)
      val isWs = b == ' ' || b == '\t' || b == '\n' || b == 0x0b ||
        b == '\f' || b == '\r'
      if (isWs) { if (o > 0) pendingSpace = true }
      else {
        if (pendingSpace) { buf(o) = ' '; o += 1; pendingSpace = false }
        buf(o) = b
        o += 1
      }
      i += 1
    }
    val md = md5.get()
    md.reset()
    md.update(buf, 0, o)
    val digest = md.digest()
    val hex = new Array[Char](32)
    var k = 0
    while (k < 16) {
      hex(2 * k) = HexChars((digest(k) >> 4) & 0xf)
      hex(2 * k + 1) = HexChars(digest(k) & 0xf)
      k += 1
    }
    UTF8String.fromString(new String(hex))
  }
}

case class NormalizedMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalized_md5"

  override protected def nullSafeEval(input: Any): Any =
    Md5Kernel.normalizedMd5(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Md5Kernel.normalizedMd5($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizedMd5 =
    copy(child = newChild)
}

/** Per-document 64-bit SimHash over a token array in one kernel call:
  * for each token, Spark's own XXH64 (seed 42 — bit-identical to the
  * `xxhash64()` SQL function the composed form and DedupSpec's oracle
  * use), one vote pass over the 64 bits. Replaces the explode +
  * 64-conditional-sum aggregate: no row expansion, no shuffle — SimHash
  * becomes a projection. */
object SimHashKernel {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  def simhash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
        t.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) r |= (1L << b); b += 1 }
    r
  }
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.LongType
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHashKernel.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SimHashKernel.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object TextExprs {
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  def normalizedMd5(text: Column): Column =
    ColumnBridge.column(NormalizedMd5(ColumnBridge.expression(text)))

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(tokens)))
}
