package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/** The two compiled kernels behind Dedup.duplicateSpans/cutSpans —
  * each replaces a composed built-in form that was O(n²) per document
  * (per-position/per-segment substr head re-scans, the SCALE.md
  * round-15 quadratic class). These specs pin EXACT equivalence to the
  * composed forms on adversarial unicode, so the fast path can never
  * drift from the semantics the DuckDB oracles replay. */
class GramSpanKernelsSpec extends SparkSpec {

  test("gramHashes == composed unhex(md5(substr)) form, code-point positions") {
    val s = spark
    import s.implicits._
    val rocket = new String(Character.toChars(0x1F680))
    val texts = Seq(
      "abcdefghij", "aaaa", "ab", "a", "", s"x${rocket}y${rocket}z",
      "中文字符测试串", "tab\there\nandmore", rocket * 5)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val n = 3
    // g is BINARY (the shuffle-key form); compare via lower(hex(g))
    val fast = df.select(col("id"),
        TextExprs.gramHashes(col("t"), n).as(Seq("pos", "g")))
      .select(col("id"), col("pos"), lower(hex(col("g"))).as("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val slow = df
      .where(length(col("t")) >= n)
      .withColumn("pos",
        explode(sequence(lit(1L), (length(col("t")) - (n - 1)).cast("long"))))
      .select(col("id"), col("pos"),
        md5(col("t").substr(col("pos").cast("int"), lit(n)).cast("binary"))
          .as("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(fast == slow)
    // null text: no rows, no NPE
    assert(Seq((1L, null.asInstanceOf[String])).toDF("id", "t")
      .select(TextExprs.gramHashes(col("t"), n)).count() == 0L)
  }

  test("cutSpans kernel: code-point cuts, edges, loud contract violations") {
    def cut(text: String, spans: (Long, Long)*): String = {
      val arr = new GenericArrayData(spans.map { case (a, b) =>
        new GenericInternalRow(Array[Any](a, b))
      }.toArray[Any])
      val r = TextKernels.cutSpans(UTF8String.fromString(text), arr)
      if (r == null) null else r.toString
    }
    val rocket = new String(Character.toChars(0x1F680))
    // positions count CODE POINTS: cutting [2,3] of a🚀b🚀c removes 🚀b
    assert(cut(s"a${rocket}b${rocket}c", (2L, 3L)) == s"a${rocket}c")
    // head, tail, whole, empty spans list
    assert(cut("abcdef", (1L, 2L)) == "cdef")
    assert(cut("abcdef", (5L, 6L)) == "abcd")
    assert(cut("abcdef", (1L, 6L)) == "")
    assert(cut("abcdef") == "abcdef")
    // adjacent-but-disjoint spans both cut
    assert(cut("abcdef", (1L, 2L), (3L, 4L)) == "ef")
    // violations fail loudly instead of silently mis-cutting
    intercept[IllegalArgumentException](cut("abcdef", (3L, 4L), (1L, 2L)))
    intercept[IllegalArgumentException](cut("abcdef", (1L, 2L), (2L, 3L)))
    intercept[IllegalArgumentException](cut("abc", (1L, 9L)))
    assert(TextKernels.cutSpans(null, new GenericArrayData(Array.empty[Any]))
      == null)
  }
}
