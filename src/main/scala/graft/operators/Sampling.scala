package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixing: deterministic per-stratum token-budget sampling.
  *
  * Training-data pipelines rarely take a corpus whole — they take "N
  * tokens of web, M of books, K of code" from it, and the draw must be
  * (a) unbiased w.r.t. storage order, (b) exactly reproducible across
  * reruns and engines, and (c) order-stable under corpus APPENDS: a
  * doc's place in the per-stratum order is a pure function of its id,
  * so appending data can only advance the budget frontier past docs —
  * never reshuffle the draw — and every doc kept from the combined
  * corpus that existed before the append was also kept before
  * (kept(C∪D) ∩ C ⊆ kept(C), spec-pinned). The reference
  * engine has no sampling surface; this extends the LLM-pipeline layer
  * the same way splitAssign does, and uses the same engine-portable
  * hash (first 8 hex chars of md5) so an external system — or the
  * DuckDB oracle — can replicate the draw byte-for-byte.
  *
  * Scale shape: one hash-shuffle by stratum + a per-stratum window
  * cumulative sum. The per-stratum SORT is the scale cost — inherent
  * to an exact budget cut (the budget is a global property of the
  * stratum). At extreme stratum sizes the standard two-pass
  * refinement applies: estimate the hash cutoff from a sample, filter
  * to the frontier neighborhood, and sort only that sliver; the
  * exact operator here is the correctness anchor either way.
  */
object Sampling {

  /** Salted engine-portable order key (DuckDB:
    * `('0x' || substr(md5(salt || id::VARCHAR), 1, 8))::BIGINT`). */
  def orderHash(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))
      .cast("binary")), 1, 8), 16, 10).cast("bigint")

  /** Keep, per stratum, the hash-ordered prefix of documents whose
    * running token total stays within that stratum's budget (strict:
    * the doc that would cross the budget is dropped). Strata absent
    * from `budgets` are dropped entirely — the mix is an explicit
    * contract. Output: input columns + `__cum` (the running total,
    * budget-inclusive) for auditability. */
  def byTokenBudget(df: DataFrame, idCol: String, stratumCol: String,
                    tokensCol: String, budgets: Map[String, Long],
                    salt: String = "graft"): DataFrame = {
    require(budgets.nonEmpty, "byTokenBudget needs at least one stratum budget")
    val sp = df.sparkSession
    import sp.implicits._
    val b = broadcast(budgets.toSeq.toDF(stratumCol, "__budget"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("__h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__h", orderHash(col(idCol), salt))
      .join(b, stratumCol)
      .withColumn("__cum", sum(col(tokensCol)).over(w))
      .where(col("__cum") <= col("__budget"))
      .drop("__h", "__budget")
  }
}
