package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared in-plan contracts for the per-document ops. */
private[llm] object Guards {

  /** One row per DISTINCT id, failing LOUDLY in-plan when `idCol` is
    * duplicated — the packSequences/overlapFlags contract: duplicate
    * ids would pool their units upstream and fan out the join back,
    * silently corrupting per-document results. Kept in one place so
    * the message and null/count semantics cannot drift between the
    * ops that share it (`Decontamination.overlapFlags`,
    * [[Decontamination.overlapFlagsBloom]], [[UnigramLM.raritySignals]]). */
  def uniqueIdBase(df: DataFrame, idCol: String, opName: String): DataFrame =
    df.groupBy(col(idCol)).agg(count(lit(1)).as("__dup"))
      .select(when(col("__dup") > 1L, raise_error(concat(
          lit(s"$opName: duplicate $idCol: "), col(idCol).cast("string"))))
        .otherwise(col(idCol)).as(idCol))
}
