package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Test-set decontamination: flag training documents that share any
  * token n-gram with an evaluation corpus — the overlap check every
  * LLM pretraining pipeline runs so benchmark answers don't leak into
  * the training set (the GPT-3-style "13-gram decontamination"; here n
  * is a parameter because fixture documents are short).
  *
  * 100 TB shape: the asymmetry IS the design. Eval corpora are tiny
  * (thousands of documents) while the train side is the whole corpus,
  * so the eval side's distinct shingle set is collected into a
  * broadcast and the train side is ONE scan pass — explode per-doc
  * distinct shingles, hash-join against the broadcast, count hits per
  * doc. No train-side shuffle of text or shingles ever happens: a
  * document's shingles sit in its own scan task, so the partial
  * aggregation collapses them to at most one (doc, count) row per
  * partition before the only exchange, whose volume is bounded by the
  * number of CONTAMINATED docs, not the corpus. Callers anti-join the
  * result against the corpus to drop (or quarantine) flagged docs.
  */
object Decontaminate {

  /** Per-train-doc count of distinct n-gram shingles that appear
    * anywhere in the eval corpus. Shingles are lowercased whitespace
    * token n-grams (the [[Dedup]] shingle domain). Docs with zero
    * overlap are ABSENT — left-join + coalesce(0) to label a full
    * corpus. */
  def overlapCounts(train: DataFrame, evalDocs: DataFrame,
                    idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val sh = udf((text: String) => Dedup.shingleSet(text, n))
    val evalSh = evalDocs
      .select(explode(sh(col(textCol))).as("shingle")).distinct()
    train
      .select(col(idCol), explode(sh(col(textCol))).as("shingle"))
      .join(broadcast(evalSh), "shingle")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hit"))
  }
}
