package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff / CDC for corpus refreshes: a recurring ingest
  * (recrawl, re-export) produces a new snapshot, and the pipeline
  * should re-process only what moved — added / removed / changed keys —
  * not re-run dedup + quality + tokenization over 100 TB of unchanged
  * rows. One full-outer shuffle on the key with ONLY (key, fingerprint)
  * rows in flight (fingerprints collapse arbitrary payload width to 32
  * bytes upstream of the shuffle); unchanged keys are filtered before
  * anything downstream sees them. Reference analog: the scraper
  * re-emits full snapshots every 5 s (`scraper.py` poll loop) and
  * diffing is left to consumers — this is that consumer stage, done
  * engine-side.
  */
object DiffOps {

  /** @return (keyCol, status) — status ∈ added | removed | changed;
    *         unchanged keys are dropped
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCol: String, fpCol: String): DataFrame = {
    val o = oldDf.select(col(keyCol).as("k"), col(fpCol).as("fp_old"))
    val n = newDf.select(col(keyCol).as("k"), col(fpCol).as("fp_new"))
    o.join(n, Seq("k"), "full_outer")
      .filter(col("fp_old").isNull || col("fp_new").isNull ||
        col("fp_old") =!= col("fp_new"))
      .select(col("k").as(keyCol),
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .otherwise(lit("changed")).as("status"))
  }
}
