package graft.fundamental

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Q4 derivation for duration concepts: an annual XBRL frame minus that
  * year's standalone Q1-Q3 frames (W7 — reference collection/fundamental.py:209-276).
  *
  * Semantics preserved:
  *  - rows missing start/end/filed/frame are dropped;
  *  - per (symbol, concept, frame) only the LATEST-filed datapoint survives
  *    (W6, fundamental.py:240-245); ties break on accn desc (deterministic
  *    stand-in for the reference's input-order keep-first);
  *  - frames containing Q1-Q4 pass through standalone;
  *  - an annual frame CY{y} yields a derived Q4 row only when Q1, Q2 and Q3
  *    picks all exist; value = FY - Q1 - Q2 - Q3, start = Q3.end + 1 day,
  *    other fields from the FY datapoint;
  *  - quarter pick preference (`_pick_frame`): exact `CY{y}Q{n}`, then
  *    `CY{y}Q{n}I`, then any frame starting with `CY{y}Q{n}` (smallest frame
  *    string as the deterministic fallback tiebreak).
  *
  * Input long frame: (symbol, concept, value, start, end, filed, frame, ...).
  */
object Q4Derivation {

  def normalize(raw: DataFrame): DataFrame = {
    val valid = raw.filter(
      col("start").isNotNull && col("end").isNotNull &&
        col("filed").isNotNull && col("frame").isNotNull)
      .withColumn("frame_year", substring(col("frame"), 3, 4).cast("int"))

    // Latest-filed wins per (symbol, concept, frame).
    val latestW = Window.partitionBy(col("symbol"), col("concept"), col("frame"))
      .orderBy(col("filed").desc, col("accn").desc)
    val latest = valid
      .withColumn("__rn", row_number().over(latestW))
      .filter(col("__rn") === 1)
      .drop("__rn")

    val qn = regexp_extract(col("frame"), "Q([1-4])", 1)
    val standalone = latest.filter(qn =!= "")
    val annual = latest.filter(qn === "")

    // Rank quarter candidates per _pick_frame preference and pick one per
    // (symbol, concept, frame_year, quarter).
    val pickRank = when(col("frame") === concat(lit("CY"), col("frame_year"), lit("Q"), col("__q")), 0)
      .when(col("frame") === concat(lit("CY"), col("frame_year"), lit("Q"), col("__q"), lit("I")), 1)
      .otherwise(2)
    val pickW = Window.partitionBy(col("symbol"), col("concept"), col("frame_year"), col("__q"))
      .orderBy(col("__rank"), col("frame"), col("accn"))
    val picked = standalone
      .withColumn("__q", regexp_extract(col("frame"), "Q([1-4])", 1).cast("int"))
      .filter(col("__q").isin(1, 2, 3))
      .withColumn("__rank", pickRank)
      .withColumn("__rn", row_number().over(pickW))
      .filter(col("__rn") === 1)

    val quarters = picked.groupBy(col("symbol"), col("concept"), col("frame_year"))
      .agg(
        sum(when(col("__q") === 1, col("value"))).as("q1_val"),
        sum(when(col("__q") === 2, col("value"))).as("q2_val"),
        sum(when(col("__q") === 3, col("value"))).as("q3_val"),
        max(when(col("__q") === 3, col("end"))).as("q3_end"),
        count_distinct(col("__q")).as("n_q"))
      .filter(col("n_q") === 3)

    val derivedQ4 = annual
      .join(quarters, Seq("symbol", "concept", "frame_year"), "inner")
      .withColumn("value", col("value") - col("q1_val") - col("q2_val") - col("q3_val"))
      .withColumn("start", date_add(col("q3_end"), 1))
      .select(annual.columns.map(col): _*)

    standalone.select(annual.columns.map(col): _*)
      .unionByName(derivedQ4)
      .drop("frame_year")
  }
}
