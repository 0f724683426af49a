package graft.ticks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** NBBO consolidation — the national-best-bid/offer tape from per-venue
  * quote streams: at every quote event, forward-fill each venue's latest
  * bid/ask (last-non-null over the symbol's timeline) and take the best
  * across venues. greatest/least skip absent venues (null until a
  * venue's first quote), and a locked/crossed flag surfaces bid ≥ ask
  * states — the standard tape-quality check.
  *
  * Venue count is a small fixed constant (real consolidated tapes have
  * ~16 exchanges), so venues pivot to columns and the whole operator is
  * one symbol-keyed ordered window — partition-parallel per symbol, no
  * joins, no state machine.
  */
object Nbbo {

  /** @param quotes (symCol, orderCols…, venueCol ∈ [0, nVenues), bidCol,
    *               askCol); `orderCols` must be a TOTAL order per symbol
    * @return one row per quote event with (nbbo_bid, nbbo_ask, locked)
    */
  def consolidate(quotes: DataFrame, symCol: String, orderCols: Seq[String],
      venueCol: String, bidCol: String, askCol: String,
      nVenues: Int): DataFrame = {
    require(nVenues >= 1 && nVenues <= 64, "venue count is a small constant")
    val w = W.partitionBy(col(symCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val withVenues = (0 until nVenues).foldLeft(quotes) { (df, v) =>
      df.withColumn(s"__b$v",
          last(when(col(venueCol) === v, col(bidCol)), ignoreNulls = true).over(w))
        .withColumn(s"__a$v",
          last(when(col(venueCol) === v, col(askCol)), ignoreNulls = true).over(w))
    }
    val bids = (0 until nVenues).map(v => col(s"__b$v"))
    val asks = (0 until nVenues).map(v => col(s"__a$v"))
    val out = withVenues
      .withColumn("nbbo_bid", greatest(bids: _*))
      .withColumn("nbbo_ask", least(asks: _*))
      .withColumn("locked",
        col("nbbo_bid").isNotNull && col("nbbo_ask").isNotNull &&
          col("nbbo_bid") >= col("nbbo_ask"))
    (0 until nVenues).foldLeft(out)((df, v) => df.drop(s"__b$v", s"__a$v"))
  }
}
