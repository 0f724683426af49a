package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate removal — the CCNet/RefinedWeb curation pass
  * that strips segments (pseudo-paragraphs) occurring verbatim across many
  * documents (site footers, license banners, navigation chrome) while
  * leaving document-unique content intact.
  *
  * The corpus granularity is the aligned `segWords`-token segment: every
  * document is chunked into consecutive fixed-width token windows, segment
  * text is counted across DISTINCT documents, and segments at or above the
  * document-frequency threshold are dropped from every document before
  * reassembly in original order.
  *
  * Scale posture: segmentation is a narrow per-row map over the token
  * array (higher-order functions, no explode until the segment relation,
  * which is |tokens|/segWords rows); the document-frequency count is one
  * hash aggregation keyed by segment text; membership is one equi-join on
  * the same key (AQE-broadcastable when the frequent set is small, plain
  * shuffle join otherwise). Nothing is collected, nothing is quadratic:
  * at 100 TB this is two shuffles over the segment relation.
  */
object Boilerplate {

  /** Consecutive `segWords`-token segments of a document as an ordered
    * array of segment strings (last segment may be short). Pure Column
    * expression over [[TextFunctions.tokens]].
    */
  def segments(text: Column, segWords: Int): Column = {
    require(segWords > 0, "segWords must be positive")
    val toks = TextFunctions.tokens(text)
    transform(
      // Spark `/` is double division — floor+cast for the integer grid
      sequence(lit(0), floor((size(toks) - 1) / segWords).cast("int")),
      i => array_join(slice(toks, i * segWords + 1, lit(segWords)), " "))
  }

  /** The (id, seg_idx, seg) segment relation for a corpus. Spread by id
    * BEFORE the tokenize/segment explode — a few-file corpus scan would
    * serialize the segmentation onto one core, and the id hash
    * pre-partitions for [[removeFrequentSegments]]'s reassembly groupBy.
    */
  private def segmentRelation(docs: DataFrame, textCol: String, idCol: String,
      segWords: Int): DataFrame =
    graft.operators.Parallelism.spreadBy(docs, col(idCol))
      .select(col(idCol).as("id"),
        posexplode(segments(col(textCol), segWords)).as(Seq("seg_idx", "seg")))

  /** Segments appearing in at least `minDocs` DISTINCT documents, with
    * their document frequency: the corpus boilerplate dictionary.
    */
  def frequentSegments(docs: DataFrame, textCol: String, idCol: String,
      segWords: Int = 10, minDocs: Int = 2): DataFrame =
    segmentRelation(docs, textCol, idCol, segWords)
      .groupBy(col("seg"))
      .agg(countDistinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** Remove corpus-frequent segments from every document. Returns one row
    * per document: (id, n_segments, n_removed, clean_text) with the
    * surviving segments rejoined in original order.
    */
  def removeFrequentSegments(docs: DataFrame, textCol: String, idCol: String,
      segWords: Int = 10, minDocs: Int = 2): DataFrame = {
    // ONE tokenize/segment pass feeds both the frequency count and the
    // reassembly join (previously the relation was derived twice — two
    // full corpus tokenizations); blocks are ContextCleaner-reclaimed.
    val segs = graft.operators.Materialize.once(
      segmentRelation(docs, textCol, idCol, segWords))
    val freq = segs
      .groupBy(col("seg"))
      .agg(countDistinct(col("id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("seg"), lit(1).as("__dup"))
    segs.join(freq, Seq("seg"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("__dup").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__dup").isNull, struct(col("seg_idx"), col("seg"))))),
            s => s.getField("seg")),
          " ").as("clean_text"))
  }
}
