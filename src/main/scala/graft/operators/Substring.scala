package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Suffix-sort exact substring dedup — the deduplicate-text-datasets
  * shape: find every MAXIMAL token span of length >= [[MinRepeatTokens]]
  * that occurs more than once anywhere in the corpus (cross-doc or
  * within-doc), reported per document as mergeable coverage intervals.
  * This is the operator [[Corpus.segments]] (fixed non-overlapping
  * word-8 segments) approximates: a repeated span that STRADDLES a
  * segment boundary never matches whole segments, but always contains
  * a full L-token window, which this operator catches at any offset.
  *
  * Distributed shape (the suffix-array construction, specialised to a
  * detection threshold): a repeat of length >= L exists at position p
  * iff the suffix starting at p shares an LCP >= L with SOME other
  * suffix — and since LCP >= L only inspects the first L tokens, each
  * suffix is fully represented by its first-L-tokens key (suffixes
  * shorter than L cannot start a qualifying repeat and are dropped).
  * The plan is therefore:
  *
  *  1. positional L-gram keys (one window-lead pass per doc — the
  *     [[Dedup.ngramStrings]] shape with positions kept, hashed to
  *     8-byte xxhash64 keys so the sort never carries strings);
  *  2. ONE range exchange on the key + in-partition sort — the
  *     distributed suffix sort. (doc_id, pos) ride along the sorted
  *     rows, so no join-back is ever needed — this is why sort+scan
  *     beats group+join at scale: two hash shuffles and a payload
  *     join-back collapse into one range shuffle;
  *  3. a streaming per-partition adjacent-equality scan (LCP >= L
  *     between neighbouring suffixes == key equality), O(1) memory,
  *     with a BOUNDARY HANDOFF: each partition's first/last key is
  *     collected (P rows), broadcast, and consulted for the edge rows,
  *     so an equal-key block straddling any number of partition
  *     boundaries is still detected (spec-proven on handcrafted
  *     partitions);
  *  4. per-doc interval merge of covered windows (gaps-and-islands
  *     over one doc_id window) into maximal spans.
  *
  * 64-bit key-collision odds are the [[Dedup.shingleKeys]] argument:
  * ~n²/2⁶⁴ is negligible and any false merge would hash-mismatch the
  * string-keyed oracle.
  */
object Substring {

  /** Detection threshold L: a span must repeat at >= L tokens to be
    * reported, and two repeats merge when their covered windows are
    * overlapping or adjacent. Production corpora use 50 (the
    * deduplicate-text-datasets convention); 20 here because the
    * synthetic docs cap at ~100 tokens (at 50 the test corpora still
    * have hits, but the boundary-straddling cases thin out).
    */
  private[graft] val MinRepeatTokens = 20

  /** Positional L-grams: (doc_id, pos [1-based], h = xxhash64 of the
    * space-joined window). Window-lead construction (split once,
    * each token read once per offset) — the profiled-fast shape from
    * [[Dedup.ngramStrings]]; docs shorter than `n` contribute nothing.
    */
  private[operators] def positionalGrams(s: SparkSession, d: String, n: Int): DataFrame = {
    val wspec = Window.partitionBy("doc_id").orderBy("pos0")
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "w")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        concat_ws(" ", col("w") +: (1 until n).map(k => lead("w", k).over(wspec)): _*).as("g0"),
        lead("w", n - 1).over(wspec).as("guard"))
      .filter(col("guard").isNotNull)
      .select(col("doc_id"), col("pos"), xxhash64(col("g0")).as("h"))
  }

  /** The adjacent-equality scan over the range-sorted key stream:
    * emits (doc_id, pos) for every row whose key equals its global
    * predecessor's or successor's. Partition-local and streaming
    * (O(1) memory per partition); the first/last key of every
    * partition is pre-collected (P rows to the driver) and broadcast
    * so edge rows see their cross-partition neighbours.
    *
    * `sorted` must be globally sorted by `h` across partitions in
    * partition-index order (repartitionByRange + sortWithinPartitions
    * provides exactly that); empty partitions are skipped when
    * resolving a row's cross-boundary neighbour.
    */
  private[graft] def coveredPositions(sorted: DataFrame): DataFrame = {
    val spark = sorted.sparkSession
    import spark.implicits._
    val rdd = sorted.select("h", "doc_id", "pos").as[(Long, Long, Long)].rdd
    val bounds = rdd.mapPartitionsWithIndex { (i, it) =>
      if (it.hasNext) {
        val first = it.next()._1
        var last = first
        while (it.hasNext) last = it.next()._1
        Iterator((i, (first, last)))
      } else Iterator.empty
    }.collect().toMap
    val bc = spark.sparkContext.broadcast(bounds)
    val covered = rdd.mapPartitionsWithIndex { (i, it) =>
      val all = bc.value
      val nextFirst = all.collect { case (j, (f, _)) if j > i => (j, f) }
        .minByOption(_._1).map(_._2)
      var prevH = all.collect { case (j, (_, l)) if j < i => (j, l) }
        .maxByOption(_._1).map(_._2)
      val buf = it.buffered
      new scala.collection.AbstractIterator[(Long, Long)] {
        private var nxt: (Long, Long) = _
        private var has = false
        private def compute(): Unit =
          while (!has && buf.hasNext) {
            val (h, doc, pos) = buf.next()
            val nextH = if (buf.hasNext) Some(buf.head._1) else nextFirst
            if (prevH.contains(h) || nextH.contains(h)) { nxt = (doc, pos); has = true }
            prevH = Some(h)
          }
        def hasNext: Boolean = { compute(); has }
        def next(): (Long, Long) = { compute(); has = false; nxt }
      }
    }
    covered.toDF("doc_id", "pos")
  }

  /** Gaps-and-islands merge of covered L-token windows into maximal
    * spans: windows starting <= L apart overlap or touch, so a break
    * opens only when the gap exceeds L. All-integer arithmetic —
    * bit-identical cross-engine.
    */
  private[operators] def mergeSpans(cov: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    cov
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(w) <= n, lit(0)).otherwise(lit(1)))
      .withColumn("island", sum("brk").over(w))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).as("span_start"), max(col("pos")).as("max_pos"))
      .select(col("doc_id"), col("span_start"),
        (col("max_pos") + n - 1).as("span_end"),
        (col("max_pos") + n - col("span_start")).as("n_tokens"))
  }

  val substringDedup = QueryDef(
    "dedup_substring",
    (s, d) => {
      val n = MinRepeatTokens
      val sorted = positionalGrams(s, d, n)
        // the distributed suffix sort: one range exchange, payload
        // rides the rows. Secondary keys make the order total, hence
        // deterministic; equal-h runs stay contiguous either way.
        .repartitionByRange(col("h"), col("doc_id"), col("pos"))
        .sortWithinPartitions("h", "doc_id", "pos")
        // consumed twice (bounds pass + scan pass) — materialize once
        .localCheckpoint(true)
      mergeSpans(coveredPositions(sorted), n)
    },
    Some {
      val n = MinRepeatTokens
      s"""WITH ${positionalGramsSql(n)},
    cov AS (
      SELECT doc_id, pos FROM g
      QUALIFY COUNT(*) OVER (PARTITION BY gram) >= 2),
    ${mergeSpansSql(n)}"""
    })

  /** SQL mirror of [[positionalGrams]] (relation `g(doc_id, pos,
    * gram)`) — shared with Contamination.decontaminateSubstring's
    * oracle, as the Scala side already shares [[positionalGrams]].
    */
  private[operators] def positionalGramsSql(n: Int): String =
    s"""g AS (
      SELECT doc_id, i AS pos,
             array_to_string(string_split(text, ' ')[i:i+${n - 1}], ' ') AS gram
      FROM documents, UNNEST(range(1, len(string_split(text, ' ')) - $n + 2)) AS t(i))"""

  /** SQL mirror of [[mergeSpans]]: the gaps-and-islands merge over a
    * relation `cov(doc_id, pos)` — ONE spelling of the island
    * arithmetic so the two span-producing oracles cannot drift.
    */
  private[operators] def mergeSpansSql(n: Int): String =
    s"""m AS (
      SELECT doc_id, pos,
             CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $n
                  THEN 0 ELSE 1 END AS brk
      FROM cov),
    isl AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM m)
    SELECT doc_id, MIN(pos) AS span_start,
           MAX(pos) + $n - 1 AS span_end,
           MAX(pos) + $n - MIN(pos) AS n_tokens
    FROM isl GROUP BY doc_id, island
    ORDER BY doc_id, span_start"""

  val defs: Seq[QueryDef] = Seq(substringDedup)
}
