package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** UNIGRAM-LM (SentencePiece-style) tokenizer training — the EM-based
  * alternative beside [[Bpe]]'s merge learning: a candidate piece vocab
  * is seeded from substring statistics, then bounded VITERBI-EM rounds
  * alternate (E) segment every word by the max-probability piece
  * decomposition and (M) re-estimate piece counts from the chosen
  * segmentations (+1 Laplace so the fixed vocab never zeroes out and
  * counts stay integers).
  *
  * Scale shape (mirrors [[Bpe]]): ONE corpus-scale pass builds the
  * (word, freq) histogram; everything after runs over the vocab-sized
  * histogram and a config-sized piece table (≤ [[TopMulti]] + alphabet
  * rows — collected to the driver per round, the same config-sized
  * discipline as Ann's centroids and Bpe's argmax row).
  *
  * Cross-engine exactness (the DuckDB oracle replays training verbatim):
  * all model state between rounds is INTEGER counts; the only doubles
  * are the per-piece scores cnt/T (one IEEE division both engines
  * perform identically) and the Viterbi products, which both engines
  * build with the SAME left-to-right DP tree — dp(j) = dp(j−l)·score —
  * so scores are bit-equal by induction and the argmax (ties broken
  * score DESC, piece-length DESC, piece ASC) picks identical boundaries.
  * Words are alphabetic and length-capped ([[MaxWordLen]]) so the DP
  * depth is bounded and '|' is a safe segmentation delimiter (the
  * [[Bpe]] framing trick).
  */
object Unigram {

  /** DP depth bound; longer words are excluded from training AND apply
    * (documented contract — the corpus max is 8, so nothing is lost). */
  val MaxWordLen = 12

  /** Candidate pieces are substrings up to this length. */
  val MaxPieceLen = 4

  /** Multi-char candidate vocab cap (all single chars are always kept so
    * every word stays segmentable). */
  val TopMulti = 200

  /** (word, freq) histogram of alphabetic words, length-capped. */
  def wordHistogram(docs: DataFrame, textCol: Column): DataFrame =
    Bpe.wordHistogram(docs, textCol)
      .filter(length(col("word")) <= MaxWordLen)

  /** Seed candidate vocab: every substring of length 1..[[MaxPieceLen]]
    * weighted by word frequency (overlapping occurrences all count, the
    * suffix-array-frequency seeding shape); all single chars kept, plus
    * the top [[TopMulti]] multi-char pieces by (weight DESC, piece ASC).
    * Returns (piece, len, cnt) — cnt is the seed count for EM round 1. */
  def seedPieces(words: DataFrame): DataFrame = {
    val subs = words
      .select(col("freq"), explode(expr(
        s"flatten(transform(sequence(1, length(word)), i -> " +
          s"transform(sequence(i, least(i + ${MaxPieceLen - 1}, " +
          s"length(word))), j -> substr(word, i, j - i + 1))))"))
        .as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    val singles = subs.filter(length(col("piece")) === 1)
    val multis = subs.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(TopMulti)
    singles.unionByName(multis)
      .select(col("piece"), length(col("piece")).as("len"), col("cnt"))
  }

  /** Viterbi segmentation of one word under piece scores: dp(j) = best
    * product over dp(j−l)·score(word[j−l..j]); ties prefer the LONGER
    * piece, then the lexicographically SMALLER one — the exact rule the
    * oracle's row_number(ORDER BY score DESC, len DESC, piece) replays.
    * Every single char is in the vocab, so every position is reachable. */
  private[operators] def segment(word: String,
      score: collection.Map[String, Double]): List[String] = {
    val n = word.length
    val dpScore = new Array[Double](n + 1)
    val dpSeg = new Array[List[String]](n + 1)
    dpScore(0) = 1.0
    dpSeg(0) = Nil
    var j = 1
    while (j <= n) {
      var best = -1.0
      var bestLen = -1
      var bestPiece: String = null
      var l = 1
      while (l <= math.min(MaxPieceLen, j)) {
        val p = word.substring(j - l, j)
        score.get(p) match {
          case Some(s) =>
            val cand = dpScore(j - l) * s
            if (cand > best ||
                (cand == best && (l > bestLen ||
                  (l == bestLen && (bestPiece == null || p < bestPiece)))))
              { best = cand; bestLen = l; bestPiece = p }
          case None => ()
        }
        l += 1
      }
      require(bestLen >= 1,
        s"unsegmentable position $j of '$word': vocab must contain every" +
          " single char of every word (seedPieces guarantees it)")
      dpScore(j) = best
      dpSeg(j) = bestPiece :: dpSeg(j - bestLen)
      j += 1
    }
    dpSeg(n).reverse
  }

  /** One E-step: segment every histogram word under scores cnt/T. The
    * piece table is COLLECTED (config-sized by construction) and the DP
    * runs in mapPartitions — per-word imperative work no Catalyst
    * expression expresses, over a vocab-sized input. Returns
    * (word, freq, seg) with seg = pieces joined by '|'. */
  def viterbiSeg(words: DataFrame, pieces: DataFrame): DataFrame = {
    val sp = words.sparkSession
    val rows = pieces.select(col("piece"), col("cnt")).collect()
    val t = rows.map(_.getLong(1)).sum.toDouble
    val score: Map[String, Double] =
      rows.map(r => r.getString(0) -> r.getLong(1).toDouble / t).toMap
    val b = sp.sparkContext.broadcast(score)
    import sp.implicits._
    words.select(col("word"), col("freq")).as[(String, Long)]
      .mapPartitions { it =>
        val sc = b.value
        it.map { case (w, f) => (w, f, segment(w, sc).mkString("|")) }
      }.toDF("word", "freq", "seg")
  }

  /** Piece usage from an E-step, weighted by word frequency. */
  def usageCounts(seg: DataFrame): DataFrame =
    seg.select(col("freq"), explode(split(col("seg"), "\\|")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

  /** One full EM round: E-step under `pieces`, M-step re-estimate over
    * the FIXED vocab spine with +1 Laplace (counts stay integer, no
    * piece dies). */
  def emRound(words: DataFrame, vocabSpine: DataFrame,
      pieces: DataFrame): DataFrame =
    vocabSpine.select(col("piece"), col("len"))
      .join(usageCounts(viterbiSeg(words, pieces)), Seq("piece"), "left")
      .select(col("piece"), col("len"),
        (coalesce(col("cnt"), lit(0L)) + 1L).as("cnt"))

  // ---------------------------------------------------------------------
  // DuckDB replay (generated CTE chains, the trainMergesSql discipline)
  // ---------------------------------------------------------------------

  /** Shared oracle prefix: histogram, seed vocab, then `rounds` of
    * (scores s{r} → unrolled 12-stage Viterbi DP d{r}_j → per-word seg{r}
    * → usage u{r} → counts p{r+1}). Exposes CTEs words, vocab, p1..p{R+1},
    * s1..s{R}, seg1..seg{R}, u1..u{R}. */
  def oracleCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++=
      s"""WITH words AS MATERIALIZED (SELECT word, count(*)::BIGINT AS freq FROM (
         |    SELECT unnest(regexp_extract_all(text, '[A-Za-z]+')) AS word
         |    FROM documents)
         |  WHERE length(word) <= $MaxWordLen GROUP BY word),
         |subs AS MATERIALIZED (SELECT substr(w.word, i.i, l.l) AS piece,
         |    SUM(w.freq) AS cnt
         |  FROM words w, range(1, ${MaxWordLen + 1}) i(i),
         |    range(1, ${MaxPieceLen + 1}) l(l)
         |  WHERE i.i + l.l - 1 <= length(w.word) GROUP BY 1),
         |vocab AS MATERIALIZED (
         |  SELECT piece, CAST(length(piece) AS INT) AS len, cnt
         |  FROM subs WHERE length(piece) = 1
         |  UNION ALL
         |  SELECT piece, CAST(length(piece) AS INT) AS len, cnt FROM (
         |    SELECT piece, cnt,
         |      row_number() OVER (ORDER BY cnt DESC, piece) AS rn
         |    FROM subs WHERE length(piece) >= 2) WHERE rn <= $TopMulti),
         |p1 AS MATERIALIZED (SELECT piece, len, cnt FROM vocab)""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s""",
         |t$r AS MATERIALIZED (SELECT SUM(cnt) AS t FROM p$r),
         |s$r AS MATERIALIZED (SELECT p.piece, p.len,
         |    CAST(p.cnt AS DOUBLE) / CAST(t.t AS DOUBLE) AS score
         |  FROM p$r p CROSS JOIN t$r t)""".stripMargin
      sb ++= dpStagesSql(r.toString, s"s$r")
      sb ++= s""",
         |u$r AS MATERIALIZED (SELECT u.piece, SUM(s.freq) AS cnt
         |  FROM seg$r s, unnest(string_split(s.seg, '|')) u(piece)
         |  GROUP BY 1),
         |p${r + 1} AS MATERIALIZED (SELECT v.piece, v.len,
         |    COALESCE(u.cnt, 0) + 1 AS cnt
         |  FROM vocab v LEFT JOIN u$r u ON u.piece = v.piece)""".stripMargin
    }
    sb.toString
  }

  /** One unrolled Viterbi DP pass as CTE text (leading comma included):
    * stages d{tag}_0..d{tag}_${MaxWordLen} over a scores CTE named
    * `scores` (columns piece/len/score), ending in seg{tag} — the
    * per-word best segmentation. Used per EM round and by the t53
    * pruned-vocab re-segmentation. */
  def dpStagesSql(tag: String, scores: String): String = {
    val sb = new StringBuilder
    sb ++= s""",
       |d${tag}_0 AS MATERIALIZED (SELECT word, freq,
       |    CAST(1.0 AS DOUBLE) AS score, '' AS seg FROM words)""".stripMargin
    for (j <- 1 to MaxWordLen) {
      val arms = (1 to math.min(MaxPieceLen, j)).map { l =>
        s"""    SELECT d.word, d.freq, d.score * p.score AS score,
           |      d.seg || '|' || p.piece AS seg, $l AS pl, p.piece AS pc
           |    FROM d${tag}_${j - l} d JOIN $scores p
           |      ON p.piece = substr(d.word, ${j - l + 1}, $l)
           |    WHERE length(d.word) >= $j""".stripMargin
      }.mkString("\n    UNION ALL\n")
      sb ++= s""",
         |d${tag}_$j AS MATERIALIZED (SELECT word, freq, score, seg FROM (
         |  SELECT word, freq, score, seg, row_number() OVER (
         |    PARTITION BY word ORDER BY score DESC, pl DESC, pc) AS rn
         |  FROM (
         |$arms
         |  )) WHERE rn = 1)""".stripMargin
    }
    val segArms = (1 to MaxWordLen).map { j =>
      s"  SELECT word, freq, seg FROM d${tag}_$j WHERE length(word) = $j"
    }.mkString("\n  UNION ALL\n")
    sb ++= s""",
       |seg$tag AS MATERIALIZED (SELECT word, freq, substr(seg, 2) AS seg
       |  FROM (
       |$segArms
       |))""".stripMargin
    sb.toString
  }
}
