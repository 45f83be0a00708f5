package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding subword vocabulary training + greedy merge encoding
  * (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare Words
  * with Subword Units" — the published learn_bpe/apply_bpe algorithm,
  * re-implemented fresh). GDAL has no tokenizer; this is part of the
  * training-data-pipeline family layered on the same engine (d15's
  * char-class pre-tokenizer is the GPT-2-style coarse split that runs
  * BEFORE this; this is the actual merge-table trainer + encoder).
  *
  * Scale shape (the 100-TB story):
  *  - The trainer's state is the distinct-WORD frequency table, which is
  *    vocabulary-bounded (Heaps' law), NOT corpus-bounded. One distributed
  *    `groupBy(word)` builds it; a cap guard refuses loudly if the distinct
  *    word count exceeds `vocabCap` (sample words upstream in that case —
  *    the reference implementation trains on a frequency dict too).
  *  - The merge loop itself is inherently sequential (merge i+1's pair
  *    counts depend on merge i) and runs on the driver over the bounded
  *    vocab — the same bounded-driver-state pattern as the k-means
  *    codebooks ([[Ann]]).
  *  - Corpus encoding is map-only: the learned merge list becomes a literal
  *    chain of `replace` calls (whole-stage codegen, no UDF, no shuffle, no
  *    broadcast even — the merges are query literals).
  *
  * Token-sequence representation: every symbol is wrapped in ASCII angle
  * brackets — "cat" + end-of-word marker → "&lt;c&gt;&lt;a&gt;&lt;t&gt;&lt;_&gt;". Applying
  * merge (p1,p2) is then a PLAIN substring replace of "&lt;p1&gt;&lt;p2&gt;" with
  * "&lt;p1p2&gt;": left-to-right non-overlapping literal replace on this
  * bracketed form is exactly the reference implementation's greedy merge
  * pass (learn_bpe.py applies re.sub("(?<!\\S)p1 p2(?!\\S)") over
  * space-joined symbols — the brackets make mid-token false matches
  * impossible, and unlike the space-joined form no delimiter is shared
  * between adjacent matches, so "&lt;a&gt;&lt;a&gt;&lt;a&gt;&lt;a&gt;" → "&lt;aa&gt;&lt;aa&gt;" exactly as
  * the lookaround regex does). Symbols stay in [a-z_]+, so the brackets can
  * never collide with symbol text. Java's String.replace, Spark's `replace`
  * and DuckDB's `replace` all share these literal left-to-right semantics,
  * which is what lets the oracle twin replay training exactly.
  */
object Bpe {

  final case class Merge(step: Long, p1: String, p2: String, cnt: Long)

  /** End-of-word marker symbol (Sennrich's `</w>`, kept in [a-z_]). */
  final val EndMark = "_"

  /** Distributed word-frequency table: lowercased [a-z]+ runs of `textCol`.
    * One shuffle (the groupBy); output size is vocabulary-bounded. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(expr(
        s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial bracketed symbol sequence of a word: one symbol per character
    * plus the end-of-word marker. */
  def initRepr(word: String): String = {
    val sb = new StringBuilder(word.length * 3 + 3)
    var i = 0
    while (i < word.length) { sb.append('<').append(word.charAt(i)).append('>'); i += 1 }
    sb.append('<').append(EndMark).append('>')
    sb.toString
  }

  private def tokensOf(repr: String): Array[String] =
    repr.substring(1, repr.length - 1).split("><")

  /** Train `nMerges` BPE merges over a (word, freq) table. Driver state is
    * the vocab itself — refuse loudly past `vocabCap` rather than silently
    * collecting an unbounded table. Pair counts are weighted by word
    * frequency, overlapping occurrences each counted (the reference's
    * zip(word, word[1:]) statistics); ties break on (count desc, p1 asc,
    * p2 asc) so training is deterministic. */
  def train(wordFreqDf: DataFrame, nMerges: Int, vocabCap: Long): Seq[Merge] = {
    val rows = wordFreqDf
      .select(col("word").cast("string"), col("freq").cast("long")).collect()
    require(rows.length <= vocabCap,
      s"Bpe.train: distinct-word vocabulary ${rows.length} exceeds " +
        s"vocabCap=$vocabCap — bound the word sample upstream (the merge " +
        "loop is driver-side over the vocab by design, like the k-means " +
        "codebooks); refusing an unbounded driver collect")
    var vocab: Array[(String, Long)] =
      rows.map(r => (initRepr(r.getString(0)), r.getLong(1)))
    val out = mutable.ArrayBuffer.empty[Merge]
    var step = 0
    while (step < nMerges) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (repr, f) =>
        val ts = tokensOf(repr)
        var i = 0
        while (i < ts.length - 1) {
          val k = (ts(i), ts(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) return out.toSeq // every word fully merged
      val ((p1, p2), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
      out += Merge(step.toLong, p1, p2, cnt)
      val pat = s"<$p1><$p2>"
      val rep = s"<$p1$p2>"
      vocab = vocab.map { case (r, f) => (r.replace(pat, rep), f) }
      step += 1
    }
    out.toSeq
  }

  /** Bracketed-symbol column for one word column with `merges` applied —
    * a literal chain of codegen'd `replace` calls. */
  def applyMerges(word: Column, merges: Seq[Merge]): Column = {
    val init = concat(
      regexp_replace(word, "(.)", "<$1>"), lit(s"<$EndMark>"))
    merges.foldLeft(init) { (acc, m) =>
      call_function("replace", acc,
        lit(s"<${m.p1}><${m.p2}>"), lit(s"<${m.p1}${m.p2}>"))
    }
  }

  /** Per-document encoding summary: (#subword tokens, md5 of the segmented
    * text). Map-only — merges are literals in the plan. Documents with no
    * [a-z]+ word are dropped (no token sequence to hash). */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[Merge]): DataFrame = {
    val words = expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")
    docs.select(col(idCol), words.as("ws"))
      .where(size(col("ws")) >= 1)
      .withColumn("reprs", transform(col("ws"), w => applyMerges(w, merges)))
      .select(col(idCol),
        aggregate(col("reprs"), lit(0L),
          (acc, r) => acc + size(split(r, "><")).cast("long")).as("n_tokens"),
        md5(concat_ws(" ", col("reprs"))).as("tok_md5"))
  }
}
