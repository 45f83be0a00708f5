package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 final-continuation gates: the remaining training-data-pipeline
  * operators (semantic dedup, PII redaction, composite quality rules).
  * Same conventions as [[Queries]]. */
object Queries6 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // PII patterns shared by the Spark path and the DuckDB twin. Kept inside
  // the common Java-regex/RE2 subset (char classes, bounded repetition) so
  // both engines match identical spans.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+1-555-[0-9]{4}"

  // Gopher-rule thresholds (Rae et al. 2021, Table A1), word-count bound
  // scaled to this corpus's ~25-75-word synthetic docs (the paper's 50-word
  // floor would drop everything; the RULE is what's under test, the
  // constants are dataset parameters).
  private val MinWords = 10L; private val MaxWords = 100000L
  private val MinMwlU = 3000000L; private val MaxMwlU = 10000000L
  private val MaxSymPpm = 100000L   // symbol-to-word ratio < 0.1
  private val MinAlphaPpm = 800000L // ≥80% of words contain a letter
  private val MinStop = 1L          // ≥1 of the 8 Gopher stopwords

  private val Stopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** e11 corpus: the embeddings table plus, for vec_id < 40, a synthetic
    * near-duplicate (id+1000, first coordinate scaled ×1.5 — cosine ≈0.998
    * to its source, far above any natural pair's 0.51 max). ×1.5 is one
    * exact IEEE rounding per engine, so both sides build bit-identical
    * corpora. */
  private def semCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val dups = base.where(col("vec_id") < 40).select(
      (col("vec_id") + 1000).as("vec_id"),
      concat(array(element_at(col("e"), 1) * lit(1.5)),
        slice(col("e"), 2, 63)).as("e"))
    base.unionByName(dups)
  }

  val defs8: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // -- SemDeDup semantic near-dup removal (Abbas et al. 2023): k-means
    // cluster the embeddings, then WITHIN each cluster drop every vector
    // with a lower-id neighbor at cosine ≥ 0.95. The pairwise stage joins
    // ON THE CLUSTER KEY (cluster-bounded, never corpus-quadratic; the
    // maxCluster guard refuses loudly if a cluster would go quadratic).
    // The twin replays the identical deterministic recipe: same stride
    // init, same unrolled micro-rounded Lloyd's iterations, same integer
    // micro-cosine threshold — bit-identical kept sets.
    ("e11_semdedup", (s, dir) => {
      engine.Ann.semDedup(semCorpus(s, dir), "vec_id", "e",
          k = 8, iters = 2, tauU = 950000L, trainCap = 250, maxCluster = 500)
        .orderBy("vec_id")
    }, Some(semDedupOracle)),

    // -- PII redaction (d20): email + phone detection counts and the
    // redacted-text md5 — the scrub step every training corpus runs before
    // tokenization. Map-only (codegen regexp over each partition; no
    // shuffle at any scale). PII spans are synthesized deterministically
    // into the text so the gate has known positives; counts are computed
    // on the ORIGINAL text, the md5 on the redacted text (emails first,
    // then phones — order pinned on both sides).
    ("d20_pii_redact", (s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
          concat(lit("see "), substring(col("text"), 1, 30), lit(" mail user"),
            col("doc_id"), lit("@m"), col("doc_id") % 7,
            lit(".example.com or +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" bye")).as("txt"))
        .select(col("doc_id"),
          regexp_count(col("txt"), lit(EmailRe)).cast("long").as("n_email"),
          regexp_count(col("txt"), lit(PhoneRe)).cast("long").as("n_phone"),
          md5(regexp_replace(regexp_replace(col("txt"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>")).as("red_md5"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH p AS (SELECT doc_id,
          'see ' || substr(text, 1, 30) || ' mail user'
          || CAST(doc_id AS VARCHAR) || '@m' || CAST(doc_id % 7 AS VARCHAR)
          || '.example.com or +1-555-'
          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' bye' AS txt
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(txt, '$EmailRe')) AS BIGINT) AS n_email,
        CAST(len(regexp_extract_all(txt, '$PhoneRe')) AS BIGINT) AS n_phone,
        md5(regexp_replace(regexp_replace(txt, '$EmailRe', '<EMAIL>', 'g'),
          '$PhoneRe', '<PHONE>', 'g')) AS red_md5
      FROM p ORDER BY doc_id""")),

    // -- Gopher composite quality rules (d21, Rae et al. 2021 A1.1): the
    // keep/drop decision that composes the quality stats — word count
    // bounds, mean word length, symbol-to-word ratio, alphabetic-word
    // fraction, stopword presence — into a reasons BITMASK (bit set =
    // rule failed) and a kept flag. All ratios are integer fixed-point
    // (ppm via BIGINT division) so threshold edges are exact in both
    // engines. Map-only at any scale. Docs get a deterministic numeric /
    // symbol tail (doc_id % 4) so the alpha and symbol rules have real
    // positives.
    ("d21_gopher_rules", (s, dir) => {
      val stops = Stopwords.map(w =>
        array_contains(split(col("txt"), " "), w).cast("long")).reduce(_ + _)
      t(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 4 === 0, lit(" 123 456"))
              .when(col("doc_id") % 4 === 1, lit(" ### #"))
              .otherwise(lit(""))).as("txt"))
        .withColumn("n_words", size(split(col("txt"), " ")).cast("long"))
        .withColumn("mwl_u", expr(
          "(CAST(length(txt) AS BIGINT) - n_words + 1) * 1000000 div n_words"))
        .withColumn("alpha_ppm", expr("CAST(size(filter(split(txt, ' '), " +
          "w -> w rlike '[A-Za-z]')) AS BIGINT) * 1000000 div n_words"))
        .withColumn("sym_ppm", expr("CAST(length(txt) - " +
          "length(replace(txt, '#', '')) AS BIGINT) * 1000000 div n_words"))
        .withColumn("n_stop", stops)
        .withColumn("reasons",
          when(col("n_words") < MinWords || col("n_words") > MaxWords, 1L).otherwise(0L) +
          when(col("mwl_u") < MinMwlU || col("mwl_u") > MaxMwlU, 2L).otherwise(0L) +
          when(col("sym_ppm") >= MaxSymPpm, 4L).otherwise(0L) +
          when(col("alpha_ppm") < MinAlphaPpm, 8L).otherwise(0L) +
          when(col("n_stop") < MinStop, 16L).otherwise(0L))
        .select(col("doc_id"), col("n_words"), col("mwl_u"), col("alpha_ppm"),
          col("sym_ppm"), col("n_stop"), col("reasons"),
          when(col("reasons") === 0L, 1L).otherwise(0L).as("kept"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH p AS (SELECT doc_id,
          text || CASE WHEN doc_id % 4 = 0 THEN ' 123 456'
                       WHEN doc_id % 4 = 1 THEN ' ### #' ELSE '' END AS txt
        FROM documents),
      w AS (SELECT doc_id, txt, string_split(txt, ' ') AS ws FROM p),
      m AS (SELECT doc_id,
          CAST(len(ws) AS BIGINT) AS n_words,
          (CAST(length(txt) AS BIGINT) - len(ws) + 1) * 1000000 // len(ws) AS mwl_u,
          CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
            * 1000000 // len(ws) AS alpha_ppm,
          CAST(length(txt) - length(replace(txt, '#', '')) AS BIGINT)
            * 1000000 // len(ws) AS sym_ppm,
          ${Stopwords.map(w => s"CAST(list_contains(ws, '$w') AS BIGINT)")
            .mkString(" + ")} AS n_stop
        FROM w),
      r AS (SELECT *,
          (CASE WHEN n_words < $MinWords OR n_words > $MaxWords THEN 1 ELSE 0 END)
          + (CASE WHEN mwl_u < $MinMwlU OR mwl_u > $MaxMwlU THEN 2 ELSE 0 END)
          + (CASE WHEN sym_ppm >= $MaxSymPpm THEN 4 ELSE 0 END)
          + (CASE WHEN alpha_ppm < $MinAlphaPpm THEN 8 ELSE 0 END)
          + (CASE WHEN n_stop < $MinStop THEN 16 ELSE 0 END) AS reasons
        FROM m)
      SELECT doc_id, n_words, mwl_u, alpha_ppm, sym_ppm, n_stop,
        CAST(reasons AS BIGINT) AS reasons,
        CAST(CASE WHEN reasons = 0 THEN 1 ELSE 0 END AS BIGINT) AS kept
      FROM r ORDER BY doc_id"""))
  )

  /** DuckDB replay of [[graft.engine.Ann.semDedup]] over [[semCorpus]]:
    * the same deterministic k-means chain as the e04 oracle (stride init,
    * 2 unrolled assign/update iterations with 1e-6-rounded centroid
    * means, trainCap stride sample), then the within-cluster lower-id
    * pair rule on integer micro-cosines. */
  private def semDedupOracle: String = {
    def dotD(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i]))"
    def ccD(c: String) = s"list_sum(list_transform($c, x -> x * x))"
    def score(v: String, c: String) = s"${ccD(c)} - 2.0 * ${dotD(v, c)}"
    def assignCte(i: Int, src: String, name: String) = s"""
      $name AS (SELECT vec_id, emb, nm, cid FROM (
          SELECT e.vec_id, e.emb, e.nm, c.cid,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY ${score("e.emb", "c.ce")}, c.cid) AS rk
          FROM $src e CROSS JOIN c$i c) WHERE rk = 1)"""
    def updateCte(i: Int) = s"""
      c${i + 1} AS (SELECT cid, list(m ORDER BY pos) AS ce FROM (
          SELECT cid, pos, floor(avg(v) * 1000000.0 + 0.5) / 1000000.0 AS m FROM (
            SELECT cid, generate_subscripts(emb, 1) AS pos, unnest(emb) AS v FROM a$i)
          GROUP BY cid, pos) GROUP BY cid)"""
    val iters = 2; val k = 8; val cap = 250; val tau = 950000L
    val loop = (0 until iters).map(i =>
      assignCte(i, "tr", s"a$i") + "," + updateCte(i)).mkString(",")
    s"""
      WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      d AS (SELECT vec_id + 1000 AS vec_id,
            list_concat([e[1] * 1.5], e[2:]) AS e FROM b WHERE vec_id < 40),
      u AS (SELECT * FROM b UNION ALL SELECT * FROM d),
      en AS (SELECT vec_id, e AS emb,
            sqrt(list_sum(list_transform(e, x -> x * x))) AS nm FROM u),
      tr AS (SELECT * FROM en WHERE vec_id %
          (SELECT greatest(1, count(*) // $cap) FROM en) = 0),
      c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, emb AS ce
          FROM en WHERE vec_id % (SELECT greatest(1, count(*) // $k) FROM en) = 0
          ORDER BY vec_id LIMIT $k),
      $loop,
      ${assignCte(iters, "en", "asg").trim},
      pairs AS (SELECT l.vec_id AS lo, r.vec_id AS hi,
          CAST(floor(${dotD("l.emb", "r.emb")} / (l.nm * r.nm)
            * 1000000.0 + 0.5) AS BIGINT) AS cos_u
        FROM asg l JOIN asg r ON l.cid = r.cid AND l.vec_id < r.vec_id),
      dd AS (SELECT hi, count(*) AS n_dups, min(lo) AS dup_lo
        FROM pairs WHERE cos_u >= $tau GROUP BY hi)
      SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
        CAST(CASE WHEN dd.hi IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept,
        CAST(coalesce(dd.n_dups, 0) AS BIGINT) AS n_dups,
        CAST(coalesce(dd.dup_lo, a.vec_id) AS BIGINT) AS dup_lo
      FROM asg a LEFT JOIN dd ON a.vec_id = dd.hi ORDER BY a.vec_id"""
  }
}
