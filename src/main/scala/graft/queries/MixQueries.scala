package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Decontam, Dedup, TrainingMix}
import graft.sources.Tables

/** Training-mix assembly queries over `documents.parquet`: deterministic
  * weighted source mixing, concat-and-chunk sequence packing, and
  * per-source token-budget trimming (operators.TrainingMix). The oracles
  * recompute the same md5 thresholds and running totals as plain window
  * SQL — the Spark side must EQUAL the naive global-window answer while
  * executing as a partition-parallel two-phase prefix sum.
  */
object MixQueries {
  // Spread the single-split documents scan before per-row hashing work
  // (Tables.spread: guide §2.5; no-op at production split counts).
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.loadSpread(s, d, "documents", "doc_id")

  /** Mixture spec shared by query and oracle: per-language keep rates. */
  private val mixRates: Seq[(String, Double)] =
    Seq("en" -> 0.75, "de" -> 0.5, "es" -> 0.25, "fr" -> 0.125)

  private val PackBudget = 256L
  private val TrimBudget = 2000L

  private def quality: org.apache.spark.sql.Column = {
    val nt = TextFunctions.tokenCount(col("text"))
    val pr = TextFunctions.punctRatio(col("text"))
    val awl = TextFunctions.avgWordLen(col("text"))
    lit(0.5) * (least(nt, lit(100L)).cast("double") / lit(100.0)) +
      lit(0.3) * (lit(1.0) - pr) +
      lit(0.2) * (least(awl, lit(10.0)) / lit(10.0))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Weighted source mixing: per-row md5-threshold predicate (zero
    // shuffle), per-language keep rates, unlisted languages kept whole.
    "t_mix_weighted" -> ((s, d) =>
      TrainingMix.weightedMix(docs(s, d), "lang", "doc_id",
          mixRates.toMap)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // EPOCH PLAN — "how many passes over each source fill the target
    // mix": given a PINNED token budget (100k) and pinned per-language
    // mix weights (milli-units: en 400, de/es 200, fr/zh 100), each
    // language's target token mass and the repeat factor
    // epochs = target/available, computed as exact integer milli-
    // epochs ((target·1000) div n_tokens) with one display division.
    // Epochs > 1 is the up-sampling signal (low-resource languages get
    // repeated); ≪ 1 means sub-sampling. One token-count aggregate +
    // a 5-row broadcast weight table.
    "mix_epoch_plan" -> ((s, d) => {
      val wts = Seq(("en", 400L), ("de", 200L), ("es", 200L),
        ("fr", 100L), ("zh", 100L))
      val wdf = wts.map { case (l, wm) =>
        docs(s, d).sparkSession.range(1)
          .select(lit(l).as("lang"), lit(wm).as("w_milli"))
      }.reduce(_ unionByName _)
      docs(s, d).select(col("lang"),
          size(filter(TextFunctions.tokens(col("text")),
            t => length(t) > 0)).cast("long").as("nt"))
        .groupBy(col("lang"))
        .agg(sum(col("nt")).cast("long").as("n_tokens"))
        .join(broadcast(wdf), Seq("lang"))
        .withColumn("target_tokens",
          expr("(100000 * w_milli) div 1000"))
        .withColumn("epochs_milli",
          expr("(target_tokens * 1000) div n_tokens"))
        .withColumn("epochs", col("epochs_milli").cast("double") / 1000.0)
        .select(col("lang"), col("n_tokens"), col("w_milli"),
          col("target_tokens"), col("epochs_milli"), col("epochs"))
        .orderBy(col("lang"))
    }),

    // Temperature-scaled sampling weights (α = 1/2), the multilingual-
    // training mix rule (XLM-style): w_l ∝ n_l^α lifts low-resource
    // languages relative to raw frequency. Weights stay EXACT integers
    // — floor(sqrt(n·10⁶)) is deterministic on both engines (sqrt is
    // IEEE correctly-rounded, the argument exact below 2⁵²) — and the
    // share is one division of exact ints, dodging the nondeterministic
    // float-sum-order trap a direct sum of doubles would hit. One tiny
    // |langs|-row aggregate + broadcast total.
    "t_mix_temperature" -> ((s, d) => {
      val counts = docs(s, d).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("weight",
          floor(sqrt(col("n_docs").cast("double") * 1e6)).cast("long"))
      counts
        .crossJoin(broadcast(counts.agg(sum(col("weight")).as("_tw"))))
        .select(col("lang"), col("n_docs"), col("weight"),
          (col("weight").cast("double") / col("_tw")).as("share"))
        .orderBy(col("lang"))
    }),

    // RESHARDING cost — what fraction of the corpus MOVES when the
    // shard count grows 8 → 10, under naive mod-N (moves ~(N−1)/N of
    // everything) vs rendezvous/HRW hashing (moves only ~2/10 — the
    // docs the two NEW buckets win): the operational argument for
    // consistent placement of a 100 TB corpus. All hashing is the
    // md5-prefix discipline; the HRW winner is a per-doc row_number
    // over ≤10 candidate rows with a pinned (hash DESC, bucket)
    // tie-break, mirrored verbatim in the oracle.
    "t_shard_stability" -> ((s, d) => {
      val base = docs(s, d).select(col("doc_id"))
      val h = conv(substring(md5(col("doc_id").cast("string")), 1, 12),
        16, 10).cast("long")
      val mods = base.select(col("doc_id"),
        pmod(h, lit(8)).as("s8"), pmod(h, lit(10)).as("s10"))
      val rv = base
        .select(col("doc_id"), explode(expr("sequence(0, 9)")).as("b"))
        .withColumn("hk", substring(md5(concat(
          col("doc_id").cast("string"), lit("#"),
          col("b").cast("string"))), 1, 12))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(desc("hk"), col("b"))
      def winner(n: Int, cn: String) = rv.where(col("b") < n)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("doc_id"), col("b").cast("long").as(cn))
      mods.join(winner(8, "r8"), Seq("doc_id"))
        .join(winner(10, "r10"), Seq("doc_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("s8") =!= col("s10"), 1L).otherwise(0L))
            .cast("long").as("mv_mod"),
          sum(when(col("r8") =!= col("r10"), 1L).otherwise(0L))
            .cast("long").as("mv_rv"))
        .select(explode(array(
          struct(lit("mod").as("scheme"), col("n_docs"),
            col("mv_mod").as("n_moved")),
          struct(lit("rendezvous").as("scheme"), col("n_docs"),
            col("mv_rv").as("n_moved")))).as("r"))
        .select(col("r.scheme").as("scheme"),
          col("r.n_docs").as("n_docs"), col("r.n_moved").as("n_moved"),
          expr("(1000 * r.n_moved) div r.n_docs").as("moved_permille"))
        .orderBy(col("scheme"))
    }),

    // Temperature SWEEP — price the sampling-temperature knob before
    // committing a mix: per-language shares at τ = 0.25 / 0.50 / 0.75
    // from ONE 5-row language aggregate. Fractional powers are
    // composed ONLY from sqrt (n^¼ = √√n, n^¾ = √n·√√n): sqrt is
    // IEEE-correctly-rounded in both engines where pow() is not, so
    // the floored micro-unit weights can never drift cross-engine.
    "t_mix_temperature_sweep" -> ((s, d) => {
      val counts = docs(s, d).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
      val nd = col("n_docs").cast("double")
      def at(tauCenti: Int, f: org.apache.spark.sql.Column) =
        counts.select(lit(tauCenti.toLong).as("tau_centi"), col("lang"),
          col("n_docs"), floor(f * 1e6).cast("long").as("weight"))
      val all = at(25, sqrt(sqrt(nd)))
        .unionByName(at(50, sqrt(nd)))
        .unionByName(at(75, sqrt(nd) * sqrt(sqrt(nd))))
      val tot = all.groupBy(col("tau_centi"))
        .agg(sum(col("weight")).cast("long").as("tw"))
      all.join(broadcast(tot), Seq("tau_centi"))
        .select(col("tau_centi"), col("lang"), col("n_docs"),
          col("weight"),
          (col("weight").cast("double") / col("tw").cast("double"))
            .as("share"))
        .orderBy(col("tau_centi"), col("lang"))
    }),

    // Concat-and-chunk sequence packing in md5 shuffle order: each doc
    // joins the pack where its token stream starts. Global running total
    // via the two-phase prefix sum — no whole-corpus window.
    "t_pack_sequences" -> ((s, d) =>
      TrainingMix.packSequences(docs(s, d), "doc_id",
          TextFunctions.tokenCount(col("text")), PackBudget)
        .orderBy(col("doc_id"))),

    // Per-pack layout check: sequence count and token fill per pack —
    // what the training loader actually consumes.
    "t_pack_stats" -> ((s, d) =>
      TrainingMix.packSequences(docs(s, d), "doc_id",
          TextFunctions.tokenCount(col("text")), PackBudget)
        .groupBy(col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_fill"))
        .orderBy(col("pack_id"))),

    // Corpus composition report: per-(source, lang) doc/token counts and
    // token share of the whole corpus — the mixture sheet a training run
    // records. Share uses the broadcast-scalar total (no `over ()`
    // single-partition window), same pattern as the dashboard shares.
    "t_corpus_report" -> ((s, d) => {
      val agg = docs(s, d)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text"))).as("n_tok"))
      agg.crossJoin(broadcast(agg.agg(sum(col("n_tok")).as("_tot"))))
        .select(col("source"), col("lang"), col("n_docs"), col("n_tok"),
          (col("n_tok").cast("double") / col("_tot")).as("tok_share"))
        .orderBy(col("source"), col("lang"))
    }),

    // Shard assignment: 64 docs per shard in md5 shuffle order — the
    // export layout of a training corpus (unit-weight packing).
    "t_shard_assign" -> ((s, d) =>
      TrainingMix.shardAssignments(docs(s, d), "doc_id", 64L)
        .orderBy(col("doc_id"))),

    // Export manifest (the data card beside the shards): per shard, row
    // count, token total, and an order-independent content fingerprint
    // (decimal-exact md5-checksum sum, same construction as
    // q_fingerprint) — what a training loader checks before it trusts a
    // delivered shard, and what replica verification diffs across lakes.
    "t_shard_manifest" -> ((s, d) => {
      val dd = docs(s, d)
      dd.join(TrainingMix.shardAssignments(dd, "doc_id", 64L),
          Seq("doc_id"))
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text"))).as("n_tokens"),
          // Decimal-exact internally (a 100-TB shard sum overflows
          // int64); surfaced as a digit string — the driver's hasher
          // canonicalizes strings across engines but not DECIMAL.
          sum(conv(substring(md5(concat_ws("|",
              col("doc_id"), col("text"))), 1, 12), 16, 10)
            .cast("decimal(38,0)")).cast("string").as("fingerprint"))
        .orderBy(col("shard_id"))
    }),

    // THE WHOLE TRAINING-DATA PIPELINE as one declarative plan: quality
    // gate → exact dedup → near-dup clustering keeper → benchmark
    // decontamination (flagged docs removed) → weighted source mixing →
    // concat-and-chunk sequence packing. Every stage is the registered
    // operator; the oracle replays the entire chain in one SQL statement
    // (recursive CTE for the clustering, ASOF-free) — the strongest
    // end-to-end correctness statement the engine makes.
    "t_training_pipeline" -> ((s, d) => {
      val all = docs(s, d)
      val nt = TextFunctions.tokenCount(col("text"))
      val pr = TextFunctions.punctRatio(col("text"))
      val awl = TextFunctions.avgWordLen(col("text"))
      val quality = all
        .where(nt >= 5 && pr <= 0.1 && awl >= 2.0 && awl <= 10.0)
      val exact = Dedup.exactDedup(quality, "doc_id", "text")
      val kept = Dedup.nearDedupKept(exact, "doc_id", "text",
        threshold = 0.5)
      val evalSet = all.where(pmod(col("doc_id"), lit(37)) === 0)
      // Stage boundary: `train` fans into TWO consumers (the decontam
      // shingle join and the anti-join that removes its flagged rows), so
      // without it the whole quality→exact→near-dup chain (including the
      // iterative clustering) is recomputed per consumer. At the lake this
      // is the curated-corpus staging table between pipeline stages — the
      // same posture as the warehouse merge stage.
      val train = kept.where(pmod(col("doc_id"), lit(37)) =!= 0)
        .localCheckpoint()
      val flagged = Decontam.overlaps(train, evalSet, "doc_id", "text",
          n = 3, minOverlap = 2, maxShingleDf = 50L)
        .select(col("train_id").as("doc_id")).distinct()
      val cleanCorpus = train.join(flagged, Seq("doc_id"), "left_anti")
      val mixed = TrainingMix.weightedMix(cleanCorpus, "lang", "doc_id",
        mixRates.toMap)
      TrainingMix.packSequences(mixed, "doc_id",
          TextFunctions.tokenCount(col("text")), PackBudget)
        .orderBy(col("doc_id"))
    }),

    // Token-budget trimming: per language, best-quality docs first until
    // the budget is covered (kept iff tokens before it are under budget).
    "t_token_budget" -> ((s, d) =>
      TrainingMix.trimToTokenBudget(docs(s, d), "lang", "doc_id",
          quality, TextFunctions.tokenCount(col("text")), TrimBudget)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")))
  )

  private val wsSql = """string_split_regex(lower(trim(text)),'\s+')"""
  private val ntSql =
    "CASE WHEN length(trim(text))=0 THEN 0 ELSE len(ws) END"

  // CASE chain generated from the SAME rate literals the Spark side uses
  // (TrainingMix.rateThreshold), so the two can never drift.
  private val mixCaseSql = mixRates.map { case (lang, rate) =>
    s"WHEN lang='$lang' THEN md5(CAST(doc_id AS VARCHAR)) < '${TrainingMix.rateThreshold(rate)}'"
  }.mkString("CASE ", " ", " ELSE true END")

  private val qualitySql =
    """0.5*(CAST(least(nt,100) AS DOUBLE)/100.0) + 0.3*(1.0-pr)
      |    + 0.2*(least(awl,10.0)/10.0)""".stripMargin

  private val packCteSql =
    s"""WITH w AS (SELECT doc_id, $ntSql AS n_tok
       |  FROM (SELECT doc_id, text, $wsSql AS ws FROM documents)),
       |c AS (SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       |  sum(n_tok) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |    ROWS UNBOUNDED PRECEDING) AS cum FROM w),
       |p AS (SELECT doc_id, n_tok,
       |  CAST(floor((cum - n_tok)/$PackBudget.0) AS BIGINT) AS pack_id
       |  FROM c)""".stripMargin

  val oracles: Map[String, String] = Map(
    "t_mix_weighted" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE $mixCaseSql ORDER BY doc_id""".stripMargin,
    "mix_epoch_plan" ->
      s"""WITH w AS (SELECT lang,
         |  CAST(len(list_filter($wsSql, t -> length(t)>0)) AS BIGINT)
         |    AS nt FROM documents),
         |tok AS (SELECT lang, CAST(sum(nt) AS BIGINT) AS n_tokens
         |  FROM w GROUP BY 1),
         |wt AS (SELECT * FROM (VALUES
         |  ('en', CAST(400 AS BIGINT)), ('de', CAST(200 AS BIGINT)),
         |  ('es', CAST(200 AS BIGINT)), ('fr', CAST(100 AS BIGINT)),
         |  ('zh', CAST(100 AS BIGINT))) AS t(lang, w_milli))
         |SELECT tok.lang, n_tokens, w_milli,
         |  CAST((100000 * w_milli) // 1000 AS BIGINT) AS target_tokens,
         |  CAST((((100000 * w_milli) // 1000) * 1000) // n_tokens
         |    AS BIGINT) AS epochs_milli,
         |  CAST((((100000 * w_milli) // 1000) * 1000) // n_tokens
         |    AS DOUBLE) / 1000.0 AS epochs
         |FROM tok JOIN wt USING (lang) ORDER BY tok.lang""".stripMargin,
    "t_pack_sequences" ->
      s"""$packCteSql
         |SELECT doc_id, n_tok, pack_id FROM p ORDER BY doc_id""".stripMargin,
    "t_shard_stability" ->
      """WITH d0 AS (SELECT doc_id FROM documents),
        |h AS (SELECT doc_id, CAST('0x' ||
        |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS hv
        |  FROM d0),
        |m AS (SELECT doc_id, hv % 8 AS s8, hv % 10 AS s10 FROM h),
        |rv AS (SELECT doc_id, t.b,
        |  substr(md5(CAST(doc_id AS VARCHAR) || '#' ||
        |    CAST(t.b AS VARCHAR)), 1, 12) AS hk
        |  FROM d0, range(10) AS t(b)),
        |w8 AS (SELECT doc_id, b AS r8 FROM (SELECT doc_id, b,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY hk DESC, b)
        |    AS rn FROM rv WHERE b < 8) WHERE rn = 1),
        |w10 AS (SELECT doc_id, b AS r10 FROM (SELECT doc_id, b,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY hk DESC, b)
        |    AS rn FROM rv) WHERE rn = 1),
        |j AS (SELECT m.doc_id, s8, s10, r8, r10
        |  FROM m JOIN w8 USING (doc_id) JOIN w10 USING (doc_id)),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN s8 <> s10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS mv_mod,
        |  CAST(sum(CASE WHEN r8 <> r10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS mv_rv FROM j)
        |SELECT 'mod' AS scheme, n_docs, mv_mod AS n_moved,
        |  (1000 * mv_mod) // n_docs AS moved_permille FROM a
        |UNION ALL SELECT 'rendezvous', n_docs, mv_rv,
        |  (1000 * mv_rv) // n_docs FROM a
        |ORDER BY scheme""".stripMargin,
    "t_mix_temperature_sweep" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |w AS (
        |SELECT CAST(25 AS BIGINT) AS tau_centi, lang, n_docs,
        |  CAST(floor(sqrt(sqrt(CAST(n_docs AS DOUBLE))) * 1e6)
        |    AS BIGINT) AS weight FROM c
        |UNION ALL
        |SELECT 50, lang, n_docs,
        |  CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1e6) AS BIGINT)
        |  FROM c
        |UNION ALL
        |SELECT 75, lang, n_docs,
        |  CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) *
        |    sqrt(sqrt(CAST(n_docs AS DOUBLE))) * 1e6) AS BIGINT)
        |  FROM c),
        |t AS (SELECT tau_centi, CAST(sum(weight) AS BIGINT) AS tw
        |  FROM w GROUP BY 1)
        |SELECT w.tau_centi, w.lang, w.n_docs, w.weight,
        |  CAST(w.weight AS DOUBLE) / CAST(t.tw AS DOUBLE) AS share
        |FROM w JOIN t ON w.tau_centi = t.tau_centi
        |ORDER BY 1, 2""".stripMargin,
    "t_mix_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents
        |  GROUP BY 1),
        |w AS (SELECT lang, n_docs,
        |  CAST(floor(sqrt(CAST(n_docs AS DOUBLE) * 1e6)) AS BIGINT)
        |    AS weight FROM c)
        |SELECT lang, n_docs, weight,
        |  CAST(weight AS DOUBLE) /
        |    (SELECT CAST(sum(weight) AS BIGINT) FROM w) AS share
        |FROM w ORDER BY lang""".stripMargin,
    "t_pack_stats" ->
      s"""$packCteSql
         |SELECT pack_id, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS tok_fill
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "t_corpus_report" ->
      s"""WITH w AS (SELECT source, lang, $ntSql AS nt
         |  FROM (SELECT source, lang, text, $wsSql AS ws FROM documents)),
         |a AS (SELECT source, lang, count(*) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS n_tok FROM w GROUP BY 1,2)
         |SELECT source, lang, n_docs, n_tok,
         |  CAST(n_tok AS DOUBLE)/(SELECT sum(n_tok) FROM a) AS tok_share
         |FROM a ORDER BY source, lang""".stripMargin,
    "t_training_pipeline" ->
      s"""WITH RECURSIVE qual AS (
         |  SELECT doc_id, text, lang FROM (
         |    SELECT doc_id, text, lang,
         |      CASE WHEN length(trim(text))=0 THEN 0 ELSE len(ws) END AS nt,
         |      CAST(length(regexp_replace(text,'[^.,!?;:]','','g')) AS DOUBLE)/length(text) AS pr,
         |      CAST(length(regexp_replace(text,'\\s','','g')) AS DOUBLE)/len(ws) AS awl
         |    FROM (SELECT doc_id, text, lang, $wsSql AS ws FROM documents))
         |  WHERE nt>=5 AND pr<=0.1 AND awl>=2.0 AND awl<=10.0),
         |ex AS (SELECT q.* FROM qual q
         |  JOIN (SELECT min(doc_id) AS doc_id FROM qual GROUP BY md5(text)) k
         |  USING (doc_id)),
         |${TextQueries.neardupPairCtesFrom("ex")},
         |pairs AS (SELECT id_a, id_b FROM j WHERE jac>=0.5),
         |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (SELECT src, src FROM e
         |  UNION SELECT e.src, r.dst FROM e JOIN reach r ON e.dst=r.src),
         |cc AS (SELECT src AS node, min(dst) AS cluster FROM reach GROUP BY 1),
         |kept AS (SELECT doc_id, lang FROM ex
         |  WHERE doc_id NOT IN (SELECT node FROM cc WHERE node<>cluster)),
         |w0 AS (SELECT doc_id, text, lang, $wsSql AS ws FROM documents),
         |shs0 AS (SELECT doc_id, ${TextQueries.sh3Sql} AS sh FROM w0),
         |trq AS (SELECT doc_id AS train_id, unnest(sh) AS s FROM shs0
         |  WHERE doc_id IN (SELECT doc_id FROM kept) AND doc_id%37<>0),
         |evq AS (SELECT doc_id AS eval_id, unnest(sh) AS s FROM shs0
         |  WHERE doc_id%37=0),
         |rare AS (SELECT s FROM trq GROUP BY s HAVING count(*)<=50),
         |ovp AS (SELECT train_id, eval_id, count(*) AS n
         |  FROM trq JOIN rare USING (s) JOIN evq USING (s) GROUP BY 1,2),
         |clean2 AS (SELECT k.doc_id, k.lang FROM kept k
         |  WHERE k.doc_id%37<>0
         |  AND k.doc_id NOT IN (SELECT train_id FROM ovp WHERE n>=2)),
         |mixk AS (SELECT doc_id FROM clean2 WHERE $mixCaseSql),
         |tok AS (SELECT doc_id, CAST($ntSql AS BIGINT) AS n_tok
         |  FROM w0 JOIN mixk USING (doc_id)),
         |cum AS (SELECT doc_id, n_tok,
         |  sum(n_tok) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |    ROWS UNBOUNDED PRECEDING) AS cum FROM tok)
         |SELECT doc_id, n_tok,
         |  CAST(floor((cum - n_tok)/$PackBudget.0) AS BIGINT) AS pack_id
         |FROM cum ORDER BY doc_id""".stripMargin,
    "t_shard_assign" ->
      """WITH c AS (SELECT doc_id, row_number() OVER (
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, CAST(floor((rn-1)/64.0) AS BIGINT) AS shard_id
        |FROM c ORDER BY doc_id""".stripMargin,
    "t_shard_manifest" ->
      s"""WITH c AS (SELECT doc_id, text, row_number() OVER (
         |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         |  FROM documents),
         |a AS (SELECT doc_id, text,
         |  CAST(floor((rn-1)/64.0) AS BIGINT) AS shard_id,
         |  $wsSql AS ws FROM c)
         |SELECT shard_id, count(*) AS n_docs,
         |  CAST(sum($ntSql) AS BIGINT) AS n_tokens,
         |  CAST(sum(CAST('0x' || substr(md5(doc_id || '|' || text), 1, 12)
         |    AS BIGINT)) AS VARCHAR) AS fingerprint
         |FROM a GROUP BY 1 ORDER BY 1""".stripMargin,
    "t_token_budget" ->
      s"""WITH f AS (SELECT doc_id, lang, $ntSql AS nt,
         |  CAST(length(regexp_replace(text,'[^.,!?;:]','','g')) AS DOUBLE)/length(text) AS pr,
         |  CAST(length(regexp_replace(text,'\\s','','g')) AS DOUBLE)/len(ws) AS awl
         |  FROM (SELECT doc_id, lang, text, $wsSql AS ws FROM documents)),
         |q AS (SELECT doc_id, lang, nt, $qualitySql AS quality FROM f),
         |c AS (SELECT doc_id, lang, nt,
         |  sum(nt) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS cum FROM q)
         |SELECT doc_id, lang FROM c WHERE cum - nt < $TrimBudget
         |ORDER BY doc_id""".stripMargin
  )
}
