package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Relational, StarSchema}
import graft.sources.Tables

/** The ten Metabase dashboard cards D1–D10 (SURVEY.md §2.6) plus the
  * star-schema build (S11/J2), expressed over the synthetic corpus with
  * the role mapping from FIXTURES.md §B:
  *
  *   artist → customer, nomination → order (winner = o_orderstatus='F'),
  *   song → part, album → p_brand, genero → supplier's region,
  *   year → year(o_orderdate).
  *
  * Scale notes: every dim side of a join here is broadcast (region,
  * nation, supplier, part, customer are dimension-sized); the only
  * base-table shuffles are the aggregations themselves. Share-of-total
  * and argmax use broadcast-scalar aggregates — no single-partition
  * windows anywhere in the plan.
  */
object DashboardQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def winner = col("o_orderstatus") === "F"

  /** orders ⋈ customer with the dim side broadcast. */
  private def ordersWithArtist(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").join(broadcast(t(s, d, "customer")),
      col("o_custkey") === col("c_custkey"))

  /** lineitem ⋈ orders ⋈ part — facts joined to their two largest dims.
    * orders is genuinely fact-sized, so that join is left to Catalyst
    * (sort-merge at scale, AQE may demote to shuffled-hash); part is
    * broadcast.
    */
  private def lineFacts(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))

  /** supplier → nation → region rollup: genero of a song. */
  private def supplierRegion(s: SparkSession, d: String): DataFrame =
    t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("r_name").as("genero"))

  val regionNames: Seq[String] =
    Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D1: avg popularity by artist — top 5 + share of total (donut card).
    // Share uses the broadcast-scalar total (StarSchema.withShare), not a
    // single-partition window over every artist.
    "d1_avg_popularity" -> ((s, d) =>
      StarSchema.withShare(
        ordersWithArtist(s, d)
          .groupBy(col("c_name"))
          .agg(avg(col("o_totalprice")).as("ap")),
        "ap", "share")
        .orderBy(desc("ap"), col("c_name"))
        .limit(5)
        .select(col("c_name"), round(col("ap"), 4).as("avg_pop"), col("share"))),

    // D2: number of artists (count distinct over the fact join).
    "d2_n_artists" -> ((s, d) =>
      ordersWithArtist(s, d)
        .agg(countDistinct(col("c_name")).as("n_artists"))),

    // D3: albums with the most wins, with share.
    "d3_top_albums" -> ((s, d) =>
      StarSchema.withShare(
        lineFacts(s, d).where(winner)
          .groupBy(col("p_brand")).agg(count(lit(1)).as("wins")),
        "wins", "share")
        .orderBy(desc("wins"), col("p_brand"))
        .limit(5)),

    // D4: artists who have won.
    "d4_winning_artists" -> ((s, d) =>
      ordersWithArtist(s, d).where(winner)
        .agg(countDistinct(col("c_name")).as("n_winners"))),

    // D5: per-artist win count + danceability proxy. Lineitem is
    // pre-aggregated to one row per order BEFORE the artist rollup: the
    // order-level distinct is then free (count_if, no expand operator /
    // distinct aggregation over the multiplied join), and the widest
    // shuffle carries |orders| rows instead of |lineitem|.
    "d5_wins_danceability" -> ((s, d) => {
      val perOrder = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_discount")).as("_sd"), count(lit(1)).as("_cnt"))
      ordersWithArtist(s, d)
        .join(perOrder, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_name"))
        .agg(
          count_if(winner).as("grammy_wins"),
          // Stable average of a cent-discrete double: rounding the sum to
          // its exact cent value makes it bit-identical to the oracle's
          // (regrouping error ~1e-13 is absorbed), then one integer-exact
          // division — no half-way rounding boundary can flip the result.
          (round(sum(col("_sd")), 2) / sum(col("_cnt")))
            .as("avg_danceability"))
        .orderBy(col("c_name"))
    }),

    // D6: nominations by (year, genero) — wide pivot form. Pivot values
    // are pinned (never inferred — inference is an extra job and
    // non-deterministic column order); nulls → 0 to match SQL counts.
    "d6_year_genre_pivot" -> ((s, d) => {
      val withRegion = ordersWithArtist(s, d)
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      withRegion
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .pivot("r_name", regionNames)
        .count()
        .na.fill(0, regionNames)
        .withColumnRenamed("MIDDLE EAST", "MIDDLE_EAST")
        .orderBy(col("yr"))
    }),

    // D7: extremes table — the most popular and the most-winning artist,
    // both via distributed argmax (parallel max + broadcast filter, no
    // driver sort, no global window).
    "d7_extremes" -> ((s, d) => {
      val pop = Relational.argmaxRow(
        ordersWithArtist(s, d)
          .select(col("c_name"), col("o_totalprice").as("metric"),
            col("o_orderkey")),
        col("metric"), col("o_orderkey"))
        .select(lit("mas_popular").as("who"), col("c_name"), col("metric"))
      val wins = ordersWithArtist(s, d).where(winner)
        .groupBy(col("c_name"))
        .agg(countDistinct(col("o_orderkey")).as("wins"))
      val topWin = Relational.argmaxRow(wins, col("wins"), col("c_name"))
        .select(lit("mas_ganador").as("who"), col("c_name"),
          col("wins").cast("double").as("metric"))
      pop.unionByName(topWin).orderBy(col("who"))
    }),

    // D8: winners with low energy but high popularity (threshold filter).
    "d8_low_energy_popular" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .where(winner && col("l_discount") < 0.03 && col("o_totalprice") > 400000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_discount"),
          col("o_totalprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // D9: ranking of artists by total wins (top 5) — the flagship.
    "d9_top_artists" -> ((s, d) =>
      ordersWithArtist(s, d).where(winner)
        .groupBy(col("c_name"))
        .agg(countDistinct(col("o_orderkey")).as("wins"))
        .orderBy(desc("wins"), col("c_name"))
        .limit(5)),

    // D10: genre with the most winning songs (countDistinct songs per
    // supplier-region rollup).
    "d10_genre_wins" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .where(winner)
        .join(broadcast(supplierRegion(s, d)), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("genero"))
        .agg(countDistinct(col("l_partkey")).as("winning_songs"))
        .orderBy(desc("winning_songs"), col("genero"))),

    // S11+J2: set-based star build — brand dim with xxhash64 surrogate
    // keys, facts FK-resolved via broadcast join, grouped back by the
    // natural key (surrogates are opaque; the oracle checks the join's
    // fact counts, a test asserts surrogate uniqueness).
    "star_fact_counts" -> ((s, d) => {
      val dim = StarSchema.buildDim(t(s, d, "part"), "brand_id", Seq("p_brand"))
      val facts = StarSchema.resolveFk(
        t(s, d, "lineitem").join(broadcast(t(s, d, "part")),
          col("l_partkey") === col("p_partkey")),
        dim, Seq("p_brand"), "brand_id")
      StarSchema.gateComplete(facts, Seq("brand_id"))
        .groupBy(col("brand_id"), col("p_brand"))
        .agg(count(lit(1)).as("n_facts"))
        .select(col("p_brand"), col("n_facts"))
        .orderBy(col("p_brand"))
    })
  )

  val oracles: Map[String, String] = Map(
    "d1_avg_popularity" ->
      """WITH a AS (SELECT c_name, avg(o_totalprice) AS ap FROM orders
        |  JOIN customer ON o_custkey=c_custkey GROUP BY 1)
        |SELECT c_name, round(ap,4) AS avg_pop, round(ap/sum(ap) OVER (),4) AS share
        |FROM a ORDER BY ap DESC, c_name LIMIT 5""".stripMargin,
    "d2_n_artists" ->
      """SELECT count(DISTINCT c_name) AS n_artists FROM orders
        |JOIN customer ON o_custkey=c_custkey""".stripMargin,
    "d3_top_albums" ->
      """WITH w AS (SELECT p_brand, count(*) AS wins FROM lineitem
        |  JOIN orders ON l_orderkey=o_orderkey
        |  JOIN part ON l_partkey=p_partkey
        |  WHERE o_orderstatus='F' GROUP BY 1)
        |SELECT p_brand, wins, round(wins/sum(wins) OVER (),4) AS share
        |FROM w ORDER BY wins DESC, p_brand LIMIT 5""".stripMargin,
    "d4_winning_artists" ->
      """SELECT count(DISTINCT c_name) AS n_winners FROM orders
        |JOIN customer ON o_custkey=c_custkey WHERE o_orderstatus='F'""".stripMargin,
    "d5_wins_danceability" ->
      """SELECT c_name,
        |count(DISTINCT CASE WHEN o_orderstatus='F' THEN o_orderkey END) AS grammy_wins,
        |round(sum(l_discount),2)/count(*) AS avg_danceability
        |FROM customer JOIN orders ON c_custkey=o_custkey
        |JOIN lineitem ON o_orderkey=l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "d6_year_genre_pivot" ->
      """SELECT year(o_orderdate) AS yr,
        |count(*) FILTER (WHERE r_name='AFRICA') AS "AFRICA",
        |count(*) FILTER (WHERE r_name='AMERICA') AS "AMERICA",
        |count(*) FILTER (WHERE r_name='ASIA') AS "ASIA",
        |count(*) FILTER (WHERE r_name='EUROPE') AS "EUROPE",
        |count(*) FILTER (WHERE r_name='MIDDLE EAST') AS "MIDDLE_EAST"
        |FROM orders JOIN customer ON o_custkey=c_custkey
        |JOIN nation ON c_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "d7_extremes" ->
      """WITH pop AS (SELECT 'mas_popular' AS who, c_name, o_totalprice AS metric,
        |  row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders JOIN customer ON o_custkey=c_custkey),
        |w AS (SELECT c_name, count(DISTINCT o_orderkey) AS wins FROM customer
        |  JOIN orders ON c_custkey=o_custkey WHERE o_orderstatus='F' GROUP BY 1),
        |winr AS (SELECT 'mas_ganador' AS who, c_name, CAST(wins AS DOUBLE) AS metric,
        |  row_number() OVER (ORDER BY wins DESC, c_name) AS rn FROM w)
        |SELECT who, c_name, metric FROM pop WHERE rn=1
        |UNION ALL SELECT who, c_name, metric FROM winr WHERE rn=1
        |ORDER BY who""".stripMargin,
    "d8_low_energy_popular" ->
      """SELECT l_orderkey, l_linenumber, l_discount, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        |WHERE o_orderstatus='F' AND l_discount<0.03 AND o_totalprice>400000
        |ORDER BY 1,2""".stripMargin,
    "d9_top_artists" ->
      """SELECT c_name, count(DISTINCT o_orderkey) AS wins FROM orders
        |JOIN customer ON o_custkey=c_custkey WHERE o_orderstatus='F'
        |GROUP BY 1 ORDER BY wins DESC, c_name LIMIT 5""".stripMargin,
    "d10_genre_wins" ->
      """SELECT r_name AS genero, count(DISTINCT l_partkey) AS winning_songs
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        |JOIN supplier ON l_suppkey=s_suppkey
        |JOIN nation ON s_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey
        |WHERE o_orderstatus='F'
        |GROUP BY 1 ORDER BY 2 DESC, 1""".stripMargin,
    "star_fact_counts" ->
      """SELECT p_brand, count(*) AS n_facts FROM lineitem
        |JOIN part ON l_partkey=p_partkey GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
