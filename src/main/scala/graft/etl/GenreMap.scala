package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's genre mapping shipped as DATA
  * (limpiezaSpotify.py:12-57 — the 114-entry inline
  * `track_genre → (genero, subgenero)` dict), bundled as
  * `src/main/resources/genre_map.csv` so the cleaning pipeline reproduces
  * the reference's genero/subgenero semantics out of the box.
  *
  * The same rows feed three consumers from ONE source of truth:
  *  - [[df]]: the broadcast-join lookup side of
  *    [[Pipelines.applyGenreMap]] (a lookup TABLE, not a plan-bloating
  *    `typedLit(Map)` — stays O(1) per row if the mapping grows);
  *  - [[sqlValues]]: a DuckDB-inlinable VALUES relation for correctness
  *    oracles;
  *  - [[keys]]: the genre vocabulary, used to derive deterministic
  *    track_genre columns over the synthetic corpus.
  */
object GenreMap {

  /** (track_genre, genero, subgenero) rows parsed from the bundled CSV. */
  val entries: Seq[(String, String, String)] = {
    val in = getClass.getResourceAsStream("/genre_map.csv")
    require(in != null, "genre_map.csv missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().drop(1).map { line =>
      line.split(",", 3) match {
        case Array(g, ge, sub) => (g, ge, sub)
        case other => sys.error(s"bad genre_map.csv line: $line")
      }
    }.toVector
    finally src.close()
  }

  def keys: Seq[String] = entries.map(_._1)

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.toDF("track_genre", "genero", "subgenero")
  }

  private def q(s: String) = "'" + s.replace("'", "''") + "'"

  /** The same mapping as a DuckDB VALUES relation
    * `(VALUES ...) AS m(track_genre, genero, subgenero)` — correctness
    * oracles join it exactly like the engine joins [[df]].
    */
  def sqlValues: String =
    entries.map { case (g, ge, sub) => s"(${q(g)},${q(ge)},${q(sub)})" }
      .mkString("(VALUES ", ",", ") AS m(track_genre, genero, subgenero)")
}
