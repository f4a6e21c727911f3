package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.GraftSession
import graft.etl.Pipelines
import graft.sources.Tables

/** Runners replacing the reference's three Airflow DAG entry points
  * (SURVEY.md §3) with single Spark jobs — no XCom serialization, no /tmp
  * hand-off between tasks; each job is one lazy plan whose only physical
  * boundaries are Catalyst-planned shuffles.
  *
  * Usage: runMain graft.jobs.EtlJobs <clean|etl|drive> \
  *          <spotifyCsv> <grammyCsv> <outDir> [genreMapCsv]
  *
  *  - clean ≙ `spotify_clean` (limpiezaSpotify.py:63-107): genre map →
  *    mode-or-first dedup → distinct → CSV export.
  *  - etl   ≙ `etl_spotify_grammys` (merge_to_dw.py:328-346): merge →
  *    star-schema warehouse, each table written as parquet.
  *  - drive ≙ `merge_spotify_grammys_to_drive` (merge_to_drive.py:39-75):
  *    merge → CSV export.
  *
  * The genre mapping rides in as a (track_genre, genero, subgenero) CSV —
  * the reference's 97-entry inline dict (limpiezaSpotify.py:12-57) as
  * DATA, broadcast-joined, so a grown mapping never bloats the plan.
  */
object EtlJobs {

  private def genreMap(spark: SparkSession, path: Option[String]): DataFrame =
    path match {
      case Some(p) =>
        spark.read.option("header", "true").csv(p)
          .select("track_genre", "genero", "subgenero")
      case None =>
        // Default: the reference's full mapping, shipped as data
        // (src/main/resources/genre_map.csv ≙ limpiezaSpotify.py:12-57).
        graft.etl.GenreMap.df(spark)
    }

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: <clean|etl|drive> <spotifyCsv> <grammyCsv> <outDir> [genreMapCsv]")
    val Array(job, spotifyCsv, grammyCsv, outDir) = args.take(4)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, s"graft-$job")
    try {
      val spotify = Tables.readSpotifyCsv(spark, spotifyCsv)
      val grammys = Tables.readGrammyCsv(spark, grammyCsv)
      val mapping = genreMap(spark, args.drop(4).headOption)
      lazy val clean = Pipelines.cleanTracks(spotify, mapping, "row_idx")
      lazy val merged = Pipelines.mergeSpotifyGrammys(clean, grammys)
      job match {
        case "clean" =>
          Tables.writeCsv(clean, s"$outDir/spotify_clean_final")
        case "etl" =>
          Pipelines.buildWarehouse(merged).foreach { case (name, df) =>
            Tables.writeParquet(df, s"$outDir/$name")
          }
        case "drive" =>
          Tables.writeCsv(merged, s"$outDir/merged")
        case other => sys.error(s"unknown job: $other")
      }
    } finally spark.stop()
  }
}
