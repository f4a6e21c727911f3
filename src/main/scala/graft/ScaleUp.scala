package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One-off decade-up test-data extrapolator (round-12 scale probe):
  * writes an sf-N×`factor` copy of a driver-generated testdata
  * directory, so the expensive-query scaling law measured at
  * sf0.01→sf0.1 can be validated one decade higher WITHOUT touching
  * the read-only driver corpus.
  *
  * Two extrapolation modes, chosen per table by what the probe must
  * preserve:
  *
  *  - RELATIONAL tables (lineitem/orders/customer/part/supplier):
  *    replicate ×factor with keyspace remapping — copy c's key k
  *    becomes k + c·|keys|, every FK remapped by the same affine map,
  *    so per-key join degrees, group cardinalities per constant-domain
  *    key (returnflag etc.), value distributions, and date
  *    selectivities are EXACTLY the driver's, while keyed entity
  *    counts scale ×factor. This is the standard decade-up technique:
  *    the one distortion (non-key attribute n-tuplication, e.g.
  *    p_name) is invisible to the probe queries.
  *  - GENERATED tables (documents/embeddings/events): replication
  *    would plant factor-sized exact-duplicate classes and ×factor²
  *    similarity fan-out — precisely the wrong shape for the dedup/
  *    near-dup family. These are REGENERATED from the corpus's own
  *    measured generative law (profiled from /root/testdata, see each
  *    builder's doc) with hash-seeded determinism: same 30-word
  *    vocabulary, same 10..100-word lengths, same 5% planted
  *    `base-text + " dup"` near-duplicates, same unit-norm random
  *    embeddings, same 30-day exponential-value event stream — only
  *    bigger. No RNG object: every draw is a pure column expression
  *    over xxhash64(id, salt), so the output is identical on every
  *    run and cluster layout.
  *
  * Usage: `runMain graft.ScaleUp <srcDir> <destDir> [factor=10]`.
  * nation/region are fixed dimensions and are copied verbatim.
  */
object ScaleUp {

  /** Uniform double in [0,1) from a seeded hash — the probe corpus's
    * only randomness primitive.
    */
  private def u01(seed: Column*): Column =
    (pmod(xxhash64(seed: _*), lit(1000000007L)).cast("double")
      / lit(1000000007d))

  /** Standard-ish normal via the 12-uniform CLT sum (exact shape is
    * irrelevant: the reference embeddings are isotropic unit vectors,
    * and a 12-sum is already indistinguishable at 64 dims).
    */
  private def gauss(tag: String, id: Column, i: Column): Column = {
    val terms = (1 to 12).map(j => u01(lit(tag), id, i, lit(j)))
    terms.reduce(_ + _) - lit(6d)
  }

  private def writeOut(df: DataFrame, dest: String, name: String,
                       parts: Int): Unit =
    df.repartition(parts)
      .write.mode(SaveMode.Overwrite).parquet(s"$dest/$name.parquet")

  /** Replicate a table ×factor, remapping each listed key column by
    * `k + copy·span` where span is the source keyspace size. The
    * remap is injective iff every key value sits in [0, span), which
    * is all that is asserted for FOREIGN keys — a valid corpus may
    * simply never reference some parent key. Only the table's OWN
    * primary key (`pks`) is additionally asserted contiguous
    * 0..span-1, the witness that span (= the parent row count) is the
    * right keyspace size.
    */
  private def replicate(spark: SparkSession, src: String, name: String,
                        factor: Int, keySpans: Map[String, Long],
                        pks: Set[String] = Set.empty,
                        rewrite: Map[String, Column] = Map.empty)
  : DataFrame = {
    val base = spark.read.parquet(s"$src/$name.parquet")
    keySpans.foreach { case (k, span) =>
      val (lo, hi) = base.agg(min(col(k)), max(col(k)))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).head()
      if (pks(k))
        require(lo == 0L && hi == span - 1,
          s"$name.$k keyspace [$lo,$hi] is not contiguous 0..${span - 1}")
      else
        require(lo >= 0L && hi < span,
          s"$name.$k FK range [$lo,$hi] escapes keyspace [0,$span)")
    }
    val copies = spark.range(factor.toLong).select(col("id").as("_copy"))
    val rep = base.crossJoin(broadcast(copies))
    val remapped = keySpans.foldLeft(rep) { case (df, (k, span)) =>
      df.withColumn(k, col(k) + col("_copy") * lit(span))
    }
    rewrite.foldLeft(remapped) { case (df, (c, expr)) =>
      df.withColumn(c, expr)
    }.drop("_copy")
  }

  /** The documents generative law, measured from the driver corpus:
    * 30-word uniform vocabulary, length uniform 10..100 words,
    * lang en@~41% / {de,es,fr,zh} uniform, source = src(doc_id%20),
    * and a 5% planted near-duplicate class — text of a uniformly
    * chosen ORIGINAL doc plus the trailing token " dup" (243/250 of
    * the sf0.1 dup-marked docs are exactly an original + " dup";
    * exact-dup pairs arise when two plants pick the same base).
    */
  private def documents(spark: SparkSession, n: Long): DataFrame = {
    val vocab = array(Seq("spark", "window", "merge", "table", "column",
      "vector", "stream", "value", "data", "small", "join", "filter",
      "big", "group", "hash", "customer", "sort", "order", "slow",
      "line", "part", "fast", "the", "row", "agg", "key", "query", "a",
      "scan", "batch").map(lit): _*)
    val id = col("doc_id")
    def saltedPick(seedTag: String, idc: Column, i: Column): Column =
      element_at(vocab, (pmod(xxhash64(lit(seedTag), idc, i), lit(30))
        + lit(1)).cast("int"))
    def bodyOf(idc: Column): Column = {
      val len = (pmod(xxhash64(lit("len"), idc), lit(91)) + lit(10))
        .cast("int")
      array_join(transform(sequence(lit(1), len),
        i => saltedPick("w", idc, i)), " ")
    }
    val base = spark.range(n).select(col("id").as("doc_id"))
      .withColumn("_dup", pmod(xxhash64(lit("dup?"), id), lit(20)) === 0)
      .withColumn("_base",
        when(col("_dup"), pmod(xxhash64(lit("base"), id), lit(n)))
          .otherwise(id))
      // The plant copies the BASE's original body (even if the base id
      // is itself dup-marked, its original body is what's copied —
      // matching the reference law where plants reference originals).
      .withColumn("text",
        when(col("_dup"), concat(bodyOf(col("_base")), lit(" dup")))
          .otherwise(bodyOf(id)))
      .withColumn("lang",
        when(pmod(xxhash64(lit("lang"), id), lit(100)) < 41, lit("en"))
          .otherwise(element_at(
            array(lit("de"), lit("es"), lit("fr"), lit("zh")),
            (pmod(xxhash64(lit("l2"), id), lit(4)) + lit(1)).cast("int"))))
      .withColumn("source",
        concat(lit("src"), pmod(id, lit(20)).cast("string")))
      .withColumn("n_chars", length(col("text")))
    base.select(col("doc_id"), col("text"), col("lang"), col("source"),
      col("n_chars").cast("long").as("n_chars"))
  }

  /** Embeddings law: 64-dim isotropic unit vectors (per-label centroid
    * norm ≈ 0.07 in the reference — i.e. labels carry NO cluster
    * structure), label uniform over 10.
    */
  private def embeddings(spark: SparkSession, n: Long): DataFrame = {
    val id = col("vec_id")
    val raw = transform(sequence(lit(0), lit(63)),
      i => gauss("emb", id, i))
    val nrm = sqrt(aggregate(raw, lit(0d), (acc, x) => acc + x * x))
    spark.range(n).select(col("id").as("vec_id"))
      .withColumn("embedding", transform(raw, x => (x / nrm)
        .cast("float")))
      .withColumn("label",
        pmod(xxhash64(lit("lab"), id), lit(10)).cast("int"))
  }

  /** Events law: N rows over the fixed 30-day window starting
    * 2024-01-01 (uniform arrival times, ordered by event_id), user_id
    * uniform over customers/10, 5 uniform event types, value ~
    * Exp(mean 50) rounded to cents (reference median 34.8 ≈ 50·ln 2),
    * props = {"k": uniform 0..99}.
    */
  private def events(spark: SparkSession, n: Long, users: Long)
  : DataFrame = {
    val windowSec = 30L * 24 * 3600
    val types = array(lit("view"), lit("click"), lit("signup"),
      lit("purchase"), lit("error"))
    // Uniform arrivals sorted by time = sorted uniforms; assigning the
    // i-th order statistic to event_id i needs a global total order.
    // orderBy range-partitions the sort (distributed), and
    // zipWithIndex then hands out the ordinal per partition from
    // summed offsets — no single-partition Window funnel, so the
    // assignment stays distributed at any factor. (_t, _seq) is a
    // total order (_seq unique), so the ids are deterministic and
    // identical to the former row_number() - 1.
    val sorted = spark.range(n).select(col("id").as("_seq"))
      .withColumn("_t", u01(lit("ts"), col("_seq")))
      .withColumn("ts", timestamp_seconds(
        lit(java.time.Instant.parse("2024-01-01T00:00:00Z")
          .getEpochSecond) + col("_t") * lit(windowSec.toDouble)))
      .withColumn("user_id", pmod(xxhash64(lit("u"), col("_seq")),
        lit(users)))
      .withColumn("event_type", element_at(types,
        (pmod(xxhash64(lit("et"), col("_seq")), lit(5)) + lit(1))
          .cast("int")))
      .withColumn("value", round(lit(-50d) *
        log(lit(1d) - u01(lit("v"), col("_seq"))), 2))
      .withColumn("props", concat(lit("{\"k\": "),
        pmod(xxhash64(lit("k"), col("_seq")), lit(100)).cast("string"),
        lit("}")))
      .orderBy(col("_t"), col("_seq"))
      .select(col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType, nullable = false)
        +: sorted.schema.fields)
    spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(i +: r.toSeq)
      }, schema)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <destDir> [factor]")
    val (src, dest) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32),
      "graft-scaleup")
    import spark.implicits._

    val nCust = spark.read.parquet(s"$src/customer.parquet").count()
    val nPart = spark.read.parquet(s"$src/part.parquet").count()
    val nSupp = spark.read.parquet(s"$src/supplier.parquet").count()
    val nOrd = spark.read.parquet(s"$src/orders.parquet").count()
    val nDoc = spark.read.parquet(s"$src/documents.parquet").count()
    val nEmb = spark.read.parquet(s"$src/embeddings.parquet").count()
    val nEv = spark.read.parquet(s"$src/events.parquet").count()

    // Fixed dims: verbatim.
    Seq("nation", "region").foreach { t =>
      writeOut(spark.read.parquet(s"$src/$t.parquet"), dest, t, 1)
    }
    // Relational: replicate with affine key remap (+ key-derived name
    // rewrites so entity names stay unique per key).
    writeOut(replicate(spark, src, "customer", factor,
      Map("c_custkey" -> nCust), Set("c_custkey"),
      Map("c_name" -> format_string("Customer#%09d", col("c_custkey")))),
      dest, "customer", 4)
    writeOut(replicate(spark, src, "supplier", factor,
      Map("s_suppkey" -> nSupp), Set("s_suppkey"),
      Map("s_name" -> format_string("Supplier#%09d", col("s_suppkey")))),
      dest, "supplier", 1)
    writeOut(replicate(spark, src, "part", factor,
      Map("p_partkey" -> nPart), Set("p_partkey")), dest, "part", 4)
    writeOut(replicate(spark, src, "orders", factor,
      Map("o_orderkey" -> nOrd, "o_custkey" -> nCust),
      Set("o_orderkey")), dest, "orders", 8)
    writeOut(replicate(spark, src, "lineitem", factor,
      Map("l_orderkey" -> nOrd, "l_partkey" -> nPart,
        "l_suppkey" -> nSupp)), dest, "lineitem", 16)
    // Generated: same law, ×factor the rows. Embeddings follow the
    // driver's own ×4-per-decade growth (sf0.01→sf0.1 grew ×4, not
    // ×10): multiplier = factor^log10(4), so ×4 at factor 10, ×16 at
    // 100 — derived from the factor, never hardcoded, so a non-decade
    // factor still lands on the measured law.
    val embMult = math.round(
      math.pow(factor.toDouble, math.log10(4d))).max(1L)
    writeOut(documents(spark, nDoc * factor), dest, "documents", 8)
    writeOut(embeddings(spark, nEmb * embMult), dest, "embeddings", 4)
    writeOut(events(spark, nEv * factor, nCust * factor / 10),
      dest, "events", 8)
    println(s"""{"scaled": "$src -> $dest", "factor": $factor}""")
    spark.stop()
  }
}
