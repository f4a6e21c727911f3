package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-drift tripwire (round-6 hardening).
  *
  * In round 5 the driver regenerated the test corpus and `events.parquet`
  * switched its `ts` encoding from TIMESTAMP(NANOS) to TIMESTAMP(µs); the
  * then-hardcoded nanos rewrite in Tables.load threw at analysis and 28
  * oracle queries silently vanished from the correctness run. This suite
  * converts that failure mode into a named test: every synthetic table at
  * every SF must load, count > 0, and present the column names/types the
  * engine's queries are written against. If the driver regenerates the
  * corpus again, the drift shows up HERE, inside the round, not as a
  * wall of absent oracle entries at judging time.
  */
class CorpusSmokeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val sfDirs: Seq[String] =
    Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"/root/testdata/$s")
      .filter(d => new java.io.File(d).isDirectory)

  test("at least one SF directory exists") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* directories found")
  }

  /** Column-name → expected Spark type AFTER Tables.load normalization.
    * `ts` is asserted as the session-zoned TimestampType: the loader must
    * deliver that regardless of which on-disk encoding generation (int64
    * nanos or µs timestamp) the corpus ships.
    */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  for (dir <- sfDirs; table <- sources.Tables.synthetic) {
    test(s"${dir.split('/').last}/$table loads, counts > 0, schema matches") {
      val df = sources.Tables.load(spark, dir, table)
      val byName = df.schema.map(f => f.name -> f.dataType).toMap
      for ((col, dt) <- expected(table)) {
        assert(byName.contains(col), s"$table missing column $col")
        // ArrayType containsNull and timestamp flavors are normalized by
        // the loader; compare on the erased type where it matters.
        (byName(col), dt) match {
          case (ArrayType(a, _), ArrayType(b, _)) => assert(a == b,
            s"$table.$col element type ${a} != expected ${b}")
          case (actual, exp) => assert(actual == exp,
            s"$table.$col is ${actual}, expected ${exp}")
        }
      }
      assert(df.count() > 0, s"$table is empty at $dir")
    }
  }

  test("registerAll survives and registers every loadable table") {
    sources.Tables.registerAll(spark, sfDirs.head)
    for (t <- sources.Tables.synthetic)
      assert(spark.catalog.tableExists(t), s"view $t not registered")
    // The SQL surface the r5 collateral failures went through:
    assert(spark.sql("SELECT count(*) FROM events").head().getLong(0) > 0)
  }
}
