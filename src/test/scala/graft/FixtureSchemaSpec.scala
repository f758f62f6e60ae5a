package graft

import org.apache.spark.sql.types._

/** Tripwire at the one boundary this repo does not control: the
  * driver-generated fixture parquet under /root/testdata. When the driver
  * regenerated the fixtures on 2026-08-13, `events.ts` silently changed
  * physical type (TIMESTAMP(NANOS) → timestamp[us]/TIMESTAMP_NTZ) and the
  * break surfaced as 21 scattered query errors instead of one pointed
  * message. This spec runs at sf0.001 (cheap) and names the drifted column
  * directly.
  *
  * Assertions are on the POST-`Tables.load` schema — i.e. the contract the
  * query layer depends on — plus a rows>0 sanity probe per table.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Expected post-load column types per table. `events.ts` must be
    * TimestampType regardless of the parquet physical type — that is the
    * normalization Tables.load owns. Date-ish columns in orders/lineitem
    * arrive as TIMESTAMP_NTZ from timestamp[us] parquet and are consumed
    * as-is by the queries (oracle-green), so NTZ is the pinned expectation.
    */
  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Map(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Map(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))

  for (table <- Tables.names) {
    test(s"fixture schema: $table") {
      val df = Tables.load(spark, dir, table)
      val actual = df.schema.map(f => f.name -> f.dataType).toMap
      val want = expected(table)
      for ((col, tpe) <- want) {
        assert(actual.contains(col),
          s"$table: column '$col' missing — fixture drift; present: ${actual.keys.toSeq.sorted.mkString(", ")}")
        assert(actual(col) == tpe,
          s"$table.$col: expected $tpe but fixtures read as ${actual(col)} — " +
            "driver regenerated fixtures with a new physical type; " +
            "update Tables.load / this spec deliberately")
      }
      val extra = actual.keySet -- want.keySet
      assert(extra.isEmpty, s"$table: unexpected new columns $extra — fixture drift")
      assert(df.limit(1).count() == 1, s"$table: fixture is empty at $dir")
    }
  }
}
