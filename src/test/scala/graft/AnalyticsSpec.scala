package graft

import java.io.ByteArrayOutputStream

import graft.functions.expressions.BloomMightContainLong
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** The q113–q120 analytics batch: window-family tail (ntile, percent_rank /
  * cume_dist, frame values), pivot/unpivot round trip, the bloom-prefiltered
  * semi join (expression contract + differential vs the exact join), and the
  * exact-moment statistical queries.
  */
class AnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  // ----- bloom_might_contain_long contract --------------------------------

  private def filterBytes(keys: Seq[Long], expected: Long = 100): Array[Byte] = {
    val bf = BloomFilter.create(expected, 0.01)
    keys.foreach(bf.putLong)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("bloom probe never false-negatives and codegen agrees with interpreted eval") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val keys = (0L until 500L).map(_ * 7919L)
    val bytes = filterBytes(keys, 500)
    val df = (0L until 5000L).toDF("k")
    // codegen path (whole-stage over the filter)
    val viaPlan = df.filter(call_function("bloom_might_contain_long", col("k"), lit(bytes)))
      .collect().map(_.getLong(0)).toSet
    // inserted keys in the probed domain MUST all survive (no false negatives)
    val inserted = keys.filter(_ < 5000L).toSet
    assert(inserted.subsetOf(viaPlan),
      s"false negatives: ${(inserted -- viaPlan).take(5)}")
    // interpreted eval parity on the full probed domain
    val expr = BloomMightContainLong(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.LongType, nullable = false), bytes)
    val viaEval = (0L until 5000L).filter { k =>
      expr.eval(org.apache.spark.sql.catalyst.InternalRow(k)) == true
    }.toSet
    assert(viaEval == viaPlan, "codegen and interpreted probe disagree")
  }

  test("bloom probe rejects malformed arguments with AnalysisException") {
    graft.plans.GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(1L).toDF("k")
    intercept[AnalysisException] { // non-foldable filter argument
      df.select(call_function("bloom_might_contain_long", col("k"), col("k"))).collect()
    }
    intercept[AnalysisException] { // arity
      df.select(call_function("bloom_might_contain_long", col("k"))).collect()
    }
  }

  test("q118 equals the exact semi join (bloom false positives all removed)") {
    val viaBloom = run("q118_bloom_semi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val part = Tables.load(spark, dir, "part")
      .filter(col("p_size") <= 5).select("p_partkey")
    // same render boundary as the query: exact decimal sum, one final
    // correctly-rounded double cast (the r10 q01/q119 rule)
    val exact = Tables.load(spark, dir, "lineitem")
      .join(part, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast(org.apache.spark.sql.types.DoubleType).as("qty"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaBloom.nonEmpty && viaBloom == exact)
  }

  test("q118 keeps the exact join on the broadcast path") {
    val p = run("q118_bloom_semi").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"))
    assert(p.contains("bloom_might_contain_long"),
      "the scan-stage bloom prefilter is missing from the physical plan")
  }

  // ----- window-family tail ----------------------------------------------

  test("q113 quartiles partition each segment with near-equal bucket sizes") {
    val rows = run("q113_ntile_buckets").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val segs = Tables.load(spark, dir, "customer")
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySeg = rows.groupBy(_._1)
    assert(bySeg.keySet == segs.keySet)
    bySeg.foreach { case (seg, tiles) =>
      assert(tiles.map(_._2).sorted.toSeq == (1L to 4L), s"$seg tiles")
      assert(tiles.map(_._3).sum == segs(seg), s"$seg sizes must sum to segment count")
      val sizes = tiles.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$seg ntile buckets must differ by at most 1: $sizes")
    }
  }

  test("q114 percent_rank/cume_dist lie in [0,1] and cume_dist is monotone in balance") {
    val rows = run("q114_percent_cume").collect()
      .map(r => (r.getInt(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, pr, cd) => pr >= 0 && pr <= 1 && cd > 0 && cd <= 1 })
    rows.groupBy(_._1).foreach { case (_, nat) =>
      val byBal = nat.sortBy(_._2)
      byBal.sliding(2).foreach {
        case Array((_, _, _, cd1), (_, _, _, cd2)) => assert(cd1 <= cd2)
        case _ =>
      }
    }
  }

  test("q115 frame values match a sequential-scan recomputation of the ROWS frame") {
    val got = run("q115_frame_values").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got.nonEmpty)
    // recompute [i-3, i+1] frames per user on the same (ts, event_id) order
    val purchases = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val expected = purchases.groupBy(_._1).flatMap { case (u, rs) =>
      val ordered = rs.sortBy(r => (r._3.getTime, r._2)).map(_._2)
      ordered.zipWithIndex.map { case (eid, i) =>
        val frame = ordered.slice(math.max(0, i - 3), math.min(ordered.length, i + 2))
        (u, eid, frame.head, frame.last, if (frame.length >= 2) Some(frame(1)) else None)
      }.toSeq
    }.toSet
    assert(got.toSet == expected, "window frame values diverge from sequential scan")
  }

  // ----- pivot / unpivot round trip ---------------------------------------

  test("q116/q117: unpivot(pivot) is the day×type cross product preserving all counts") {
    val wide = run("q116_pivot_wide").collect()
    val long = run("q117_unpivot_long").collect()
      .map(r => ((r.getDate(0).toString, r.getString(1)), r.getLong(2))).toMap
    assert(long.size == wide.length * 5, "long form must be the full day×type grid")
    val types = operators.Analytics.EventTypes
    wide.foreach { r =>
      val day = r.getDate(0).toString
      types.zipWithIndex.foreach { case (t, i) =>
        assert(long((day, t)) == r.getLong(i + 1), s"cell ($day,$t) diverged in unpivot")
      }
    }
    val total = Tables.load(spark, dir, "events").count()
    assert(long.values.sum == total, "pivoted counts must partition the event table")
  }

  test("q116 plans the two-phase pivot aggregate with no values-discovery pass") {
    val p = run("q116_pivot_wide").queryExecution.executedPlan.toString
    // Spark plans pivot as (day, type) pre-aggregate → day-keyed pivotfirst:
    // two keyed exchanges, both dimension-sized after map-side combine. The
    // values list is pinned, so no collect/discovery job and no Expand.
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 2, s"pivot grew beyond the two-phase aggregate, saw $hashEx hash exchanges:\n$p")
    assert(p.contains("pivotfirst"), "expected the native pivotfirst aggregate")
    assert(!p.contains("CollectLimit") && !p.contains("Expand"),
      "explicit pivot values must not trigger a values-discovery pass")
  }

  // ----- exact-moment statistics ------------------------------------------

  test("q119 agrees with Spark's native regr_slope/corr on the cent-quantized points") {
    val got = run("q119_regr_exact").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    assert(got.forall { case (_, n, s, i, r) =>
      n > 0 && !s.isNaN && !i.isNaN && r >= -1.0 && r <= 1.0 })
    val orders = Tables.load(spark, dir, "orders").select("o_custkey", "o_totalprice")
    val customer = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val nation = Tables.load(spark, dir, "nation").select("n_nationkey", "n_name")
    val pts = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        floor(col("c_acctbal") * 100).cast("double").as("x"),
        floor(col("o_totalprice") * 100).cast("double").as("y"))
    val ref = pts.groupBy("n_name")
      .agg(regr_slope(col("y"), col("x")).as("slope"), corr(col("y"), col("x")).as("r"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    got.foreach { case (nat, _, slope, _, r) =>
      val (rs, rr) = ref(nat)
      assert(math.abs(slope - rs) <= 1e-6 * math.max(1.0, math.abs(rs)),
        s"$nat slope $slope vs native $rs")
      assert(math.abs(r - rr) <= 1e-6, s"$nat r $r vs native $rr")
    }
  }

  test("q120 gini is 0 for single-type users and bounded by 1-1/k") {
    val rows = run("q120_gini_diversity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (u, n, k, g) =>
      assert(k >= 1 && n >= k, s"user $u: n=$n k=$k")
      if (k == 1) assert(g == 0.0, s"single-type user $u must have gini 0, got $g")
      else assert(g > 0.0 && g <= 1.0 - 1.0 / k + 1e-12, s"user $u gini $g out of bounds for k=$k")
    }
    val total = Tables.load(spark, dir, "events").count()
    assert(rows.map(_._2).sum == total, "per-user n must partition the event table")
  }
}
