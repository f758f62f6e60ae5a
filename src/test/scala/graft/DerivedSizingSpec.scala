package graft

import org.apache.spark.sql.functions._

/** The corpus-derived index sizing rule ([[operators.Sizing]]) — the
  * remedy for the sf0.1→sf1 rehearsal's one >linear outlier (SCALE.md:
  * with fixture constants the SRP/IVF pair space grows ~quadratically;
  * with derived sizing it stays linear).
  */
class DerivedSizingSpec extends SparkSpec {

  import operators.Sizing

  private val dir = "/root/testdata/sf0.001"

  test("derivePlanes: log2 growth, E[|bucket|] ≤ target, clamps") {
    // 2^planes ≥ n/target throughout the unclamped range.
    for (n <- Seq(10_000L, 1_000_000L, 100_000_000L, 10_000_000_000L)) {
      val p = Sizing.derivePlanes(n)
      assert((1L << p) >= n / Sizing.TargetBucketRows,
        s"n=$n planes=$p: expected bucket exceeds target")
      // one more order of magnitude costs ~log2(10) ≈ 3.3 planes, never more
      val p10 = Sizing.derivePlanes(n * 10)
      assert(p10 - p >= 3 && p10 - p <= 4, s"n=$n: $p → $p10 not log-growth")
    }
    // clamps: tiny corpora keep the fixture-scale minimum; the id stays
    // a positive Int at any size.
    assert(Sizing.derivePlanes(100L) == Sizing.MinPlanes)
    assert(Sizing.derivePlanes(Long.MaxValue / 4) == Sizing.MaxPlanes)
  }

  test("deriveCells: linear growth, bounded cells, clamps") {
    // keep n·10 below the MaxCells clamp (≈2.7e8 rows at the default target)
    for (n <- Seq(100_000L, 1_000_000L, 10_000_000L)) {
      val k = Sizing.deriveCells(n)
      // cells bounded: n/k ≤ target (k = ceil(n/target))
      assert(n.toDouble / k <= Sizing.TargetCellRows.toDouble, s"n=$n k=$k cell too big")
      // linear: 10× corpus → ~10× cells (within ceil rounding)
      val k10 = Sizing.deriveCells(n * 10)
      assert(math.abs(k10 - 10.0 * k) <= 10.0, s"n=$n: $k → $k10 not linear")
    }
    assert(Sizing.deriveCells(10L) == Sizing.MinCells)
    assert(Sizing.deriveCells(Long.MaxValue / 4) == Sizing.MaxCells)
  }

  test("Ivf.fit with no k derives the cell count and assigns every vector") {
    val e = Tables.load(spark, dir, "embeddings")
    val eqf = operators.Ivf.quantize(e)
    val n = eqf.count()
    val model = operators.Ivf.fit(eqf) // k ≤ 0 → derived
    val expectedK = Sizing.deriveCells(n)
    // Every centroid id present exactly once; size = the derived k (empty
    // cells can only DROP in later Lloyd rounds — at fixture scale with
    // k=MinCells they don't).
    assert(model.cents.map(_._1) == (0 until model.cents.size),
      "centroid ids must be dense")
    assert(model.cents.size == expectedK, s"expected $expectedK cells, got ${model.cents.size}")
    val assigned = operators.Ivf.ranked(eqf, operators.Ivf.centsDF(spark, model.cents))
      .filter(col("rk") === 1).count()
    assert(assigned == n, "rk=1 must assign every vector to exactly one cell")
  }

  test("Ivf.fit all-defaults path: seed sample scales with derived k (k > seed target)") {
    // Re-aimed targets reproduce at fixture scale the geometry a real
    // corpus hits at n ≈ 16.7M rows with the DEFAULT targets: derived
    // k = ⌈n/cellTarget⌉ exceeds the seed-sample target. With a fixed
    // sample target (the pre-fix derivation) the expected sample
    // (≈ seedTarget rows) is smaller than k and seeds() must throw; the
    // k-scaled target keeps sample ≥ 2k by construction.
    val e = Tables.load(spark, dir, "embeddings")
    val eqf = operators.Ivf.quantize(e)
    val n = eqf.count() // 500 at sf0.001
    val cellTarget = 16L
    val seedTarget = 8L
    val kk = Sizing.deriveCells(n, cellTarget)
    assert(kk > seedTarget, s"test geometry broken: k=$kk must exceed seedTarget=$seedTarget")
    // the pre-fix derivation really is infeasible here: a mod aimed at
    // seedTarget rows alone yields an expected sample < k
    assert(n / math.max(1L, n / seedTarget) < kk)
    val mod = operators.Ivf.derivedSampleMod(n, kk, seedTarget)
    assert(n / mod >= kk, s"expected sample ${n / mod} must cover k=$kk seeds")
    val model = operators.Ivf.fit(eqf, cellTarget = cellTarget, seedTarget = seedTarget)
    assert(model.cents.size > seedTarget.toInt,
      s"fit must seed more cells (${model.cents.size}) than the un-scaled sample could (≤ $seedTarget)")
    // every vector still lands in exactly one of the fitted cells
    val assigned = operators.Ivf.ranked(eqf, operators.Ivf.centsDF(spark, model.cents))
      .filter(col("rk") === 1).count()
    assert(assigned == n)
  }

  test("srpRows with derived planes keeps bucket ids in range and buckets populated") {
    val e = Tables.load(spark, dir, "embeddings")
    val n = e.count()
    val pp = Sizing.derivePlanes(n)
    val rows = operators.Similarity.srpRows(e, planesPerTable = pp)
    val stats = rows.agg(
      min(col("bucket")).as("lo"), max(col("bucket")).as("hi"),
      count(lit(1)).as("cnt")).collect().head
    assert(stats.getAs[Number]("lo").longValue >= 0L)
    assert(stats.getAs[Number]("hi").longValue < (1L << pp),
      s"bucket id must stay below 2^$pp")
    // one row per (vector, table): the index is corpus × tables sized,
    // independent of the planes count
    assert(stats.getAs[Long]("cnt") == n * 16)
  }
}
