package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial operators over plain lat/lon double columns.
  *
  * Scale shape: every join here is grid-bucketed — points and POIs land
  * in `cellDeg`-degree grid cells, the POI side is replicated into its
  * 3×3 cell neighborhood (a broadcast of a 9-row offsets relation, NOT
  * a replication of the points side), and the pair space is ONE
  * equi-join on the cell id. No nested loop, no cross product; the
  * shuffle moves each side once and the per-task pair work is bounded
  * by local cell density. This is the standard spatial-join
  * decomposition (grid partitioning as in SpatialSpark / Magellan);
  * the reference engine has no spatial surface, so the family is part
  * of the §2.B extension scope.
  *
  * Correctness contracts (checked mechanically, not by scaladoc):
  *   - the cell must dominate the radius in both axes at the worst
  *     latitude the data can contain (`maxAbsLatDeg`), else a
  *     within-radius pair could sit 2 cells apart and be missed —
  *     `require`d at plan time from the three scalars;
  *   - cell x-ids are MODULAR on a fixed 360/cellDeg grid width, so
  *     the antimeridian is an ordinary cell boundary — in-radius pairs
  *     straddling ±180 are found by the same one-ring argument as any
  *     other pair. This requires `cellDeg` to tile 360° exactly,
  *     `require`d in [[Geo.gridWidth]] (a sliver seam cell would
  *     silently break the ring guarantee).
  *
  * Determinism: distances are micro-quantized (`floor(d·1e6 + 0.5)`,
  * i.e. millimeter resolution) before any compare or argmin, so a
  * last-ulp libm divergence between engines cannot flip a radius gate
  * or a nearest-neighbor tie (the q177 Jaro–Winkler rule).
  */
object Geo {

  /** 2 × IAU mean Earth radius (6371.0088 km). */
  val EarthDiameterKm = 12742.0176

  /** Conservative km per degree of latitude (shortest meridian degree,
    * at the equator); a degree of longitude is this times cos(lat) or
    * wider at any latitude, so one constant bounds both axes.
    */
  val KmPerDegree = 110.567

  /** Haversine great-circle distance in km, micro-quantized to 1e-6 km
    * (≈ 1 mm) so both engines agree bit-for-bit. All four inputs in
    * decimal degrees.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val a = pow(sin(radians(lat2 - lat1) / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2)
    floor(lit(EarthDiameterKm) * asin(sqrt(a)) * 1000000.0 + 0.5) / 1000000.0
  }

  /** The guaranteed-coverage radius of one grid ring: any pair closer
    * than this is at most one cell apart in each axis, so the 3×3
    * neighborhood finds it.
    */
  def guaranteeKm(cellDeg: Double, maxAbsLatDeg: Double): Double =
    cellDeg * KmPerDegree * math.cos(math.toRadians(maxAbsLatDeg))

  /** All (point, poi) pairs within `radiusKm`, as a single grid-cell
    * equi-join. POIs are replicated ×9 (their own cell plus the ring),
    * points are not replicated at all — on a 100 TB point table the
    * big side moves exactly once. Output: `point_id, poi_id, dist_km`
    * (quantized), one row per in-radius pair.
    */
  def gridRadiusJoin(
      points: DataFrame, pointId: Column, pLat: Column, pLon: Column,
      pois: DataFrame, poiId: Column, qLat: Column, qLon: Column,
      radiusKm: Double, cellDeg: Double, maxAbsLatDeg: Double): DataFrame = {
    require(radiusKm > 0 && cellDeg > 0 && maxAbsLatDeg < 90.0,
      s"degenerate geometry: radius=$radiusKm cell=$cellDeg maxLat=$maxAbsLatDeg")
    require(guaranteeKm(cellDeg, maxAbsLatDeg) >= radiusKm,
      f"cell $cellDeg%.3f° covers only ${guaranteeKm(cellDeg, maxAbsLatDeg)}%.1f km at " +
        f"latitude $maxAbsLatDeg%.1f° — below radius $radiusKm%.1f km; widen cellDeg " +
        "or the 3x3 neighborhood misses in-radius pairs")
    candidates(points, pointId, pLat, pLon, pois, poiId, qLat, qLon, cellDeg)
      .filter(col("dist_km") <= radiusKm)
      .select(col("point_id"), col("poi_id"), col("dist_km"))
  }

  /** Nearest POI per point over the same 3×3 neighborhood, plus the
    * honesty bit a production pipeline routes on: `guaranteed` is true
    * iff the found distance is within [[guaranteeKm]], i.e. no POI
    * outside the searched ring can possibly be closer. Points whose
    * neighborhood holds no POI are absent (re-run those with a coarser
    * grid — the standard two-pass escape; at a fixed POI density the
    * unresolved fraction is a cell-size choice, not a data hazard).
    */
  def nearestPoi(
      points: DataFrame, pointId: Column, pLat: Column, pLon: Column,
      pois: DataFrame, poiId: Column, qLat: Column, qLon: Column,
      cellDeg: Double, maxAbsLatDeg: Double): DataFrame = {
    require(cellDeg > 0 && maxAbsLatDeg < 90.0, "degenerate geometry")
    val g = guaranteeKm(cellDeg, maxAbsLatDeg)
    candidates(points, pointId, pLat, pLon, pois, poiId, qLat, qLon, cellDeg)
      .groupBy(col("point_id"))
      // struct-min = lexicographic (dist, id): quantized distance first,
      // poi id as the deterministic tiebreak; partial-aggregates map-side
      .agg(min(struct(col("dist_km"), col("poi_id"))).as("__m"))
      .select(col("point_id"), col("__m.poi_id").as("poi_id"),
        col("__m.dist_km").as("dist_km"),
        (col("__m.dist_km") <= g).as("guaranteed"))
  }

  /** Grid-cell density clustering — the GriT/DBSCAN-lite decomposition
    * of density clustering that actually distributes: bucket points
    * into grid cells, keep cells with at least `minPts` points (the
    * core-cell test), and union 8-adjacent dense cells into clusters
    * via [[Graph.connectedComponents]]. Point-level DBSCAN's
    * neighborhood queries don't scale past one machine; at grid
    * resolution the cluster structure is the same picture (cells ARE
    * ε-neighborhoods) and every step is cell-bounded: ONE (cell)
    * aggregate over the points, an 8-offset self-join over the DENSE
    * cells only, and CC over the dense-cell graph. Cell x-ids wrap
    * modulo [[gridWidth]], so clusters crossing the antimeridian stay
    * connected (the module's standard seam treatment).
    *
    * Output, one row per dense cell: (cell_x, cell_y, n_points,
    * cluster_id) — cluster_id is the minimum encoded cell id of the
    * component, so labels are deterministic; isolated dense cells are
    * their own singleton cluster. Sparse cells (noise) are absent.
    */
  def gridDbscan(
      points: DataFrame, lat: Column, lon: Column,
      cellDeg: Double, minPts: Long): DataFrame = {
    require(minPts >= 1, s"gridDbscan: minPts >= 1 required, got $minPts")
    require(cellDeg >= 0.001, s"gridDbscan: cellDeg >= 0.001 required, got $cellDeg")
    val ss = points.sparkSession
    import ss.implicits._
    val w = gridWidth(cellDeg)
    val dense = points
      .filter(lat.isNotNull && lon.isNotNull)
      .select(wrapCx(floor(lon / cellDeg).cast("long"), w).as("cell_x"),
        floor(lat / cellDeg).cast("long").as("cell_y"))
      .groupBy($"cell_x", $"cell_y")
      .agg(count(lit(1)).as("n_points"))
      .filter($"n_points" >= minPts)
      // encoded id: unique, order-preserving within the grid — the
      // +100000 offset keeps cy non-negative down to cellDeg 0.001
      .withColumn("cell_id", (col("cell_y") + 100000L) * w + col("cell_x"))
    val offs = broadcast(
      (for { dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0 } yield (dx, dy))
        .toDF("__dx", "__dy"))
    val edges = dense.crossJoin(offs)
      .select(wrapCx(col("cell_x") + col("__dx"), w).as("cell_x"),
        (col("cell_y") + col("__dy")).as("cell_y"), col("cell_id").as("src"))
      .join(dense.select($"cell_x", $"cell_y", $"cell_id".as("dst")),
        Seq("cell_x", "cell_y"))
      .select(col("src"), col("dst"))
    val cc = Graph.connectedComponents(edges, "src", "dst")
      .withColumnRenamed("id", "cell_id")
    dense.join(cc, Seq("cell_id"), "left")
      .select($"cell_x", $"cell_y", $"n_points",
        coalesce(col("comp"), col("cell_id")).as("cluster_id"))
  }

  /** Grid width in cells: `cellDeg` must tile 360° exactly, or the
    * seam cell would be narrower than every other cell and the
    * one-ring guarantee would break right at the wrap (a pair within
    * radius could span the sliver cell and land 2 cells apart).
    */
  def gridWidth(cellDeg: Double): Long = {
    val w = math.round(360.0 / cellDeg)
    require(math.abs(w * cellDeg - 360.0) < 1e-9,
      s"cellDeg=$cellDeg does not evenly divide 360 - the antimeridian seam " +
        "cell would be narrower than the ring guarantee assumes; pick a " +
        "divisor of 360 (e.g. 1, 2, 2.5, 3, 4, 5, 6, ...)")
    w
  }

  /** Longitude cell id on the wrapping grid: ±180 map to the same
    * cell, and ring offsets applied before the wrap stay adjacent
    * across the seam — the modular-cell-id treatment that makes the
    * antimeridian an ordinary cell boundary. (Latitude cells need no
    * wrap; the poles are excluded by `maxAbsLatDeg < 90`.)
    */
  private def wrapCx(raw: Column, w: Long): Column =
    ((raw % w) + w) % w

  /** Shared candidate generator: one equi-join on (cell_x, cell_y)
    * between un-replicated points and ×9-replicated POIs, distance
    * attached. Null island (null coords) is dropped on both sides.
    * Cell x-ids wrap modulo [[gridWidth]], so pairs straddling ±180
    * are found like any cell-boundary pair; [[haversineKm]] needs no
    * wrap handling (sin²(Δlon/2) is 360°-periodic).
    */
  private def candidates(
      points: DataFrame, pointId: Column, pLat: Column, pLon: Column,
      pois: DataFrame, poiId: Column, qLat: Column, qLon: Column,
      cellDeg: Double): DataFrame = {
    val ss = points.sparkSession
    import ss.implicits._
    val w = gridWidth(cellDeg)
    val offs = broadcast(
      (for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)).toDF("__dx", "__dy"))
    val p = points
      .select(pointId.as("point_id"), pLat.as("__plat"), pLon.as("__plon"))
      .filter($"__plat".isNotNull && $"__plon".isNotNull)
      .withColumn("__cx", wrapCx(floor($"__plon" / cellDeg).cast("long"), w))
      .withColumn("__cy", floor($"__plat" / cellDeg).cast("long"))
    val q = pois
      .select(poiId.as("poi_id"), qLat.as("__qlat"), qLon.as("__qlon"))
      .filter($"__qlat".isNotNull && $"__qlon".isNotNull)
      .crossJoin(offs)
      .select($"poi_id", $"__qlat", $"__qlon",
        wrapCx(floor($"__qlon" / cellDeg).cast("long") + $"__dx", w).as("__cx"),
        (floor($"__qlat" / cellDeg).cast("long") + $"__dy").as("__cy"))
    p.join(q, Seq("__cx", "__cy"))
      .withColumn("dist_km", haversineKm($"__plat", $"__plon", $"__qlat", $"__qlon"))
  }
}
