package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo predicates (reference near/within/contains/intersects,
  * types/geofilter.go:26-409; S2 cell index tok/tok.go:265).
  *
  * Two tiers, mirroring the vector functions:
  *  - integer planar predicates (`planarNear`, `pointInConvexPoly`,
  *    `bboxIntersects`): exact int64 arithmetic — cross products and
  *    squared distances — so results are bit-reproducible across engines;
  *    these back the oracled queries. The reference's S2 cell prefilter
  *    is replaced by Parquet min/max pruning on the coordinate columns.
  *  - `haversineKm`: real spherical distance for geographic use
  *    (ScalaTest-verified; transcendental functions are not ulp-stable
  *    across libm implementations, so it stays out of the hash-compared
  *    oracle surface).
  */
object GeoFunctions {

  /** Squared planar distance on integer coordinates — exact. */
  def planarDist2(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)

  /** near(p, q, d): squared-distance threshold (exact ints). */
  def planarNear(x: Column, y: Column, qx: Long, qy: Long, d2: Long): Column =
    planarDist2(x, y, lit(qx), lit(qy)) < d2

  /** Point-in-convex-polygon via cross-product half-plane tests. Vertices
    * must be in counter-clockwise order; boundary counts as inside.
    */
  def pointInConvexPoly(x: Column, y: Column, verts: Seq[(Long, Long)]): Column =
    verts.indices.map { i =>
      val (x1, y1) = verts(i)
      val (x2, y2) = verts((i + 1) % verts.length)
      // cross((v2-v1), (p-v1)) >= 0
      (lit(x2 - x1) * (y - y1) - lit(y2 - y1) * (x - x1)) >= 0
    }.reduce(_ && _)

  /** contains(stored-geo, literal point): the stored square cell
    * [x, x+side]×[y, y+side] contains the query point — the dual of
    * `within` (reference types/geofilter.go:338 filterContain, polygon
    * contains point), exact ints, boundary counts as inside.
    */
  def boxContains(x: Column, y: Column, side: Long, qx: Long, qy: Long): Column =
    x <= lit(qx) && (x + lit(side)) >= lit(qx) &&
      y <= lit(qy) && (y + lit(side)) >= lit(qy)

  /** Axis-aligned bbox intersection (intersects analogue) — exact. */
  def bboxIntersects(xmin: Column, ymin: Column, xmax: Column, ymax: Column,
      qxmin: Long, qymin: Long, qxmax: Long, qymax: Long): Column =
    xmin <= qxmax && xmax >= qxmin && ymin <= qymax && ymax >= qymin

  /** Great-circle distance in km (spherical earth, R=6371.0088). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val r = 6371.0088
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * r) * asin(sqrt(a))
  }
}
