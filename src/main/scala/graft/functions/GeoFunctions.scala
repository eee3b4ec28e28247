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

  /** Point-in-polygon by even-odd ray casting — handles NON-convex rings
    * (reference types/geofilter.go:212 Contains via S2 loops accepts any
    * simple polygon, not just convex ones). Integer-exact: the crossing
    * comparison is cross-multiplied by the edge's (plan-time constant)
    * y-direction, so no division ever happens. Horizontal edges never
    * count; vertices follow the half-open `[ymin, ymax)` rule — the same
    * deterministic convention the oracle SQL encodes.
    */
  def pointInRing(x: Column, y: Column, verts: Seq[(Long, Long)]): Column = {
    val crossings = verts.indices.map { i =>
      val (x1, y1) = verts(i)
      val (x2, y2) = verts((i + 1) % verts.length)
      val d = y2 - y1
      if (d == 0L) lit(0)
      else {
        val span =
          if (d > 0) y >= lit(y1) && y < lit(y2)
          else y >= lit(y2) && y < lit(y1)
        val lhs = (x - lit(x1)) * lit(d)
        val rhs = lit(x2 - x1) * (y - lit(y1))
        val cross = if (d > 0) lhs < rhs else lhs > rhs
        when(span && cross, 1).otherwise(0)
      }
    }.reduce(_ + _)
    crossings % 2 === 1
  }

  /** Multi-ring polygon (GeoJSON layout): inside the outer ring and in
    * none of the holes.
    */
  def pointInRings(x: Column, y: Column,
      rings: Seq[Seq[(Long, Long)]]): Column =
    rings.tail.foldLeft(pointInRing(x, y, rings.head)) { (acc, hole) =>
      acc && !pointInRing(x, y, hole)
    }

  /** Parse a GeoJSON `Polygon` / `MultiPolygon` literal into polygons of
    * integer-vertex rings (ring 0 = outer, rest = holes; the closing
    * duplicate vertex is dropped). The reference stores geo predicates as
    * GeoJSON values (types/geofilter.go go-geom decode); this is the
    * exact-arithmetic planar tier of that surface.
    */
  def geoJsonPolygons(js: String): Seq[Seq[Seq[(Long, Long)]]] = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(js)
    def ring(n: com.fasterxml.jackson.databind.JsonNode): Seq[(Long, Long)] = {
      val vs = (0 until n.size()).map { i =>
        (n.get(i).get(0).asLong(), n.get(i).get(1).asLong())
      }
      if (vs.length > 1 && vs.head == vs.last) vs.dropRight(1) else vs
    }
    def poly(n: com.fasterxml.jackson.databind.JsonNode) =
      (0 until n.size()).map(i => ring(n.get(i)))
    root.get("type").asText() match {
      case "Polygon" => Seq(poly(root.get("coordinates")))
      case "MultiPolygon" =>
        val cs = root.get("coordinates")
        (0 until cs.size()).map(i => poly(cs.get(i)))
      case other =>
        throw new IllegalArgumentException(s"unsupported GeoJSON type $other")
    }
  }

  /** within(point, GeoJSON literal): inside ANY member polygon
    * (MultiPolygon = union), holes excluded.
    */
  def withinGeoJson(x: Column, y: Column, js: String): Column =
    geoJsonPolygons(js).map(pointInRings(x, y, _)).reduce(_ || _)

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
