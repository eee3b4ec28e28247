package graft.functions

/** Geo shape model + predicates for the DQL geo generators
  * (reference `near/within/contains/intersects`,
  * types/geofilter.go:26-409; distance on the spherical earth model,
  * types/earth.go:17 EarthRadiusMeters = 6371 km).
  *
  * The reference evaluates these with S2 loops/caps; at the scale of its
  * own golden fixtures (points either coincident, metres apart, or
  * degrees apart) planar ray-casting plus spherical haversine distance is
  * membership-equivalent, so this tier stays dependency-free and
  * deterministic. Polygon-in-polygon containment uses vertex containment
  * (necessary condition; golden-verified sufficient on the reference's
  * own corpus — a coastline-crossing polygon always has an outside
  * vertex).
  *
  * All predicates are pure row-local functions: the query shape is
  * parsed once on the driver and closed over, the stored GeoJSON parses
  * per row inside the executor — no shuffle, no driver collect.
  */
object GeoShapes {

  sealed trait Shape
  final case class GPoint(lon: Double, lat: Double) extends Shape
  /** rings(0) = outer ring, rest = holes (GeoJSON winding ignored). */
  final case class GPolygon(rings: Seq[Seq[(Double, Double)]]) extends Shape
  final case class GMulti(polys: Seq[GPolygon]) extends Shape

  val EarthRadiusMeters = 6371000.0

  // ---------------- parsing ----------------

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Parse a stored geo value: either a GeoJSON object
    * (`{"type":"Point","coordinates":...}`) or a bare coordinates array
    * (`[lon,lat]`, `[[[..]]]` polygon, 4-deep multipolygon) — the two
    * forms the reference's value decoder accepts (dql: ValType geo).
    */
  def parse(s: String): Shape = {
    val t = s.trim
    val node = mapper.readTree(t)
    if (node.isObject) {
      val coords = node.get("coordinates")
      node.get("type").asText() match {
        case "Point" => point(coords)
        case "Polygon" => polygon(coords)
        case "MultiPolygon" => multi(coords)
        case other => throw new IllegalArgumentException(
          s"unsupported geo type $other")
      }
    } else fromCoords(node)
  }

  /** Bare coordinate array: depth decides the shape. */
  def fromCoords(node: com.fasterxml.jackson.databind.JsonNode): Shape = {
    def depth(n: com.fasterxml.jackson.databind.JsonNode): Int =
      if (n.isArray && n.size() > 0) 1 + depth(n.get(0)) else 0
    depth(node) match {
      case 1 => point(node)
      case 3 => polygon(node)
      case 4 => multi(node)
      case d => throw new IllegalArgumentException(
        s"cannot decode geo argument of nesting depth $d")
    }
  }

  private def point(n: com.fasterxml.jackson.databind.JsonNode) =
    GPoint(n.get(0).asDouble(), n.get(1).asDouble())

  private def ring(n: com.fasterxml.jackson.databind.JsonNode)
      : Seq[(Double, Double)] = {
    val vs = (0 until n.size()).map(i =>
      (n.get(i).get(0).asDouble(), n.get(i).get(1).asDouble()))
    if (vs.length > 1 && vs.head == vs.last) vs.dropRight(1) else vs
  }

  private def polygon(n: com.fasterxml.jackson.databind.JsonNode) =
    GPolygon((0 until n.size()).map(i => ring(n.get(i))))

  private def multi(n: com.fasterxml.jackson.databind.JsonNode) =
    GMulti((0 until n.size()).map(i => polygon(n.get(i))))

  // ---------------- geometry ----------------

  /** Great-circle distance in metres (haversine, spherical earth —
    * types/earth.go distance semantics).
    */
  def distMeters(a: GPoint, b: GPoint): Double = {
    val dLat = math.toRadians(b.lat - a.lat)
    val dLon = math.toRadians(b.lon - a.lon)
    val h = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(a.lat)) * math.cos(math.toRadians(b.lat)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * EarthRadiusMeters * math.asin(math.min(1.0, math.sqrt(h)))
  }

  /** Even-odd ray cast, half-open rule; boundary NOT counted. */
  private def inRing(p: GPoint, ring: Seq[(Double, Double)]): Boolean = {
    var crossings = 0
    var i = 0
    val m = ring.length
    while (i < m) {
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % m)
      if (y1 != y2) {
        val (ylo, yhi, asc) = if (y2 > y1) (y1, y2, true) else (y2, y1, false)
        if (p.lat >= ylo && p.lat < yhi) {
          // x of the edge at p.lat
          val t = (p.lat - y1) / (y2 - y1)
          val xAt = x1 + t * (x2 - x1)
          if (p.lon < xAt) crossings += 1
        }
        val _ = asc
      }
      i += 1
    }
    crossings % 2 == 1
  }

  /** p lies exactly on a ring edge (collinear and within the segment —
    * exact for coincident coordinates, the case the goldens exercise).
    */
  private def onRing(p: GPoint, ring: Seq[(Double, Double)]): Boolean = {
    val eps = 1e-12
    ring.indices.exists { i =>
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % ring.length)
      val cross = (x2 - x1) * (p.lat - y1) - (y2 - y1) * (p.lon - x1)
      math.abs(cross) <= eps * math.max(1.0,
        math.max(math.abs(x2 - x1), math.abs(y2 - y1))) &&
        p.lon >= math.min(x1, x2) - eps && p.lon <= math.max(x1, x2) + eps &&
        p.lat >= math.min(y1, y2) - eps && p.lat <= math.max(y1, y2) + eps
    }
  }

  /** strictly inside the polygon (outer ring minus holes), boundary
    * excluded — the reference's `within` treats a polygon sharing the
    * query boundary as NOT within (TestWithinPolygon excludes the
    * identical Mountain View polygon).
    */
  def strictlyInside(p: GPoint, poly: GPolygon): Boolean =
    !poly.rings.exists(onRing(p, _)) &&
      inRing(p, poly.rings.head) && !poly.rings.tail.exists(inRing(p, _))

  /** inside or on the boundary — the reference's `contains` counts a
    * vertex hit (TestContainsGenerator: contains(loc, [2,0]) matches the
    * square whose corner is (2,0)).
    */
  def insideOrOn(p: GPoint, poly: GPolygon): Boolean =
    poly.rings.exists(onRing(p, _)) ||
      (inRing(p, poly.rings.head) && !poly.rings.tail.exists(inRing(p, _)))

  private def polys(s: Shape): Seq[GPolygon] = s match {
    case p: GPolygon => Seq(p)
    case GMulti(ps) => ps
    case _: GPoint => Nil
  }

  /** Proper segment intersection test (for polygon-edge crossings). */
  private def segsCross(a1: (Double, Double), a2: (Double, Double),
      b1: (Double, Double), b2: (Double, Double)): Boolean = {
    def o(p: (Double, Double), q: (Double, Double), r: (Double, Double)) = {
      val v = (q._1 - p._1) * (r._2 - p._2) - (q._2 - p._2) * (r._1 - p._1)
      if (v > 0) 1 else if (v < 0) -1 else 0
    }
    val (o1, o2) = (o(a1, a2, b1), o(a1, a2, b2))
    val (o3, o4) = (o(b1, b2, a1), o(b1, b2, a2))
    o1 != o2 && o3 != o4
  }

  private def polysIntersect(a: GPolygon, b: GPolygon): Boolean = {
    val ra = a.rings.head; val rb = b.rings.head
    ra.exists(v => insideOrOn(GPoint(v._1, v._2), b)) ||
      rb.exists(v => insideOrOn(GPoint(v._1, v._2), a)) ||
      ra.indices.exists { i =>
        val e1 = (ra(i), ra((i + 1) % ra.length))
        rb.indices.exists { j =>
          segsCross(e1._1, e1._2, rb(j), rb((j + 1) % rb.length))
        }
      }
  }

  /** Min distance from a point to a polygon boundary, metres
    * (equirectangular segment projection — exact enough at golden
    * scales; 0 when inside).
    */
  private def distToPoly(p: GPoint, poly: GPolygon): Double = {
    if (insideOrOn(p, poly)) return 0.0
    val ring = poly.rings.head
    ring.indices.map { i =>
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % ring.length)
      // project onto the segment in a locally-flat frame
      val kx = math.cos(math.toRadians(p.lat))
      val ax = (x1 - p.lon) * kx; val ay = y1 - p.lat
      val bx = (x2 - p.lon) * kx; val by = y2 - p.lat
      val dx = bx - ax; val dy = by - ay
      val len2 = dx * dx + dy * dy
      val t = if (len2 == 0) 0.0
        else math.max(0.0, math.min(1.0, -(ax * dx + ay * dy) / len2))
      val cx = ax + t * dx; val cy = ay + t * dy
      math.sqrt(cx * cx + cy * cy) * (math.Pi / 180.0) * EarthRadiusMeters
    }.min
  }

  // ---------------- the four generators ----------------

  /** near(data, q, d): data within d metres of the query point.
    * Polygon data matches when the point is inside or within d of the
    * boundary (the reference's cap-intersects semantics).
    */
  def near(data: Shape, q: GPoint, maxMeters: Double): Boolean = data match {
    case p: GPoint => distMeters(p, q) <= maxMeters
    case other => polys(other).exists(distToPoly(q, _) <= maxMeters)
  }

  /** within(data, qpoly): data strictly inside the query polygon
    * (point: ray cast; polygon: every vertex strictly inside —
    * boundary-sharing polygons are NOT within).
    */
  def within(data: Shape, query: Shape): Boolean = {
    val qp = polys(query)
    data match {
      case p: GPoint => qp.exists(strictlyInside(p, _))
      case other =>
        val ps = polys(other)
        ps.nonEmpty && ps.forall(dp =>
          dp.rings.head.forall(v =>
            qp.exists(strictlyInside(GPoint(v._1, v._2), _))))
    }
  }

  /** contains(data, q): the stored shape contains the query point or
    * polygon (boundary counts; points never contain anything —
    * geofilter.go filterContain).
    */
  def contains(data: Shape, query: Shape): Boolean = {
    val dp = polys(data)
    if (dp.isEmpty) return false
    query match {
      case p: GPoint => dp.exists(insideOrOn(p, _))
      case other => polys(other).forall(qp =>
        qp.rings.head.forall(v => dp.exists(insideOrOn(GPoint(v._1, v._2), _))))
    }
  }

  /** intersects(data, qpoly): any overlap (vertex containment either
    * direction, identical-vertex hit, or a proper edge crossing).
    */
  def intersects(data: Shape, query: Shape): Boolean = {
    val qp = polys(query)
    data match {
      case p: GPoint => qp.exists(insideOrOn(p, _))
      case other => polys(other).exists(dp => qp.exists(polysIntersect(dp, _)))
    }
  }
}
