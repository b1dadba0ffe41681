package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Format-independent distributed read of a dense N-D grid as long-form
  * rows — the machinery shared by the classic NetCDF reader ([[NetCdf]])
  * and the NetCDF-4/HDF5 reader ([[Hdf5]]): CF conventions (time units,
  * scale/offset/fill), open-time pushdown masks (timeRange on the CF time
  * axis, bbox on lat/lon axes with the antimeridian OR), outer-slice task
  * pruning, and the inner-odometer row construction.
  *
  * Scale shape: the format layer parses its metadata on the driver and
  * supplies a serializable [[GridCube.SlabReader]] factory; executors open
  * their own handle and seek straight to the byte ranges of their outer
  * slices — the parquet-row-group access pattern, whatever the container.
  */
private[ingest] object GridCube {

  /** One cube axis: name, length, optional coordinate values (unpacked
    * doubles), optional CF time decode (seconds-per-unit, epoch micros).
    */
  final case class Axis(name: String, len: Int,
                        coord: Option[Array[Double]],
                        cfTime: Option[(Double, Long)])

  /** CF value unpacking: `raw * scale + offset`, fill → null. */
  final case class Unpack(scale: Double, offset: Double,
                          fill: Option[Double]) {
    def apply(raw: Double): java.lang.Double =
      if (fill.exists(f => f == raw || (f.isNaN && raw.isNaN))) null
      else raw * scale + offset
  }

  /** Executor-side slab access: decoded doubles of outer-slice `i0` of
    * variable `vi`, row-major over the inner dimensions.
    */
  trait SlabReader extends java.io.Closeable {
    def slab(vi: Int, i0: Int): Array[Double]
  }

  /** Accepted spellings of the spatial axes — the reference's convention
    * probe (`netcdf_reader.py:93-111`).
    */
  val LatNames = Set("lat", "latitude", "y")
  val LonNames = Set("lon", "longitude", "x")

  /** CF epoch timestamp → epoch micros. Real CF files carry epochs like
    * `1990-01-01`, `1990-1-1 0:0:0.0`, `1990-01-01 00:00:00-6:00`,
    * `1990-01-01T00:00:00+05:30` — single-digit fields and ±hh[:mm]
    * offsets included — so this parses the components explicitly instead
    * of handing a doctored string to `Instant.parse` (which rejects
    * one-digit fields and any string with both an offset and an appended
    * 'Z'). No offset ⇒ UTC, per CF.
    */
  private val CfEpochRe =
    """^(\d{1,4})-(\d{1,2})-(\d{1,2})(?:[T ](\d{1,2}):(\d{1,2})(?::(\d{1,2}(?:\.\d+)?))?)?\s*(Z|[+-]\d{1,2}(?::?\d{2})?)?$""".r

  def parseEpochMicros(raw: String): Option[Long] =
    CfEpochRe.findFirstMatchIn(raw.trim).flatMap { m =>
      scala.util.Try {
        val secFrac = Option(m.group(6)).map(_.toDouble).getOrElse(0.0)
        val secs = secFrac.toInt
        val fracMicros = math.round((secFrac - secs) * 1e6)
        val off = Option(m.group(7)) match {
          case None | Some("Z") => java.time.ZoneOffset.UTC
          case Some(o) =>
            val neg = o.charAt(0) == '-'
            val body = o.substring(1).replace(":", "")
            val (h, mn) =
              if (body.length <= 2) (body.toInt, 0)
              else (body.dropRight(2).toInt, body.takeRight(2).toInt)
            java.time.ZoneOffset.ofHoursMinutes(
              if (neg) -h else h, if (neg) -mn else mn)
        }
        val odt = java.time.OffsetDateTime.of(
          m.group(1).toInt, m.group(2).toInt, m.group(3).toInt,
          Option(m.group(4)).map(_.toInt).getOrElse(0),
          Option(m.group(5)).map(_.toInt).getOrElse(0),
          secs, 0, off)
        odt.toInstant.getEpochSecond * 1000000L + fracMicros
      }.toOption
    }

  /** Parse `"<interval> since <epoch>"` time units → seconds-per-unit and
    * epoch micros (reference conventions probe `ingest/netcdf_reader.py:
    * 80-111`). Returns None when the units string is not CF time.
    */
  def cfTimeUnits(units: String): Option[(Double, Long)] = {
    val m = "(?i)^\\s*(seconds?|minutes?|hours?|days?)\\s+since\\s+(.+)$".r
      .findFirstMatchIn(units)
    m.flatMap { mm =>
      val per = mm.group(1).toLowerCase match {
        case s if s.startsWith("second") => 1.0
        case s if s.startsWith("minute") => 60.0
        case s if s.startsWith("hour") => 3600.0
        case _ => 86400.0
      }
      parseEpochMicros(mm.group(2)).map(epochMicros => (per, epochMicros))
    }
  }

  def parseInstantMicros(s: String): Long =
    parseEpochMicros(s).getOrElse(
      sys.error(s"unparseable timestamp bound '$s' (expected ISO date[/time][offset])"))

  /** Long-form distributed read: one row per grid cell, one column per
    * axis (coordinate values; CF time axes become TIMESTAMP) and one
    * DOUBLE column per variable (unpacked, fill → null).
    *
    * Pushdown at open, like the reference's lazy reader (S2,
    * `netcdf_reader.py:34-77`): `timeRange` (inclusive ISO bounds) prunes
    * along the CF-decoded time axis and `bbox` = (west, south, east,
    * north) along lat/lon axes, ANTIMERIDIAN included (west > east wraps
    * into an OR, `netcdf_reader.py:147-154`). A pruned OUTER slice is
    * never read — its byte range is skipped entirely, the grid analog of
    * partition pruning; pruned inner coordinates are masked before row
    * construction, so the filter costs index lookups, not rows. Each
    * supplied predicate must BIND to an axis or the read fails loudly.
    */
  def read(spark: SparkSession, pathLabel: String,
           axes: IndexedSeq[Axis],
           varNames: Seq[String],
           unpacks: Seq[Unpack],
           mkReader: () => SlabReader,
           numPartitions: Int,
           timeRange: Option[(String, String)],
           bbox: Option[(Double, Double, Double, Double)]): DataFrame = {
    val p = plan(pathLabel, axes, varNames, unpacks, timeRange, bbox)
    val parts = if (numPartitions > 0) numPartitions
      else math.max(1,
        math.min(p.selected.length, spark.sparkContext.defaultParallelism))
    val axesB = axes // captured in the closure (names + coord values + cf)
    val unpacksB = unpacks.toIndexedSeq
    val masksB = p.innerMasks
    val anyInnerB = p.anyInnerFilter
    val rowsRdd = spark.sparkContext
      .parallelize(p.selected.map(_.toLong), math.max(parts, 1))
      .mapPartitions(slices =>
        rowsFor(axesB, unpacksB, mkReader(), slices.map(_.toInt),
          masksB, anyInnerB))
    spark.createDataFrame(rowsRdd, p.schema)
  }

  /** Decode a whole grid file in THIS JVM (driver or inside one task) —
    * the same plan, pushdown validation, and row semantics as [[read]],
    * minus the slice fan-out. This is the per-file unit the streaming
    * archive source runs inside `flatMap`: a micro-batch of F new files
    * becomes F parallel single-file decodes. Whole-file single-task decode
    * is the right grain there (archive files are slab-sized); a huge
    * standalone file still goes through [[read]]'s outer-slice fan-out.
    */
  def localRows(pathLabel: String,
                axes: IndexedSeq[Axis],
                varNames: Seq[String],
                unpacks: Seq[Unpack],
                mkReader: () => SlabReader,
                timeRange: Option[(String, String)],
                bbox: Option[(Double, Double, Double, Double)]): (StructType, Iterator[Row]) = {
    val p = plan(pathLabel, axes, varNames, unpacks, timeRange, bbox)
    (p.schema, rowsFor(axes, unpacks.toIndexedSeq, mkReader(),
      p.selected.iterator, p.innerMasks, p.anyInnerFilter))
  }

  /** The long-form schema [[read]]/[[localRows]] produce for these axes and
    * variables — static, so a streaming source can declare it up front.
    */
  def schemaOf(axes: IndexedSeq[Axis], varNames: Seq[String]): StructType =
    StructType(
      axes.map {
        // TimestampType requires coord AND cfTime, matching rowsFor's
        // arms exactly: an Axis with cfTime but no coord values emits a
        // Long position there, so declaring Timestamp here would fail at
        // createDataFrame with a type-mismatch (or corrupt the column)
        case Axis(dn, _, Some(_), Some(_)) => StructField(dn, TimestampType, nullable = false)
        case Axis(dn, _, Some(_), None) => StructField(dn, DoubleType, nullable = false)
        case Axis(dn, _, None, _) => StructField(dn, LongType, nullable = false)
      } ++ varNames.map(v => StructField(v, DoubleType, nullable = true)))

  private final case class Plan(schema: StructType, selected: IndexedSeq[Int],
                                innerMasks: IndexedSeq[Array[Boolean]],
                                anyInnerFilter: Boolean)

  private def plan(pathLabel: String, axes: IndexedSeq[Axis],
                   varNames: Seq[String], unpacks: Seq[Unpack],
                   timeRange: Option[(String, String)],
                   bbox: Option[(Double, Double, Double, Double)]): Plan = {
    require(axes.nonEmpty, "scalar variables have no grid to unravel")
    require(varNames.length == unpacks.length, "one Unpack per variable")
    val dimLens = axes.map(_.len).toArray

    var timeBound = false
    var latBound = false
    var lonBound = false
    val dimMasks: IndexedSeq[Array[Boolean]] = axes.zipWithIndex.map {
      case (ax, d) =>
        val len = dimLens(d)
        val keep = Array.fill(len)(true)
        (ax.coord, ax.cfTime) match {
          case (Some(vsArr), Some((perSec, epochMicros))) if timeRange.isDefined =>
            timeBound = true
            val lo = parseInstantMicros(timeRange.get._1)
            val hi = parseInstantMicros(timeRange.get._2)
            var i = 0
            while (i < len) {
              val micros = epochMicros + math.round(vsArr(i) * perSec * 1e6)
              keep(i) = micros >= lo && micros <= hi
              i += 1
            }
          case (Some(vsArr), None) if bbox.isDefined && LatNames(ax.name.toLowerCase) =>
            latBound = true
            val (_, south, _, north) = bbox.get
            var i = 0
            while (i < len) { keep(i) = vsArr(i) >= south && vsArr(i) <= north; i += 1 }
          case (Some(vsArr), None) if bbox.isDefined && LonNames(ax.name.toLowerCase) =>
            lonBound = true
            val (west, _, east, _) = bbox.get
            var i = 0
            while (i < len) {
              keep(i) =
                if (west <= east) vsArr(i) >= west && vsArr(i) <= east
                else vsArr(i) >= west || vsArr(i) <= east // antimeridian OR
              i += 1
            }
          case _ => ()
        }
        keep
    }
    val dimNames = axes.map(_.name)
    require(timeRange.isEmpty || timeBound,
      s"$pathLabel: timeRange pushdown bound to no dimension — no coordinate " +
        s"variable with CF time units among dims ${dimNames.mkString(", ")}")
    require(bbox.isEmpty || (latBound && lonBound),
      s"$pathLabel: bbox pushdown bound to " +
        (if (latBound) "no longitude axis" else if (lonBound) "no latitude axis"
         else "neither a latitude nor a longitude axis") +
        s" — recognized names are ${(LatNames ++ LonNames).mkString("/")}; " +
        s"dims are ${dimNames.mkString(", ")}")

    val innerCount = dimLens.drop(1).map(_.toLong).product
    require(innerCount < Int.MaxValue, "inner slab too large for one task")
    // outer-dimension pruning: unselected slices never become tasks and
    // their byte ranges are never read
    val selected = (0 until dimLens(0)).filter(dimMasks(0))
    val innerMasks = dimMasks.drop(1)
    Plan(schemaOf(axes, varNames), selected, innerMasks,
      innerMasks.exists(_.exists(k => !k)))
  }

  /** Decode the given outer slices through `reader` as long-form rows —
    * runs inside each [[read]] task and inside [[localRows]]. Owns the
    * reader: closes it on drain AND on task completion (limit/take/show
    * terminate iterators early and would otherwise leak the handle).
    */
  private def rowsFor(axes: IndexedSeq[Axis],
                      unpacks: IndexedSeq[Unpack],
                      reader: SlabReader,
                      slices: Iterator[Int],
                      innerMasks: IndexedSeq[Array[Boolean]],
                      anyInnerFilter: Boolean): Iterator[Row] = {
    val nVars = unpacks.length
    val innerLens = axes.drop(1).map(_.len).toArray
    val innerCount = innerLens.map(_.toLong).product
    var closed = false
    def closeOnce(): Unit = if (!closed) { closed = true; reader.close() }
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
    val slabs = new Array[Array[Double]](nVars)
    new Iterator[Row] {
      private var rem: Iterator[Row] = Iterator.empty
      override def hasNext: Boolean = {
        while (!rem.hasNext && slices.hasNext) rem = sliceRows(slices.next())
        if (!rem.hasNext && !slices.hasNext) { closeOnce(); false } else true
      }
      override def next(): Row = rem.next()
      private def sliceRows(i0: Int): Iterator[Row] = {
        var vi = 0
        while (vi < nVars) { slabs(vi) = reader.slab(vi, i0); vi += 1 }
        val idx = new Array[Int](innerLens.length)
        var flat = 0
        Iterator.continually {
          // inner-coordinate pushdown: masked positions skip row
          // construction entirely (index lookups, no allocation)
          var keep = true
          if (anyInnerFilter) {
            var m = 0
            while (keep && m < idx.length) {
              keep = innerMasks(m)(idx(m)); m += 1
            }
          }
          val row: Row = if (!keep) null
          else {
            val fields = new Array[Any](axes.length + nVars)
            var d = 0
            while (d < axes.length) {
              val pos = if (d == 0) i0 else idx(d - 1)
              fields(d) = axes(d) match {
                case Axis(_, _, Some(vals), Some((perSec, epochMicros))) =>
                  val micros = epochMicros + math.round(vals(pos) * perSec * 1e6)
                  java.time.Instant.ofEpochSecond(
                    Math.floorDiv(micros, 1000000L),
                    Math.floorMod(micros, 1000000L) * 1000L)
                case Axis(_, _, Some(vals), None) => vals(pos)
                case Axis(_, _, None, _) => pos.toLong
              }
              d += 1
            }
            var vj = 0
            while (vj < nVars) {
              fields(axes.length + vj) = unpacks(vj)(slabs(vj)(flat))
              vj += 1
            }
            Row.fromSeq(fields.toIndexedSeq)
          }
          // increment the inner odometer
          flat += 1
          var k = idx.length - 1
          var carry = true
          while (k >= 0 && carry) {
            idx(k) += 1
            if (idx(k) == innerLens(k)) idx(k) = 0 else carry = false
            k -= 1
          }
          row
        }.take(innerCount.toInt).filter(_ != null)
      }
    }
  }
}
