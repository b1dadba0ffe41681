package graft.queries

import graft.ingest.NetCdf
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1-parity on-ramp through the oracle gate: lineitem-derived grid →
  * aggregate → written to a REAL NetCDF classic file (CF time units,
  * _FillValue for absent cells) → re-read distributed by [[NetCdf.read]]
  * → re-aggregated — and DuckDB replays the whole thing from the parquet
  * tables, so a byte-layout bug anywhere in writer or reader shows up as
  * a hash mismatch, not just a unit-test failure. (Reference:
  * `ingest/netcdf_reader.py:13-77`, conventions probe `:80-111`.)
  */
object NetCdfQ extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_netcdf_roundtrip" -> ((s, dir) => {
      // the ApiQ lineitem grid, rolled up per (ship year, cell)
      val cells = Tables.lineitem(s, dir)
        .withColumn("lat", (col("l_partkey") % 18 * 10 - 85).cast("double"))
        .withColumn("lon", (col("l_suppkey") % 36 * 10 - 175).cast("double"))
        .groupBy(year(col("l_shipdate")).as("ship_year"), col("lat"), col("lon"))
        .agg(count(lit(1)).cast("double").as("n"), avg(col("l_quantity")).as("mean_qty"))
        .collect() // bounded: ≤ 7 years × 18 lats × 36 lons = 4536 rows at ANY sf
      val years = cells.map(_.getInt(0)).distinct.sorted
      val lats = (0 until 18).map(i => i * 10.0 - 85)
      val lons = (0 until 36).map(i => i * 10.0 - 175)
      val yIdx = years.zipWithIndex.toMap
      val Fill = -9999.0
      val nVals = Array.fill(years.length * 18 * 36)(Fill)
      val qVals = Array.fill(years.length * 18 * 36)(Fill)
      cells.foreach { r =>
        val i = (yIdx(r.getInt(0)) * 18 + ((r.getDouble(1) + 85) / 10).round.toInt) * 36 +
          ((r.getDouble(2) + 175) / 10).round.toInt
        nVals(i) = r.getDouble(3); qVals(i) = r.getDouble(4)
      }
      val path = java.nio.file.Files
        .createTempDirectory("graft-nc").resolve("grid.nc").toString
      NetCdf.write(path,
        dims = Seq(NetCdf.Dim("time", years.length),
          NetCdf.Dim("lat", 18), NetCdf.Dim("lon", 36)),
        vars = Seq(
          (NetCdf.VarDef("time", Seq("time"), NetCdf.NcDouble,
            Seq("units" -> "days since 1970-01-01")),
            years.map(y => java.time.LocalDate.of(y, 1, 1).toEpochDay.toDouble)),
          (NetCdf.VarDef("lat", Seq("lat"), NetCdf.NcDouble,
            Seq("units" -> "degrees_north")), lats.toArray),
          (NetCdf.VarDef("lon", Seq("lon"), NetCdf.NcDouble,
            Seq("units" -> "degrees_east")), lons.toArray),
          (NetCdf.VarDef("n", Seq("time", "lat", "lon"), NetCdf.NcDouble,
            Seq("_FillValue" -> Fill)), nVals),
          (NetCdf.VarDef("mean_qty", Seq("time", "lat", "lon"), NetCdf.NcDouble,
            Seq("_FillValue" -> Fill, "units" -> "items")), qVals)),
        gatts = Seq("Conventions" -> "CF-1.8", "source" -> "graft lineitem grid"))
      // distributed re-read: CF time back to timestamps, fills back to null
      round6(NetCdf.read(s, path, Seq("n", "mean_qty"))
        .where(col("n").isNotNull)
        .select(year(col("time")).as("ship_year"), col("lat"), col("lon"),
          col("n").cast("long").as("n"), col("mean_qty")),
        "mean_qty")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_netcdf_roundtrip" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        |       CAST(l_partkey % 18 * 10 - 85 AS DOUBLE) AS lat,
        |       CAST(l_suppkey % 36 * 10 - 175 AS DOUBLE) AS lon,
        |       count(*) AS n,
        |       round(avg(l_quantity), 6) AS mean_qty
        |FROM lineitem
        |GROUP BY 1, 2, 3""".stripMargin
  )
}
