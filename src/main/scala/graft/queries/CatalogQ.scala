package graft.queries

import graft.model.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dataset-discovery catalog over the driver tables. */
object CatalogQ extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_catalog" -> ((s, dir) =>
      Catalog.build(s, dir, Seq("lineitem", "orders", "events", "documents")))
  )

  def oracles: Map[String, String] = Map(
    "q_catalog" ->
      """SELECT 'lineitem' AS dataset_id, count(*) AS n_rows, 11 AS n_columns,
        |  'l_discount,l_extendedprice,l_linenumber,l_linestatus,l_orderkey,l_partkey,l_quantity,l_returnflag,l_shipdate,l_suppkey,l_tax'
        |    AS columns,
        |  CAST(min(l_shipdate) AS DATE) AS ts_min,
        |  CAST(max(l_shipdate) AS DATE) AS ts_max,
        |  count(DISTINCT l_shipdate) AS n_timesteps
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders', count(*), 6,
        |  'o_custkey,o_orderdate,o_orderkey,o_orderpriority,o_orderstatus,o_totalprice',
        |  CAST(min(o_orderdate) AS DATE), CAST(max(o_orderdate) AS DATE),
        |  count(DISTINCT o_orderdate)
        |FROM orders
        |UNION ALL
        |SELECT 'events', count(*), 6,
        |  'event_id,event_type,props,ts,user_id,value',
        |  CAST(min(ts) AS DATE), CAST(max(ts) AS DATE),
        |  count(DISTINCT CAST(ts AS TIMESTAMP))
        |FROM events
        |UNION ALL
        |SELECT 'documents', count(*), 5,
        |  'doc_id,lang,n_chars,source,text',
        |  NULL, NULL, NULL
        |FROM documents""".stripMargin
  )
}
