package graft.util

import org.apache.spark.sql.SparkSession

/** Stable string identity for a SparkSession, for memo maps that must not
  * strongly hold the session itself (a stopped session keyed by reference
  * stays reachable for the JVM's lifetime along with its state).
  */
object Sessions {

  /** The session's UUID when the concrete (classic) implementation exposes
    * it; identity hash as a fallback for other implementations. Either way
    * the key is a small string, never the session object.
    */
  def id(s: SparkSession): String =
    try org.apache.spark.sql.graft.Bridge.sessionUUID(s)
    catch { case _: ClassCastException =>
      "idhash-" + System.identityHashCode(s).toHexString }
}
