package graft

/** The driver's t1 smoke gate: entry() on sf0.001 must return rows > 0. */
class EntrySpec extends SparkSpec {
  test("entry() returns rows (driver t1 smoke)") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length > 0)
    assert(rows.head.schema.fieldNames.contains("sum_qty"))
  }

  test("every declared oracle key has a query fn, and key names are unique") {
    val qs = SparkEntry.queries
    SparkEntry.oracleSql.keys.foreach(k =>
      assert(qs.contains(k), s"oracle without query: $k"))
    // duplicate keys would silently shadow each other in the Map — the def
    // lists must already be distinct
    val allKeys = Seq(
      ops.Relational.defs, ops.Temporal.defs,
      graft.connector.ConnectorQueries.defs, ops.Text.defs, ops.Dedup.defs,
      ops.Vector.defs, ops.Multimodal.defs, ops.Workload.defs,
      ops.Graph.defs).flatten.map(_.key)
    assert(allKeys.distinct.size == allKeys.size,
      s"duplicate query keys: ${allKeys.diff(allKeys.distinct)}")
    assert(qs.size == allKeys.size)
  }
}
