package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `SparkEntry.oracleSql` to JSON WITHOUT a SparkSession (the map is
  * pure string constants) — the fast front half of the oracle output-type
  * audit: pair with `tools/audit_oracle_types.py`, which DESCRIBEs every
  * oracle against DuckDB and asserts each output column type is in the
  * Spark-exact, driver-safe whitelist. Run the pair when ADDING a gate,
  * before writing any Spark code: the r6 failure class (DuckDB
  * `sum(BIGINT)` returns HUGEINT, which the driver's typed hash rejects
  * even on equal values) is visible from the SQL alone.
  *
  * Usage: runMain graft.tools.DumpOracleSql [out.json]
  */
object DumpOracleSql {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    val sql = graft.SparkEntry.oracleSql
    Files.writeString(Paths.get(out), graft.JsonUtil.obj(sql))
    println(s"[oracle-sql] ${sql.size} queries -> $out")
  }
}
