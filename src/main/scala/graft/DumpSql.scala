package graft
// throwaway: dump one oracle SQL for local DuckDB timing
object DumpSql {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sql = graft.SparkEntry.oracleSql(name)
    java.nio.file.Files.write(java.nio.file.Paths.get(args(1)),
      sql.getBytes("UTF-8"))
  }
}
