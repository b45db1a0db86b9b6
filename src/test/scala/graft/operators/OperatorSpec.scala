package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("salted join result equals plain join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val p = spark.read.parquet(s"$sf/part.parquet")
    val salted = Skew.saltedJoin(li, p, "l_partkey", "p_partkey",
        col("l_orderkey") * 10 + col("l_linenumber"), salt = 8)
      .groupBy("p_brand").count().orderBy("p_brand").collect().toSeq
    val plain = li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").count().orderBy("p_brand").collect().toSeq
    assert(salted == plain)
  }

  test("SQL registration: xml_children usable from spark.sql") {
    graft.Register.all(spark)
    import spark.implicits._
    Seq("<r><a>1</a><b>2</b><a>3</a></r>").toDF("x")
      .createOrReplaceTempView("t")
    val got = spark.sql(
      "SELECT transform(xml_children(x, 'a', true), c -> c.value) AS vs " +
        "FROM t").as[Seq[String]].head()
    assert(got == Seq("1", "3"))
    val ev = spark.sql(
      "SELECT xml_element_value('<k>hi <b/> there</k>')").as[String].head()
    assert(ev == "hi <b /> there")
  }
}
