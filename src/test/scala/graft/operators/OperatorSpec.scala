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

  test("bucketed tables join without a shuffle exchange") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val d = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete(): Unit
        }
        rm(d)
      }
    }
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "o_b", "l_orderkey", 4)
    // force a sort-merge join so the test demonstrates bucket co-location
    // (a broadcast join would hide the shuffle question entirely)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "li_b", "o_b", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"), s"unexpected shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == li.join(o, "l_orderkey").count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
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
