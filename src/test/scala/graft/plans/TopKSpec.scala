package graft.plans

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("TopK.perKey equals the window row_number formulation") {
    val orders = Tables.orders(spark, sfDir)
    val custom = TopK.perKey(orders,
        keyCols = Seq("o_orderpriority"),
        ordering = Seq($"o_totalprice", -$"o_orderkey"), // price desc, key asc
        k = 5)
      .select($"o_orderpriority", $"o_orderkey", $"rank")
      .as[(String, Long, Int)].collect().toSet
    val w = Window.partitionBy("o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val reference = orders
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"o_orderpriority", $"o_orderkey", $"rank")
      .as[(String, Long, Int)].collect().toSet
    assert(custom === reference)
  }

  test("physical plan uses TopKPerKeyExec with a hash exchange, no sort") {
    val orders = Tables.orders(spark, sfDir)
    val df = TopK.perKey(orders, Seq("o_orderpriority"),
      Seq($"o_totalprice", -$"o_orderkey"), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Sort "), plan)
  }

  test("ranks are dense 1..k and ordered by the ranking struct") {
    val orders = Tables.orders(spark, sfDir)
    val out = TopK.perKey(orders, Seq("o_orderpriority"),
        Seq($"o_totalprice", -$"o_orderkey"), 4)
      .select($"o_orderpriority", $"rank", $"o_totalprice")
      .as[(String, Int, Double)].collect()
    out.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.length))
      val byRank = rows.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }
}
