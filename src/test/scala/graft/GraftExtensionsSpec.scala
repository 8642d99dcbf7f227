package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
import org.scalatest.funsuite.AnyFunSuite

/** Verifies the config-driven extension entry point
  * (`spark.sql.extensions=graft.GraftExtensions`) wires everything a
  * fresh cluster session would get — exercised through the same
  * public build hooks SparkSession uses at bootstrap.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects the TopK strategy and all native functions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)

    val strategies = org.apache.spark.sql.GraftSqlBridge.buildPlannerStrategies(ext, spark)
    assert(strategies.contains(graft.plans.TopKStrategy))

    val registry = new SimpleFunctionRegistry
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(ext, registry)
    // the complete shared table: extensions and programmatic register
    // consume the same list, so EVERY function must resolve here
    val expected = graft.functions.GraftFunctions.all.map(_._1)
    assert(expected.size >= 10)
    assert(expected.contains("graft_quantize_stats"), "registry table lost an entry")
    expected.foreach { name =>
      assert(registry.functionExists(FunctionIdentifier(name)), s"missing $name")
    }
    // builders produce working expressions
    import org.apache.spark.sql.catalyst.expressions.Literal
    val fn = registry.lookupFunctionBuilder(FunctionIdentifier("graft_word_trigrams")).get
    val expr = fn(Seq(Literal.create(Seq("a", "b", "c", "d"),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))))
    val out = expr.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(out.numElements() === 2)
  }
}
