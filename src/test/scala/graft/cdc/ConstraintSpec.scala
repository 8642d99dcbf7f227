package graft.cdc

import graft.SparkSpec

/** Write-side CHECK constraints: ADD validates existing data, every
  * append/upsert batch is all-or-nothing against all registered
  * checks, SQL null semantics (a row passes unless the expression is
  * definitively false), and the ALTER TABLE surface round-trips
  * through the catalog.
  */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = s"target/test_tmp/ck_$name"
    MergeTable.drop(root)
    root
  }

  test("violating upsert batch is rejected atomically, table unchanged") {
    val t = MergeTable.createIfAbsent(spark, fresh("upsert"), Seq("id"),
      initial = Some(Seq((1L, 10L), (2L, 20L)).toDF("id", "v")))
    t.addConstraint("v_pos", "v > 0")
    val vBefore = t.versions().max
    val e = intercept[ConstraintViolationException] {
      t.upsert(Seq((3L, 30L), (4L, -1L)).toDF("id", "v"))
    }
    assert(e.getMessage.contains("v_pos") && e.getMessage.contains("1 row"))
    assert(t.versions().max === vBefore, "a rejected batch committed")
    assert(t.read().count() === 2)
    // a clean batch still lands
    t.upsert(Seq((3L, 30L)).toDF("id", "v"))
    assert(t.read().count() === 3)
  }

  test("append enforces too; null passes CHECK; drop re-allows") {
    val t = MergeTable.createIfAbsent(spark, fresh("append"), Seq("id"),
      initial = Some(Seq((1L, Some(10L))).toDF("id", "v")))
    t.addConstraint("v_pos", "v > 0")
    intercept[ConstraintViolationException] {
      t.append(Seq((2L, Some(0L))).toDF("id", "v"))
    }
    // SQL CHECK semantics: null is not a violation
    t.append(Seq((2L, None: Option[Long])).toDF("id", "v"))
    assert(t.read().count() === 2)
    t.dropConstraint("v_pos")
    t.append(Seq((3L, Some(-5L))).toDF("id", "v"))
    assert(t.read().count() === 3)
  }

  test("ADD CONSTRAINT proves existing data first") {
    val t = MergeTable.createIfAbsent(spark, fresh("existing"), Seq("id"),
      initial = Some(Seq((1L, -1L)).toDF("id", "v")))
    val e = intercept[ConstraintViolationException] {
      t.addConstraint("v_pos", "v > 0")
    }
    assert(e.getMessage.contains("existing"))
    assert(t.constraints.isEmpty)
  }

  test("constrained column absent from an evolving batch passes as null") {
    val t = MergeTable.createIfAbsent(spark, fresh("evolve"), Seq("id"),
      initial = Some(Seq((1L, 5L)).toDF("id", "v")))
    t.addConstraint("v_pos", "v > 0")
    // batch without v: stored rows get null v, which CHECK permits
    t.upsert(Seq((2L, "x")).toDF("id", "w"))
    assert(t.read().count() === 2)
  }

  test("multiple constraints all checked in one pass; names independent") {
    val t = MergeTable.createIfAbsent(spark, fresh("multi"), Seq("id"),
      initial = Some(Seq((1L, 10L, "a")).toDF("id", "v", "s")))
    t.addConstraint("v_pos", "v > 0")
    t.addConstraint("s_nonempty", "length(s) > 0")
    val e = intercept[ConstraintViolationException] {
      t.upsert(Seq((2L, 5L, "")).toDF("id", "v", "s"))
    }
    assert(e.getMessage.contains("s_nonempty"))
    intercept[IllegalArgumentException] { t.addConstraint("v_pos", "v > 1") }
    intercept[IllegalArgumentException] { t.dropConstraint("nope") }
  }

  test("constraints survive reopen and reach every writer instance") {
    val root = fresh("reopen")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, 1L)).toDF("id", "v")))
    t.addConstraint("v_pos", "v > 0")
    val t2 = MergeTable.open(spark, root)
    intercept[ConstraintViolationException] {
      t2.upsert(Seq((2L, -2L)).toDF("id", "v"))
    }
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT works through the catalog") {
    val wh = spark.conf.get("spark.sql.catalog.graft.root")
    val root = s"$wh/db/ck_sql"
    MergeTable.drop(root)
    spark.sql("DROP TABLE IF EXISTS graft.db.ck_sql")
    MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, 10L)).toDF("id", "v")))
    spark.sql("ALTER TABLE graft.db.ck_sql ADD CONSTRAINT v_pos CHECK (v > 0)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.db.ck_sql VALUES (2, -3)")
    }
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
    assert(e.isInstanceOf[ConstraintViolationException] ||
      rootCause(e).isInstanceOf[ConstraintViolationException], e.toString)
    spark.sql("ALTER TABLE graft.db.ck_sql DROP CONSTRAINT v_pos")
    spark.sql("INSERT INTO graft.db.ck_sql VALUES (2, -3)")
    assert(spark.sql("SELECT count(*) FROM graft.db.ck_sql").head().getLong(0) === 2L)
  }
}
