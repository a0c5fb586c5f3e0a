package graft.sources

import java.sql.DriverManager

import graft.SparkSpec
import graft.llm.StubLlm

/** Exercises the JDBC source against a real database: embedded Derby
  * (shipped with Spark for the Hive metastore) — no network, real JDBC
  * driver, real pushdown path.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val dbPath = "target/derby_jdbc_spec"
  private val url = s"jdbc:derby:$dbPath;create=true"

  private lazy val seeded: Unit = {
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    // a crashed prior run can leave a half-created database directory;
    // Derby's create=true then fails with "Directory already exists".
    // The db is a throwaway fixture — clear any stale remnant first
    // (service.properties missing = never fully booted).
    val dbDir = new java.io.File(dbPath)
    if (dbDir.isDirectory &&
        !new java.io.File(dbDir, "service.properties").isFile) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dbDir)
    }
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE products") catch { case _: Exception => }
      st.execute("CREATE TABLE products (id BIGINT, name VARCHAR(64), price DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO products VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setLong(1, i.toLong); ps.setString(2, s"item_$i"); ps.setDouble(3, i * 1.5)
        ps.addBatch()
      }
      ps.executeBatch()
      st.close(); ps.close()
    } finally conn.close()
  }

  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("readTable loads a JDBC table with schema and values intact") {
    seeded
    val df = Jdbc.readTable(spark, url, "products", props)
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("id", "name", "price"))
    assert(df.count() == 100)
    assert(df.filter($"ID" === 7L).select("PRICE").as[Double].head() == 10.5)
  }

  test("partitioned read splits into range stripes with identical results") {
    seeded
    val part = Jdbc.readTablePartitioned(
      spark, url, "products", "id", lower = 1L, upper = 100L,
      numPartitions = 4, props)
    assert(part.rdd.getNumPartitions == 4)
    val single = Jdbc.readTable(spark, url, "products", props)
    assert(part.orderBy("ID").collect().toSeq ==
      single.orderBy("ID").collect().toSeq)
  }

  test("JDBC tables ingest through the standard pipeline") {
    seeded
    val cache = java.nio.file.Files.createTempDirectory("graft_jdbc_").toString
    val (results, hash) = Jdbc.ingest(
      spark, url, Seq("products"), new StubLlm(), cache, props)
    assert(results.size == 1)
    assert(hash.matches("[0-9a-f]{32}"))
    val r = results.head
    assert(r.columnKinds("price") == "NUMBER")
    assert(r.ddl.contains(s"CREATE TABLE `${r.hash}`"))
    // the hash-named temp view is queryable, like any ingested table
    val n = spark.sql(s"SELECT COUNT(*) FROM `${r.hash}`").head().getLong(0)
    assert(n == 100L)
  }
}
