package graft.io

import graft.SparkSpec

/** Remote-JDBC bridge internals, driven through plain JDBC (no Spark
  * in the loop): proxy forwarding, SQLException passthrough,
  * concurrent sessions, metadata handles, driver URL contract.
  */
class RemoteJdbcSpec extends SparkSpec {

  private def withServer[T](f: (RemoteJdbc.Server, Int) => T): T = {
    val server = new RemoteJdbc.Server(
      s"jdbc:derby:memory:rjdbc_${System.nanoTime()};create=true")
    val port = server.start()
    try f(server, port) finally server.stop()
  }

  test("statement/resultset/metadata round trip over the wire") {
    withServer { (_, port) =>
      val conn = new RemoteJdbcDriver()
        .connect(s"jdbc:graftremote://localhost:$port/", null)
      try {
        val st = conn.createStatement()
        st.executeUpdate("CREATE TABLE t1 (id BIGINT, name VARCHAR(32))")
        st.executeUpdate("INSERT INTO t1 VALUES (1, 'a'), (2, 'b')")
        val rs = st.executeQuery("SELECT id, name FROM t1 ORDER BY id")
        val md = rs.getMetaData // nested handle → nested proxy
        assert(md.getColumnCount == 2)
        assert(md.getColumnName(1).equalsIgnoreCase("id"))
        val rows = Iterator.continually(rs)
          .takeWhile(_.next()).map(r => (r.getLong(1), r.getString(2)))
          .toList
        assert(rows == List((1L, "a"), (2L, "b")))
        rs.close(); st.close()
      } finally conn.close()
    }
  }

  test("server-side SQLExceptions re-throw at the caller with state intact") {
    withServer { (_, port) =>
      val conn = new RemoteJdbcDriver()
        .connect(s"jdbc:graftremote://localhost:$port/", null)
      try {
        val st = conn.createStatement()
        val e = intercept[java.sql.SQLException] {
          st.executeQuery("SELECT * FROM no_such_table")
        }
        assert(e.getSQLState != null && e.getSQLState.nonEmpty)
        // the session must still be usable after a remote error
        st.executeUpdate("CREATE TABLE t2 (x INT)")
        assert(!st.executeQuery("SELECT * FROM t2").next())
      } finally conn.close()
    }
  }

  test("concurrent sessions write to the same embedded database") {
    withServer { (_, port) =>
      val url = s"jdbc:graftremote://localhost:$port/"
      val setup = new RemoteJdbcDriver().connect(url, null)
      setup.createStatement()
        .executeUpdate("CREATE TABLE tc (tid INT, v INT)")
      setup.close()
      val threads = (0 until 4).map { tid =>
        new Thread(() => {
          val c = new RemoteJdbcDriver().connect(url, null)
          try {
            val ps = c.prepareStatement("INSERT INTO tc VALUES (?, ?)")
            (0 until 25).foreach { i =>
              ps.setInt(1, tid); ps.setInt(2, i)
              ps.addBatch()
            }
            ps.executeBatch(); ps.close()
          } finally c.close()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val check = new RemoteJdbcDriver().connect(url, null)
      try {
        val rs = check.createStatement()
          .executeQuery("SELECT count(*) FROM tc")
        assert(rs.next() && rs.getLong(1) == 100L)
      } finally check.close()
    }
  }

  test("driver URL contract: foreign URLs yield null, ours parse") {
    val d = new RemoteJdbcDriver()
    assert(d.acceptsURL("jdbc:graftremote://h:1/"))
    assert(!d.acceptsURL("jdbc:postgresql://h:1/db"))
    assert(d.connect("jdbc:postgresql://h:1/db", null) == null,
      "JDBC contract: a foreign URL returns null, not an error")
  }
}
