package graft

class SchemaDriftSpec extends SparkSpec {

  test("current testdata is drift-clean at every scale factor") {
    Seq("sf0.001").foreach { sf =>
      val drift = Tables.schemaDrift(spark, s"/root/testdata/$sf")
      assert(drift.isEmpty, s"$sf: ${drift.mkString("; ")}")
    }
  }

  test("events.ts accepts BOTH known encodings; a wrong type is named precisely") {
    // the dual-encoding fixtures stand in for two generator generations
    Seq("src/test/resources/fixtures/events_ns",
        "src/test/resources/fixtures/events_us").foreach { dir =>
      val drift = Tables.schemaDrift(spark, dir)
        .filter(_.startsWith("events"))
      assert(drift.isEmpty, s"$dir must validate: $drift")
    }
  }

  test("warnDrift (the Verify AND Bench round-open guard) names a planted drift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warndrift").toString
    Seq((1L, "not-a-timestamp", 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val drift = Tables.warnDrift(spark, dir, "bench")
    assert(drift.exists(d => d.startsWith("events.ts") && d.contains("string")),
      s"the planted generation must surface as one named line: $drift")
  }

  test("a missing column and a type change are both reported by name") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    // events with ts as STRING (never-seen generation) and no props
    Seq((1L, "2024-01-01 00:00:00", 1L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val drift = Tables.schemaDrift(spark, dir)
    assert(drift.exists(d => d.startsWith("events.ts") && d.contains("string")),
      s"ts type change must be named: $drift")
    assert(drift.exists(_.startsWith("events.props")), s"missing column must be named: $drift")
    // fail-fast form throws with the same report
    val e = intercept[IllegalArgumentException](Tables.requireSchemas(spark, dir))
    assert(e.getMessage.contains("events.ts"))
  }
}
