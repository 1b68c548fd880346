package graft;

import java.nio.file.Files;
import java.util.ArrayList;
import java.util.List;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructType;

/**
 * Java-API twin of the reference's JavaDatasourceTest
 * (/root/reference/src/test/java/JavaDatasourceTest.java): load the
 * connector from plain Java, register a temp view, run a string-rowkey
 * range SQL query ordered descending. Driven by JavaApiSpec (ScalaTest)
 * so no extra test-framework dependency is needed.
 */
public final class JavaKvApi {

  private static final String CATALOG =
      "{\"table\":{\"name\":\"jpeople\"},\"rowkey\":\"key\","
          + "\"columns\":{"
          + "\"key\":{\"cf\":\"rowkey\",\"col\":\"key\",\"type\":\"string\"},"
          + "\"name\":{\"cf\":\"columns\",\"col\":\"name\",\"type\":\"string\"},"
          + "\"age\":{\"cf\":\"columns\",\"col\":\"age\",\"type\":\"int\"}}}";

  private JavaKvApi() {}

  private static void check(boolean cond, String msg) {
    if (!cond) throw new AssertionError(msg);
  }

  public static void run(SparkSession spark) throws Exception {
    String dir = Files.createTempDirectory("graft-kv-java").toString();

    StructType schema = DataTypes.createStructType(new org.apache.spark.sql.types.StructField[] {
        DataTypes.createStructField("key", DataTypes.StringType, false),
        DataTypes.createStructField("name", DataTypes.StringType, true),
        DataTypes.createStructField("age", DataTypes.IntegerType, true)});
    List<Row> rows = new ArrayList<>();
    for (int i = 0; i < 100; i++) {
      rows.add(RowFactory.create(String.format("%04d", i), "p" + i, i % 60));
    }
    spark.createDataFrame(rows, schema)
        .write().format("graft-kv")
        .option("catalog", CATALOG).option("path", dir)
        .mode("overwrite").save();

    Dataset<Row> df = spark.read().format("graft-kv")
        .option("catalog", CATALOG).option("path", dir).load();
    df.createOrReplaceTempView("jtest");
    // reference query shape: key <= '0642...' ORDER BY key DESC
    List<Row> got = spark
        .sql("SELECT key, name FROM jtest WHERE key <= '0010' ORDER BY key DESC")
        .collectAsList();
    check(got.size() == 11, "expected 11 rows, got " + got.size());
    check(got.get(0).getString(0).equals("0010"), "first key must be 0010");
    check(got.get(10).getString(0).equals("0000"), "last key must be 0000");
  }
}
