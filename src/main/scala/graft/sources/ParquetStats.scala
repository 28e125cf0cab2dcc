package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Cheap table statistics straight from parquet FOOTERS — no Spark
  * job, no data pages read. A `df.count()` for "how many rows is this
  * corpus" launches a full scan stage; the footer already carries the
  * exact per-row-group counts, and at 100 TB the difference is a
  * cluster-wide scan vs a driver-side metadata read (the same
  * footer-trusting shortcut DuckDB's `count(*)` and Spark's own
  * metadata-only optimizations use). */
object ParquetStats {

  /** Exact row count of a parquet file or directory (recursive; part
    * files only — `_SUCCESS`/hidden files skipped). */
  def rowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files = scala.collection.mutable.ArrayBuffer.empty[Path]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && !name.startsWith("_") && !name.startsWith("."))
        files += st.getPath
    }
    files.iterator.map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }
}
