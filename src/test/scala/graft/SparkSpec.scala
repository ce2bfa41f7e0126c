package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (guide: one SparkSession per suite). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("4")
  lazy val sqlc = spark // alias for readability in specs

  /** Write lines to a temp CSV file and return its path. */
  def tmpCsv(name: String, lines: String*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-test").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, name)
    val w = new java.io.PrintWriter(f)
    try lines.foreach(w.println) finally w.close()
    f.getAbsolutePath
  }
}
