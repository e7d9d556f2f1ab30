package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Error-path golden runner (reference: the ~686-file clientnegative
  * corpus under ql/src/test/queries/clientnegative/). Each
  * resources/negative/NAME.sql is a script that MUST fail; its
  * `-- ERROR-CONTAINS: a | b` directive lists acceptable substrings
  * (case-insensitive, any-of) of the thrown exception chain. A script
  * that completes, or fails with an unrecognizable error, fails the
  * suite — so refusals stay refusals with stable shapes, the same way
  * the positive corpus pins results.
  *
  * Runtime-only failures count too: the last statement's DataFrame is
  * collected, so an error that Spark defers past analysis (assert_true,
  * scalar-subquery cardinality, runtime casts) still fires inside the
  * intercept.
  */
class NegativeGoldenSpec extends SparkSpec {

  private val negDir: Path = {
    val src = Paths.get("src/test/resources/negative")
    if (Files.isDirectory(src)) src
    else Paths.get(getClass.getResource("/negative").toURI)
  }

  private lazy val ready: Unit = Tables.views(spark, sf, Tables.all: _*)

  private def chain(t: Throwable, depth: Int = 0): String =
    if (t == null || depth > 8) ""
    else t.toString + " || " + chain(t.getCause, depth + 1)

  Files.list(negDir).iterator().asScala
    .filter(_.toString.endsWith(".sql")).toSeq.sortBy(_.toString)
    .foreach { sqlPath =>
      val name = sqlPath.getFileName.toString.stripSuffix(".sql")
      test(s"negative $name") {
        ready
        val text = Files.readString(sqlPath)
        val markers = text.linesIterator
          .filter(_.trim.startsWith("-- ERROR-CONTAINS:"))
          .flatMap(_.trim.stripPrefix("-- ERROR-CONTAINS:").split('|'))
          .map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq
        assert(markers.nonEmpty,
          s"$name must declare an -- ERROR-CONTAINS: directive")
        // a failing script dies mid-way, so any SET it ran (strict mode,
        // dynamic-partition confs) would leak into every later test on the
        // shared session — snapshot and restore the runtime conf around it,
        // and the authorization registry too (CREATE ROLE / GRANT residue
        // from before the failing statement)
        val before = spark.conf.getAll
        val authBefore = operators.Auth.snapshot(spark)
        val thrown =
          try {
            Engine.script(spark, sf, text,
              vars = Map("NEGTMP" -> tools.Tmp.dir(s"neg_$name"))).collect()
            None
          } catch { case t: Throwable => Some(t) }
          finally {
            operators.Auth.restore(spark, authBefore)
            spark.conf.getAll.foreach { case (k, v) =>
              before.get(k) match {
                case Some(old) if old != v =>
                  try spark.conf.set(k, old) catch { case _: Exception => () }
                case None =>
                  try spark.conf.unset(k) catch { case _: Exception => () }
                case _ => ()
              }
            }
          }
        assert(thrown.nonEmpty,
          s"$name completed — the statement must be refused")
        val msg = chain(thrown.get).toLowerCase
        assert(markers.exists(msg.contains),
          s"$name failed with an unrecognized error: ${msg.take(600)}")
      }
    }
}
