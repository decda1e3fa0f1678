/* Declared inside org.apache.spark.sql so the private[sql] expression
 * constructors above are reachable. Public Apache Spark API surface only. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the graft expressions, via the standard
  * `SparkSessionExtensions` hook:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
  *     ...
  *   spark.sql("SELECT poly_hash32(text), word_ngrams(tokens, 3) FROM docs")
  * }}}
  *
  * The DataFrame API path (graft.functions.Fns) builds the same expressions
  * directly; this hook makes them first-class in spark.sql(...) strings too.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("poly_hash32"),
      info("poly_hash32", "poly_hash32(str) - 32-bit polynomial rolling hash (h*31+char masked to 2^32-1)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "poly_hash32 expects exactly one argument")
        PolyHash32(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(tokens, n) - space-joined n-grams of a string array"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_ngrams expects (array<string>, n)")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Integer, _) => v.intValue
          case other => throw new IllegalArgumentException(
            s"word_ngrams n must be an integer literal, got $other")
        }
        WordNgrams(args.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash fingerprint of a string array (bits 0-31 from poly_hash32(token), 32-63 from the salted hash)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64 expects exactly one array<string> argument")
        SimHash(args.head, 64)
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product_double"),
      info("dot_product_double", "dot_product_double(a, b) - sequential dot product of two array<double>"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product_double expects two array<double> arguments")
        DotProductDouble(args.head, args(1))
      }))
  }
}
