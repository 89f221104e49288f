package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String sanitization (reference R2, /root/reference/main.py:44-49): cast to
  * string, strip every character outside [a-zA-Z0-9\s], null/empty → "".
  *
  * A pure Catalyst expression chain (regexp_replace + coalesce), so it stays
  * inside whole-stage codegen — no UDF.
  */
object Sanitize {
  def sanitize(c: Column): Column =
    coalesce(regexp_replace(c.cast("string"), "[^a-zA-Z0-9\\s]", ""), lit(""))
}
