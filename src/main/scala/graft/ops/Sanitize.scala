package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String sanitization (reference R2, /root/reference/main.py:44-49): cast to
  * string, strip every character outside [a-zA-Z0-9\s], null/empty → "".
  *
  * A pure Catalyst expression chain (regexp_replace + coalesce), so it stays
  * inside whole-stage codegen — no UDF.
  *
  * DELIBERATE DEVIATION (documented, like the batch off-by-one): the
  * reference passes JSON-null fields through Python's str(), so None becomes
  * the truthy string "None" and the graph gets cui='None' /
  * search_type='None' properties and even a 'None' name key
  * (main.py:44-49). Here null maps to "" and the property is omitted — a
  * literal 'None' node is never a real concept. Callers that need bug-exact
  * replication can pre-fill nulls with lit("None") before sanitizing.
  */
object Sanitize {
  def sanitize(c: Column): Column =
    coalesce(regexp_replace(c.cast("string"), "[^a-zA-Z0-9\\s]", ""), lit(""))
}
