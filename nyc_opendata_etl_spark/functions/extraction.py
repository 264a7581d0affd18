"""Python UDTF structured extraction — the table-function escape hatch.

Spark 4's Python user-defined table functions let one input row emit a
variable number of typed rows with arbitrary Python logic — the right
tool when extraction genuinely needs imperative code (schema-free
payload introspection, stateful parsers, third-party libraries). This
module carries ONE honest example (JSON property flattening with
Python-side type introspection) plus its declarative twin, and the
tests pin that both produce identical rows — because the engine's
standing rule applies to UDTFs too: Python row logic is the slow path
(per-row interpreter round trips, no codegen), so anything expressible
with ``from_json``/``explode``/higher-order functions should use those.
Reach for a UDTF only when the per-row logic cannot be declared.

Scale shape: a UDTF is embarrassingly parallel map-side work — no
shuffle, state, or driver involvement — so it scales linearly even
though each row pays the Python tax.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

__all__ = ["register_parse_props", "explode_props_udtf", "explode_props_declarative"]


@udtf(returnType="key: string, vtype: string, sval: string")
class _ParseProps:
    """Flatten one JSON object string into (key, python-type, value)
    rows, keys in sorted order; non-object / malformed inputs emit
    nothing (the defensive-parse contract of the JSON queries)."""

    def eval(self, props: str):  # noqa: D102 - UDTF protocol method
        if props is None:
            return
        try:
            obj = json.loads(props)
        except ValueError:
            return
        if not isinstance(obj, dict):
            return
        for k in sorted(obj):
            v = obj[k]
            # Render sval the way from_json(map<string,string>) renders
            # JSON values, so the declarative-twin parity holds for ANY
            # payload shape: strings stay raw, booleans lowercase, and
            # nested objects/arrays serialize as compact JSON text —
            # never Python reprs ('True', "{'a': 1}").
            if v is None:
                sval = None
            elif isinstance(v, str):
                sval = v
            elif isinstance(v, bool):  # before int: bool is an int subclass
                sval = "true" if v else "false"
            elif isinstance(v, (dict, list)):
                sval = json.dumps(v, separators=(",", ":"))
            else:
                sval = str(v)
            yield k, type(v).__name__, sval


def register_parse_props(spark: SparkSession, name: str = "parse_props") -> None:
    """Register the UDTF for SQL LATERAL use:
    ``SELECT e.*, t.* FROM events e, LATERAL parse_props(e.props) t``."""
    spark.udtf.register(name, _ParseProps)


def explode_props_udtf(spark: SparkSession, events: DataFrame) -> DataFrame:
    """(event_id, key, vtype, sval) per JSON property via the Python
    UDTF — the imperative path."""
    register_parse_props(spark)
    events.createOrReplaceTempView("__udtf_events__")
    return spark.sql(
        "SELECT e.event_id, t.key, t.vtype, t.sval "
        "FROM __udtf_events__ e, LATERAL parse_props(e.props) t"
    )


def explode_props_declarative(events: DataFrame) -> DataFrame:
    """The declarative twin (preferred): ``from_json`` to a string map +
    ``explode`` — JVM-side, codegen-friendly, no Python. Type names are
    not recoverable declaratively (values arrive as strings), which is
    exactly the gap the UDTF exists to fill."""
    m = F.from_json(F.col("props"), "map<string,string>")
    return events.select(
        "event_id", F.explode(m).alias("key", "sval")
    ).select("event_id", "key", "sval")
